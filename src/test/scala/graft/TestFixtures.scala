package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.synonymizer.Synonymizer

/** B1 mini synonymizer fixture (FIXTURES.md §B1): ~15 nodes / 8 clusters
  * covering shared names with unequal counts (argmax), equal-count ties,
  * mixed-case curie prefixes, null categories, empty edge lists, and
  * SRI-only / KG2pre-only provenance.
  */
object TestFixtures {

  final case class Node(
      id: String, id_simplified: String, name: String,
      name_simplified: String, category: String, cluster_id: String,
      major_branch: String, name_sri: String, category_sri: String,
      name_kg2pre: String, category_kg2pre: String)

  final case class Cluster(
      cluster_id: String, name: String, category: String,
      member_ids: Seq[String], intra_cluster_edge_ids: Seq[String])

  final case class Edge(
      id: String, subject: String, predicate: String, `object`: String,
      upstream_resource_id: String, primary_knowledge_source: String)

  val nodes: Seq[Node] = Seq(
    // CL1 aspirin — 3 members, two of which carry the name "aspirin"
    Node("CHEBI:15365", "CHEBI:15365", "Aspirin", "aspirin",
         "SmallMolecule", "CHEBI:15365", "ChemicalEntity",
         "aspirin", "SmallMolecule", "Aspirin", "SmallMolecule"),
    Node("DRUGBANK:DB00945", "DRUGBANK:DB00945", "aspirin", "aspirin",
         "Drug", "CHEBI:15365", "ChemicalEntity",
         null, null, "aspirin", "Drug"),
    Node("CAS:50-78-2", "CAS:50-78-2", "acetylsalicylic acid",
         "acetylsalicylicacid", "SmallMolecule", "CHEBI:15365",
         "ChemicalEntity", "acetylsalicylic acid", "SmallMolecule",
         null, null),
    // CL4 — a competing, smaller "aspirin" cluster (argmax loser)
    Node("CHEBI:999", "CHEBI:999", "ASPIRIN", "aspirin",
         "SmallMolecule", "CHEBI:999", "ChemicalEntity",
         "ASPIRIN", "SmallMolecule", null, null),
    // CL2 asthma (disease)
    Node("MONDO:0004979", "MONDO:0004979", "asthma", "asthma",
         "Disease", "MONDO:0004979", "DiseaseOrPhenotypicFeature",
         "asthma", "Disease", "asthma", "Disease"),
    Node("UMLS:C0004096", "UMLS:C0004096", "Asthma", "asthma",
         "Disease", "MONDO:0004979", "DiseaseOrPhenotypicFeature",
         null, null, "Asthma", "Disease"),
    // CL3 protein PBP3
    Node("UniProtKB:P45059", "UNIPROTKB:P45059", "PBP3", "pbp3",
         "Protein", "UniProtKB:P45059", "Protein",
         "PBP3", "Protein", "PBP3", "Protein"),
    // Equal-count tie: "ibuprofen" in CHEBI:200 and CHEBI:300
    Node("CHEBI:200", "CHEBI:200", "ibuprofen", "ibuprofen",
         "SmallMolecule", "CHEBI:200", "ChemicalEntity",
         "ibuprofen", "SmallMolecule", null, null),
    Node("CHEBI:300", "CHEBI:300", "Ibuprofen", "ibuprofen",
         "SmallMolecule", "CHEBI:300", "ChemicalEntity",
         null, null, "Ibuprofen", "SmallMolecule"),
    // KEGG compound (stage-2 id alignment target)
    Node("KEGG.COMPOUND:C00001", "KEGG.COMPOUND:C00001", "Water", "water",
         "SmallMolecule", "CHEBI:15377", "ChemicalEntity",
         "Water", "SmallMolecule", "Water", "SmallMolecule"),
    Node("CHEBI:15377", "CHEBI:15377", "water", "water",
         "SmallMolecule", "CHEBI:15377", "ChemicalEntity",
         "water", "SmallMolecule", null, null),
    // Second drug for the DrugBank ingest fixture
    Node("DRUGBANK:DB11111", "DRUGBANK:DB11111", "drugtwo", "drugtwo",
         "Drug", "CHEBI:777", "ChemicalEntity", null, null,
         "drugtwo", "Drug"),
    Node("CHEBI:777", "CHEBI:777", "DrugTwo", "drugtwo",
         "SmallMolecule", "CHEBI:777", "ChemicalEntity",
         "DrugTwo", "SmallMolecule", null, null),
    // Out-of-category mention (filtered by NER category gates); null category
    Node("GAZ:00002940", "GAZ:00002940", "France", "france",
         null, "GAZ:00002940", "Other",
         "France", null, null, null))

  val clusters: Seq[Cluster] = Seq(
    Cluster("CHEBI:15365", "Aspirin", "SmallMolecule",
      Seq("CHEBI:15365", "DRUGBANK:DB00945", "CAS:50-78-2"),
      Seq("e1", "e2")),
    Cluster("CHEBI:999", "ASPIRIN", "SmallMolecule", Seq("CHEBI:999"), Seq()),
    Cluster("MONDO:0004979", "asthma", "Disease",
      Seq("MONDO:0004979", "UMLS:C0004096"), Seq("e3")),
    Cluster("UniProtKB:P45059", "PBP3", "Protein",
      Seq("UniProtKB:P45059"), Seq()),
    Cluster("CHEBI:200", "ibuprofen", "SmallMolecule", Seq("CHEBI:200"), Seq()),
    Cluster("CHEBI:300", "Ibuprofen", "SmallMolecule", Seq("CHEBI:300"), Seq()),
    Cluster("CHEBI:15377", "water", "SmallMolecule",
      Seq("KEGG.COMPOUND:C00001", "CHEBI:15377"), Seq("e4")),
    Cluster("CHEBI:777", "DrugTwo", "SmallMolecule",
      Seq("DRUGBANK:DB11111", "CHEBI:777"), Seq()),
    Cluster("GAZ:00002940", "France", null, Seq("GAZ:00002940"), Seq()))

  val edges: Seq[Edge] = Seq(
    Edge("e1", "CHEBI:15365", "same_as", "DRUGBANK:DB00945", "infores:sri",
         "infores:chebi"),
    Edge("e2", "CHEBI:15365", "same_as", "CAS:50-78-2", "infores:sri",
         "infores:cas"),
    Edge("e3", "MONDO:0004979", "same_as", "UMLS:C0004096", "infores:sri",
         "infores:mondo"),
    Edge("e4", "CHEBI:15377", "same_as", "KEGG.COMPOUND:C00001",
         "infores:sri", "infores:kegg"))

  def nodesDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    nodes.toDF()
  }
  def clustersDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    clusters.toDF()
  }
  def edgesDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    edges.toDF()
  }

  def synonymizer(spark: SparkSession): Synonymizer =
    new Synonymizer(nodesDf(spark), clustersDf(spark), edgesDf(spark))

  def inputsDf(spark: SparkSession, inputs: Seq[String]): DataFrame = {
    import spark.implicits._
    inputs.toDF("input")
  }
}
