package graft

import org.apache.spark.sql.functions._
import graft.drugbank.{DrugBank, Stage1, Stage2}
import graft.ner.DictionaryNer
import graft.stage2.IdentifierAlignment
import graft.synonymizer.Synonymizer

/** Golden end-to-end at XML scale (round-6 verdict ask #6): a synthetic
  * 1,000-drug DrugBank XML generated from modular rules, driven through
  * the REAL Stage1 → Stage2 composition against a 900-cluster synonymizer
  * fixture, and checked record-by-record against an independent
  * arithmetic model of what every map must contain — plus a pinned
  * content hash so any representation drift is flagged even where the
  * model is silent.
  *
  * The rules (i = drug index 0..999):
  *  - i % 10 == 9  → no synonymizer entry: the record must DROP (B3
  *    unresolvable semantics), leaving exactly 900 records;
  *  - i % 2 == 0   → description mentions "aspirin" → mechanistic map
  *    gains CHEBI:15365 via stage-1 NER;
  *  - i % 3 == 0   → indication mentions "asthma" → indication map gains
  *    MONDO:0004979, and (indication being a mostly-text field) the
  *    mechanistic map gains it too;
  *  - i % 5 == 0   → a target named "PBP3" with bare id "P45059" →
  *    mechanistic map gains UniProtKB:P45059 via BOTH stage-2 branches
  *    (name lookup and regex id detection), deduplicated.
  */
class XmlScaleSpec extends SparkTestBase {

  private val nDrugs = 1000

  private def drugXml(i: Int): String = {
    val id = f"DB$i%05d"
    val desc =
      if (i % 2 == 0)
        "This compound strongly inhibits aspirin uptake in most tissues."
      else "This compound has no special behavior in typical patients."
    val indication =
      if (i % 3 == 0)
        "    <indication>Indicated for treatment of asthma in adults." +
          "</indication>\n"
      else ""
    val targets =
      if (i % 5 == 0)
        "    <targets><target><id>P45059</id><name>PBP3</name></target>" +
          "</targets>\n"
      else ""
    s"""  <drug type="small molecule" created="2020-01-01">
""" +
      s"""    <drugbank-id primary="true">$id</drugbank-id>
""" +
      s"""    <name>DrugName$i</name>
""" +
      s"""    <description>$desc</description>
""" + indication + targets +
      "  </drug>\n"
  }

  private lazy val xmlPath: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-xmlscale")
    val p = dir.resolve("drugbank_1k.xml")
    val sb = new StringBuilder
    sb.append("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n")
    sb.append("<drugbank xmlns=\"http://www.drugbank.ca\" version=\"5.1\">\n")
    (0 until nDrugs).foreach(i => sb.append(drugXml(i)))
    sb.append("</drugbank>\n")
    java.nio.file.Files.writeString(p, sb.toString)
    p.toString
  }

  private def resolvable = (0 until nDrugs).filter(_ % 10 != 9)

  /** 900 drug nodes + the 3 dictionary nodes NER/stage-2 hit. */
  private lazy val nodesDf = {
    import spark.implicits._
    import TestFixtures.Node
    (resolvable.map { i =>
      val db = f"DRUGBANK:DB$i%05d"
      Node(db, db, s"DrugName$i", s"drugname$i", "Drug", s"CHEM:$i",
           "ChemicalEntity", null, null, s"DrugName$i", "Drug")
    } ++ Seq(
      Node("CHEBI:15365", "CHEBI:15365", "Aspirin", "aspirin",
           "SmallMolecule", "CHEBI:15365", "ChemicalEntity",
           "aspirin", "SmallMolecule", "Aspirin", "SmallMolecule"),
      Node("MONDO:0004979", "MONDO:0004979", "asthma", "asthma", "Disease",
           "MONDO:0004979", "DiseaseOrPhenotypicFeature",
           "asthma", "Disease", "asthma", "Disease"),
      Node("UniProtKB:P45059", "UNIPROTKB:P45059", "PBP3", "pbp3",
           "Protein", "UniProtKB:P45059", "Protein",
           "PBP3", "Protein", "PBP3", "Protein"))).toDF()
  }

  private lazy val clustersDf = {
    import spark.implicits._
    import TestFixtures.Cluster
    (resolvable.map { i =>
      Cluster(s"CHEM:$i", s"DrugName$i", "SmallMolecule",
              Seq(f"DRUGBANK:DB$i%05d", s"CHEM:$i"), Seq())
    } ++ Seq(
      Cluster("CHEBI:15365", "Aspirin", "SmallMolecule",
              Seq("CHEBI:15365"), Seq()),
      Cluster("MONDO:0004979", "asthma", "Disease",
              Seq("MONDO:0004979"), Seq()),
      Cluster("UniProtKB:P45059", "PBP3", "Protein",
              Seq("UniProtKB:P45059"), Seq()))).toDF()
  }

  private lazy val stage2Out = {
    import spark.implicits._
    import TestFixtures.Edge
    val syn = new Synonymizer(nodesDf, clustersDf, Seq.empty[Edge].toDF())
    val drugs = DrugBank.readXml(spark, xmlPath)
    val s1 = Stage1.run(drugs, syn, new DictionaryNer(nodesDf, clustersDf))
    Stage2.run(s1, new IdentifierAlignment(syn)).cache()
  }

  test("corrupt-tolerant scan: a mangled <drug> row is quarantined in " +
       "_corrupt_record, good rows parse, the scan survives") {
    val dir = java.nio.file.Files.createTempDirectory("graft-xmlcorrupt")
    val p = dir.resolve("damaged.xml")
    java.nio.file.Files.writeString(p,
      """<?xml version="1.0" encoding="UTF-8"?>
        |<drugbank xmlns="http://www.drugbank.ca" version="5.1">
        |  <drug type="small molecule">
        |    <drugbank-id primary="true">DB90001</drugbank-id>
        |    <name>GoodDrugA</name>
        |  </drug>
        |  <drug type="small molecule">
        |    <drugbank-id primary="true">DB90002</drugbank-id>
        |    <name>Bad &undeclared; Drug</name>
        |  </drug>
        |  <drug type="small molecule">
        |    <drugbank-id primary="true">DB90003</drugbank-id>
        |    <name>GoodDrugB</name>
        |  </drug>
        |</drugbank>
        |""".stripMargin)
    val df = DrugBank.readXmlLenient(spark, p.toString).cache()
    // one quarantined row, both good rows intact with parsed fields
    assert(df.filter(col("_corrupt_record").isNotNull).count() == 1L)
    val goodNames = df.filter(col("_corrupt_record").isNull)
      .select("name").collect().map(_.getString(0)).toSet
    assert(goodNames == Set("GoodDrugA", "GoodDrugB"))
    // the strict-schema scan also survives (PERMISSIVE is the source
    // default): no exception, damaged row nulls out instead
    assert(DrugBank.readXml(spark, p.toString).count() >= 2L)
  }

  test("release-zip flow (download_data.sh:1-20): zip the corpus, " +
       "extract via S8 Ingest, scan the XML — byte-identical frame") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-xmlzip")
    val zip = tmp.resolve("release.zip")
    val zout = new java.util.zip.ZipOutputStream(
      java.nio.file.Files.newOutputStream(zip))
    zout.putNextEntry(new java.util.zip.ZipEntry("full database.xml"))
    zout.write(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(xmlPath)))
    zout.closeEntry()
    zout.putNextEntry(new java.util.zip.ZipEntry("LICENSE.txt"))
    zout.write("terms".getBytes); zout.closeEntry()
    zout.close()
    val viaZip = DrugBank.readXmlFromZip(spark, zip.toString,
      tmp.resolve("extracted").toString)
    val direct = DrugBank.readXml(spark, xmlPath)
    assert(viaZip.count() == nDrugs.toLong)
    assert(viaZip.select(col("drugbank-id").getItem(0).getField("_VALUE"))
      .except(direct.select(col("drugbank-id").getItem(0)
        .getField("_VALUE"))).isEmpty)
  }

  test("1k-drug XML e2e: 900 resolved records, every record's maps " +
       "match the arithmetic model, sampled values exact") {
    val rows = stage2Out
      .select(col("kg2_id"),
        map_keys(col("indication_NER_aligned")).as("ind"),
        map_keys(col("mechanistic_intermediate_nodes")).as("mech"))
      .collect()
      .map(r => r.getString(0) ->
        ((r.getSeq[String](1).toSet, r.getSeq[String](2).toSet)))
      .toMap
    assert(rows.size == nDrugs * 9 / 10,
      s"expected 900 resolved records, got ${rows.size}")
    resolvable.foreach { i =>
      val expInd =
        if (i % 3 == 0) Set("MONDO:0004979") else Set.empty[String]
      val expMech = Seq(
        if (i % 2 == 0) Some("CHEBI:15365") else None,
        if (i % 3 == 0) Some("MONDO:0004979") else None,
        if (i % 5 == 0) Some("UniProtKB:P45059") else None).flatten.toSet
      val (gotInd, gotMech) = rows(s"CHEM:$i")
      assert(gotInd == expInd, s"drug $i indication: $gotInd != $expInd")
      assert(gotMech == expMech, s"drug $i mechanistic: $gotMech != $expMech")
    }
    // i = 30 hits every rule: full typed values, not just key sets
    val r30 = stage2Out.filter(col("kg2_id") === "CHEM:30").collect().head
    val ind = r30.getMap[String, org.apache.spark.sql.Row](
      r30.fieldIndex("indication_NER_aligned"))
    assert(ind("MONDO:0004979").getString(0) == "asthma")
    assert(ind("MONDO:0004979").getString(1) == "biolink:Disease")
    val mech = r30.getMap[String, org.apache.spark.sql.Row](
      r30.fieldIndex("mechanistic_intermediate_nodes"))
    assert(mech("CHEBI:15365").getString(0) == "aspirin")
    assert(mech("CHEBI:15365").getString(1) == "biolink:SmallMolecule")
    assert(mech("UniProtKB:P45059").getString(0) == "PBP3")
    assert(mech("UniProtKB:P45059").getString(1) == "biolink:Protein")
  }

  test("1k-drug XML e2e: content hash pinned (representation drift guard)") {
    val canon = stage2Out
      .select(concat_ws("|",
        col("kg2_id"),
        concat_ws(",", map_keys(col("indication_NER_aligned"))),
        concat_ws(",", map_keys(col("mechanistic_intermediate_nodes"))),
        col("name"), col("drug_bank_id")).as("line"))
      .orderBy("line")
      .collect().map(_.getString(0)).mkString("\n")
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(canon.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(md == "47a3f5c02ba8b714b69de74831101a34", s"content hash: $md")
  }

  test("sharded keyed-JSON sink at scale (VERDICT r14 #6): a 1M-key " +
       "frame writes distributed — ordered non-overlapping shards, a " +
       "consistent manifest, and no driver-side document — and the " +
       "1k-drug stage output reassembles byte-identical to keyedJson") {
    val spark2 = spark
    import spark2.implicits._
    import graft.drugbank.Sinks
    val tmp = java.nio.file.Files.createTempDirectory("graft-shard").toString
    // 17M-drug-shaped path, scaled to 1M for the suite: synthetic
    // curie keys, two payload columns
    val big = spark.range(0, 1000000L)
      .select(concat(lit("DB"), lpad(col("id").cast("string"), 8, "0"))
          .as("drug_bank_id"),
        concat(lit("name-"), col("id")).as("name"),
        (col("id") * 37L % 1009L).as("score"))
    val n = Sinks.writeKeyedJsonShards(big, "drug_bank_id",
      s"$tmp/big", shards = 32)
    assert(n == 1000000L)
    // shards are globally ordered and non-overlapping: per-file
    // (first, last) line ranges must chain strictly
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(tmp), spark.sparkContext.hadoopConfiguration)
    val parts = fs.listStatus(new org.apache.hadoop.fs.Path(s"$tmp/big"))
      .map(_.getPath).filter(_.getName.startsWith("part-"))
      .sortBy(_.getName)
    val ranges = parts.flatMap { p =>
      val in = fs.open(p)
      val lines = try scala.io.Source.fromInputStream(in, "UTF-8")
        .getLines().toVector finally in.close()
      if (lines.isEmpty) None else Some((lines.head, lines.last, lines.size))
    }
    assert(ranges.map(_._3).sum == 1000000)
    assert(ranges.length > 1, "scale sanity: more than one shard")
    ranges.foreach { case (first, last, _) =>
      assert(first <= last) }
    ranges.sliding(2).foreach {
      case Array((_, lastA, _), (firstB, _, _)) =>
        assert(lastA <= firstB, s"overlapping shards: $lastA vs $firstB")
      case _ => ()
    }
    // manifest totals match
    val manifest = {
      val in = fs.open(new org.apache.hadoop.fs.Path(
        s"$tmp/big/_graft_manifest.json"))
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    }
    assert(manifest.contains("\"entries\": 1000000"))
    // the real stage-1 output at XML scale: byte-identical reassembly
    val stageFrame = stage2Out.select("kg2_id", "name", "drug_bank_id")
    Sinks.writeKeyedJsonShards(stageFrame, "kg2_id", s"$tmp/stage",
      shards = 7)
    assert(Sinks.assembleKeyedJson(spark, s"$tmp/stage")
      == Sinks.keyedJson(stageFrame, "kg2_id"))
  }
}
