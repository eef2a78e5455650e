package graft

import org.apache.spark.sql.DataFrame
import graft.constants.Constants
import graft.ner._

/** U1 escape hatch: the external-model adapter (ModelNer) against the
  * dictionary matcher it must agree with (round-6 verdict ask #1).
  *
  * The parity corpus is generated from TestFixtures vocabulary: every
  * doc mixes dictionary names (aspirin / acetylsalicylic acid / asthma /
  * PBP3 / ibuprofen / water / France) with noise across several
  * sentences, including gate-dropped sentences (too short / too long)
  * and docs with no matches at all.
  */
class ModelNerSpec extends SparkTestBase {

  private def nodes = TestFixtures.nodesDf(spark)
  private def clusters = TestFixtures.clustersDf(spark)

  private val mentionPool = Vector(
    "aspirin", "acetylsalicylic acid", "asthma", "PBP3", "ibuprofen",
    "water", "France", "drugtwo", "nothing relevant", "plain words")

  /** ~120 docs × 3 sentences, deterministic by index arithmetic. */
  private def corpus: DataFrame = {
    import spark.implicits._
    (0 until 120).map { i =>
      val a = mentionPool(i % mentionPool.size)
      val b = mentionPool((i * 7 + 3) % mentionPool.size)
      val text =
        s"Patients received $a for chronic symptoms. " +
          s"Binding of $b was observed in most tissues. " +
          (if (i % 5 == 0) "tiny. " else "") + // gated out (<15 chars)
          s"Sentence three mentions $a again with emphasis."
      (i.toLong, text)
    }.toDF("doc_id", "text").repartition(4)
  }

  private def dictOut(categories: Set[String]): Array[String] =
    new DictionaryNer(nodes, clusters)
      .textToKg2Nodes(corpus, "doc_id", "text", categories)
      .collect().map(_.toString).sorted

  private def modelOut(provider: NerModelProvider, config: NerConfig,
                       categories: Set[String] = Set.empty): Array[String] =
    new ModelNer(nodes, clusters, Seq(provider), config)
      .textToKg2Nodes(corpus, "doc_id", "text", categories)
      .collect().map(_.toString).sorted

  private val parityConfig =
    NerConfig(threshold = 0.5, maxEntitiesPerMention = 16, batchSize = 16)

  test("adapter with the dictionary test-double is byte-identical to the " +
       "dictionary matcher (schemas and rows), with and without " +
       "category filters") {
    val double = DictionaryDouble.fromNodes(nodes)
    Seq(Set.empty[String], Constants.IndicationCategories,
        Constants.MechanisticCategories).foreach { cats =>
      val dict = new DictionaryNer(nodes, clusters)
        .textToKg2Nodes(corpus, "doc_id", "text", cats)
      val model = new ModelNer(nodes, clusters, Seq(double), parityConfig)
        .textToKg2Nodes(corpus, "doc_id", "text", cats)
      assert(model.schema == dict.schema, "schema parity")
      val d = dict.collect().map(_.toString).sorted
      val m = model.collect().map(_.toString).sorted
      assert(m.sameElements(d),
        s"cats=$cats: adapter output differs from dictionary matcher\n" +
          s"only-model: ${m.diff(d).take(5).mkString("; ")}\n" +
          s"only-dict: ${d.diff(m).take(5).mkString("; ")}")
      assert(d.nonEmpty, "sanity: parity corpus produces matches")
    }
  }

  test("a model that detects mentions but links NO candidates exercises " +
       "the name-fallback join and still agrees with the dictionary path " +
       "(NER.py:105-117 `if curies else entity`)") {
    val unlinked = DictionaryDouble.fromNodes(nodes, emitCandidates = false)
    assert(modelOut(unlinked, parityConfig)
      .sameElements(dictOut(Set.empty)))
  }

  test("ensemble of two providers produces the same merged output " +
       "(duplicate candidates collapse in the aggregate, " +
       "perform_NER.py:79-99 five-pipeline union)") {
    val d1 = DictionaryDouble.fromNodes(nodes)
    val d2 = DictionaryDouble.fromNodes(nodes, emitCandidates = false)
    val both = new ModelNer(nodes, clusters, Seq(d1, d2), parityConfig)
      .textToKg2Nodes(corpus, "doc_id", "text")
      .collect().map(_.toString).sorted
    assert(both.sameElements(dictOut(Set.empty)))
  }

  test("ensemble plan contract: FIVE providers still plan exactly one " +
       "sentence-stage mapPartitions pass and one canonicalization " +
       "join (perform_NER.py:79-99 — k models must not mean k passes)") {
    def planOf(k: Int): org.apache.spark.sql.execution.SparkPlan = {
      val providers = (0 until k).map(_ => DictionaryDouble.fromNodes(nodes))
      new ModelNer(nodes, clusters, providers, parityConfig)
        .textToKg2Nodes(corpus, "doc_id", "text")
        .queryExecution.executedPlan
    }
    def shape(p: org.apache.spark.sql.execution.SparkPlan): (Int, Int) = {
      val inner = p match {
        case a: org.apache.spark.sql.execution.adaptive
              .AdaptiveSparkPlanExec => a.executedPlan
        case other => other
      }
      val passes = inner.collect {
        case m: org.apache.spark.sql.execution.MapPartitionsExec => m
      }.size
      val joins = inner.collect {
        case j if j.nodeName.contains("Join") => j
      }.size
      (passes, joins)
    }
    val one = shape(planOf(1))
    val five = shape(planOf(5))
    assert(one._1 == 1 && five._1 == 1,
      s"model stage must be ONE mapPartitions pass: 1-provider=$one, " +
        s"5-provider=$five")
    assert(five._2 == one._2,
      s"join count must not grow with ensemble size: 1-provider=$one, " +
        s"5-provider=$five")
  }

  test("batching contract: one model open per partition per provider, " +
       "batch calls ~ sentences/batchSize — never per-sentence") {
    val opens = spark.sparkContext.longAccumulator("ner-opens")
    val batches = spark.sparkContext.longAccumulator("ner-batches")
    val double = DictionaryDouble.fromNodes(
      nodes, opens = Some(opens), batches = Some(batches))
    val out = modelOut(double, parityConfig)
    assert(out.nonEmpty)
    val nSentences = new DictionaryNer(nodes, clusters)
      .sentences(corpus, "doc_id", "text").count()
    val nParts = 4 // corpus.repartition(4); sentences() is narrow on top
    assert(opens.value == nParts,
      s"expected one open per partition ($nParts), got ${opens.value}")
    val maxBatches = nParts + nSentences / parityConfig.batchSize
    assert(batches.value <= maxBatches,
      s"${batches.value} linkBatch calls for $nSentences sentences " +
        s"(cap $maxBatches) — batching is not happening")
    assert(batches.value < nSentences,
      "linkBatch called per sentence — the batch contract is broken")
  }

  test("U3 failure tolerance: a poisoned sentence is retried " +
       "per-sentence and skipped; its batch-mates still match") {
    // doc 0 sentence 1 carries 'aspirin'; sentence 2 carries the poison
    // token AND 'acetylsalicylic acid'; sentence 3 aspirin again
    import spark.implicits._
    val d = Seq(
      (1L, "Patients received aspirin for chronic symptoms. " +
        "POISONTOKEN near acetylsalicylic acid was observed here. " +
        "Final sentence mentions asthma explicitly for the record."),
      (2L, "Relief of asthma was reported in the treated cohort."))
      .toDF("doc_id", "text")
    val double = DictionaryDouble.fromNodes(
      nodes, failOnSubstring = Some("POISONTOKEN"))
    val out = new ModelNer(nodes, clusters, Seq(double), parityConfig)
      .textToKg2Nodes(d, "doc_id", "text")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    // poisoned sentence's exclusive mention is gone...
    assert(!out.exists(_._2 == "CHEBI:15365") ||
           out.collect { case (1L, "CHEBI:15365", name) => name }
             .forall(_ == "aspirin"),
      s"poisoned sentence's 'acetylsalicylic acid' must not surface: $out")
    // ...but its batch-mates (same partition, same batch) survive
    assert(out.exists { case (1L, c, _) => c == "CHEBI:15365" case _ => false },
      s"doc 1 aspirin from a healthy sentence must survive: $out")
    assert(out.exists { case (1L, c, _) => c == "MONDO:0004979" case _ => false },
      s"doc 1 asthma from a healthy sentence must survive: $out")
    assert(out.exists { case (2L, c, _) => c == "MONDO:0004979" case _ => false })
  }

  test("threshold / numNeighbors-cap semantics (NER.py:48-51 pipe " +
       "config): candidates below threshold drop; survivors truncate " +
       "to maxEntitiesPerMention by (score desc, curie asc)") {
    import spark.implicits._
    val d = Seq((1L, "Patients received aspirin for chronic symptoms."))
      .toDF("doc_id", "text")
    // model links 'aspirin' to three scored candidates
    val scored = new NerModelProvider {
      def open(config: NerConfig): NerModel = new NerModel {
        def linkBatch(ss: Seq[String]): Seq[Seq[NerMention]] =
          ss.map { s =>
            if (s.contains("aspirin"))
              Seq(NerMention("aspirin", Seq(
                NerCandidate("CHEBI:15365", 0.95),  // aspirin cluster
                NerCandidate("CHEBI:999", 0.95),    // competing cluster
                NerCandidate("UniProtKB:P45059", 0.60)))) // below threshold
            else Nil
          }
      }
    }
    def run(config: NerConfig) =
      new ModelNer(nodes, clusters, Seq(scored), config)
        .textToKg2Nodes(d, "doc_id", "text")
        .collect().map(_.getString(1)).sorted
    // threshold 0.9 keeps the two 0.95s; k-cap 1 keeps the smaller curie
    assert(run(NerConfig(threshold = 0.9, maxEntitiesPerMention = 4))
      .sameElements(Array("CHEBI:15365", "CHEBI:999")))
    assert(run(NerConfig(threshold = 0.9, maxEntitiesPerMention = 1))
      .sameElements(Array("CHEBI:15365")))
    // threshold 0.5 admits the protein candidate too
    assert(run(NerConfig(threshold = 0.5, maxEntitiesPerMention = 4))
      .sameElements(Array("CHEBI:15365", "CHEBI:999", "UniProtKB:P45059")))
  }

  test("Stage1 runs unchanged over the ModelNer linker (the trait seam " +
       "a real user plugs a neural model into)") {
    import spark.implicits._
    val syn = TestFixtures.synonymizer(spark)
    val drugs = Seq(
      ("DB00945", "Also known as acetylsalicylic acid, aspirin is common.",
       "Indicated for treatment of asthma in adults."))
      .toDF("dbid", "description", "indication")
      .selectExpr(
        "array(named_struct('_VALUE', dbid, '_primary', 'true')) as `drugbank-id`",
        "'aspirin' as name", "description", "indication",
        "cast(null as string) as pharmacodynamics",
        "cast(null as string) as `mechanism-of-action`",
        "cast(null as string) as metabolism",
        "cast(null as string) as `protein-binding`",
        "cast(null as struct<target:array<struct<id:string,name:string,polypeptide:array<struct<_id:string,name:string,`gene-name`:string>>>>>) as targets",
        "cast(null as struct<enzyme:array<struct<id:string,name:string,polypeptide:array<struct<_id:string,name:string,`gene-name`:string>>>>>) as enzymes",
        "cast(null as struct<carrier:array<struct<id:string,name:string,polypeptide:array<struct<_id:string,name:string,`gene-name`:string>>>>>) as carriers",
        "cast(null as struct<transporter:array<struct<id:string,name:string,polypeptide:array<struct<_id:string,name:string,`gene-name`:string>>>>>) as transporters",
        "cast(null as struct<pathway:array<struct<`smpdb-id`:string,enzymes:struct<`uniprot-id`:array<string>>>>>) as pathways")
    val linker = new ModelNer(nodes, clusters,
      Seq(DictionaryDouble.fromNodes(nodes)), parityConfig)
    val viaModel = graft.drugbank.Stage1.run(drugs, syn, linker)
    val viaDict = graft.drugbank.Stage1.run(
      drugs, syn, new DictionaryNer(nodes, clusters))
    assert(viaModel.collect().map(_.toString).sorted
      .sameElements(viaDict.collect().map(_.toString).sorted))
    assert(viaModel.count() == 1)
  }
}
