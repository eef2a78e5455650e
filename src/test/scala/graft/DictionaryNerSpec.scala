package graft

import graft.constants.Constants
import graft.ner.DictionaryNer

/** B4 NER text cases (FIXTURES.md): gates, category filters,
  * longest-mention-wins.
  */
class DictionaryNerSpec extends SparkTestBase {

  private def ner = new DictionaryNer(
    TestFixtures.nodesDf(spark), TestFixtures.clustersDf(spark))

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toSeq.toDF("doc_id", "text")
  }

  private def matchesOf(text: String, cats: Set[String]) =
    ner.textToKg2Nodes(docs(1L -> text), "doc_id", "text", cats)
      .collect()
      .map(r => r.getString(1) -> (r.getString(2), r.getString(3)))
      .toMap

  test("sentence gates: <15 chars and >1000 chars are dropped (P3)") {
    val tiny = "aspirin now"                        // 11 chars — dropped
    val huge = "aspirin " * 200                     // >1000 chars — dropped
    assert(matchesOf(tiny, Set.empty).isEmpty)
    assert(matchesOf(huge, Set.empty).isEmpty)
  }

  test("disease mention passes the indication category filter") {
    val out = matchesOf(
      "Indicated for treatment of asthma in adults.",
      Constants.IndicationCategories)
    assert(out.keySet == Set("MONDO:0004979"))
    assert(out("MONDO:0004979") == ("asthma", "biolink:Disease"))
  }

  test("protein mention passes the mechanistic categories") {
    val out = matchesOf(
      "It binds PBP3 in susceptible organisms rapidly.",
      Constants.MechanisticCategories)
    assert(out.contains("UniProtKB:P45059"))
    assert(out("UniProtKB:P45059")._2 == "biolink:Protein")
  }

  test("out-of-category mention is filtered") {
    val out = matchesOf(
      "It was discovered in France decades ago.",
      Constants.MechanisticCategories)
    assert(!out.exists(_._2._2 == null))
    assert(!out.contains("GAZ:00002940"))
  }

  test("longest-mention-wins per curie (A4)") {
    val out = matchesOf(
      "Also known as acetylsalicylic acid, aspirin is common.",
      Constants.MechanisticCategories)
    // both mentions resolve to CHEBI:15365; the longer mention's text wins
    assert(out("CHEBI:15365")._1 == "acetylsalicylic acid")
  }

  test("punctuation strip (P6) keeps mentions matchable") {
    val out = matchesOf(
      "Relief of asthma; also used elsewhere.",
      Constants.IndicationCategories)
    assert(out.contains("MONDO:0004979"))
  }

  test("both dictionary distribution modes (broadcast / shuffle-hash) " +
       "produce identical matches") {
    val d = docs(
      1L -> "Also known as acetylsalicylic acid, aspirin is common today.",
      2L -> "Relief of asthma; also binds PBP3 in most tissue samples.",
      3L -> "Nothing from the dictionary appears in this sentence at all.")
    def run(mode: DictionaryNer.Build) = new DictionaryNer(
        TestFixtures.nodesDf(spark), TestFixtures.clustersDf(spark),
        dictBuild = mode)
      .textToKg2Nodes(d, "doc_id", "text")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
                 r.getString(3))).toSet
    val broadcastOut = run(DictionaryNer.BroadcastDict)
    assert(broadcastOut == run(DictionaryNer.ShuffleHashDict),
      "shuffle-hash dictionary mode must be result-identical")
    assert(broadcastOut.exists(_._2 == "CHEBI:15365"))
  }

  test("map-form output (perform_NER.py:119-134 shape)") {
    val m = ner.asMap(ner.textToKg2Nodes(
        docs(7L -> "Indicated for treatment of asthma in adults."),
        "doc_id", "text", Constants.IndicationCategories))
      .collect()
    assert(m.length == 1)
    val map = m.head.getMap[String, org.apache.spark.sql.Row](1)
    assert(map.keySet == Set("MONDO:0004979"))
  }
}
