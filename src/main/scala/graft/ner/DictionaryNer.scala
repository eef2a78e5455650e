package graft.ner

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.{AggOps, StringOps}

/** Deterministic re-specification of the reference's scispaCy NER stage
  * (NER.py:83-122, perform_NER.py:19-54; SURVEY §2.8 U1): text → KG2 node
  * matches via n-gram dictionary mentions instead of a neural linker. The
  * operator contract is preserved exactly — sentence split + length gates
  * (P2/P3), long-token drop (P4), punctuation strip (P6), mention →
  * canonical-curie linking, optional category filter, longest-mention-wins
  * merge per curie (A4) — while the matcher itself is a join against the
  * synonymizer's `name_simplified` dictionary (match recall differs from
  * the neural model; operator semantics are identical).
  *
  * Scale notes: the mention side explodes each sentence into ≤ maxGram ×
  * tokens n-grams, then dedups per document BEFORE the join, so the join
  * input is bounded by distinct mentions, not raw n-gram count. The
  * dictionary (nodes ⋈ clusters) is the big side at real scale —
  * shuffle-hash/sort-merge on the simplified key with AQE skew handling;
  * common-word mentions are the classic skew keys. All expressions are
  * built-ins → whole-stage codegen end to end.
  */
final class DictionaryNer(nodes: DataFrame, clusters: DataFrame,
                          maxGram: Int = 6, minMentionChars: Int = 3) {

  /** mention_key (simplified) → canonical triple. One row per
    * (name_simplified, cluster): a mention with several clusters yields
    * several candidate curies, mirroring multi-candidate entity linking
    * (NER.py:110-120).
    */
  private val dictionary: DataFrame =
    nodes.join(
        broadcast(clusters.select(
          col("cluster_id"),
          col("name").as("preferred_name"),
          StringOps.withPrefix("biolink:", col("category"))
            .as("preferred_category"))),
        "cluster_id")
      .select(col("name_simplified").as("mention_key"),
              col("cluster_id").as("curie"),
              col("preferred_name"), col("preferred_category"))
      .distinct()

  /** P2+P3+P4: text → gated, scrubbed sentences (perform_NER.py:22-28). */
  def sentences(docs: DataFrame, keyCol: String, textCol: String): DataFrame =
    DictionaryNer.sentences(docs, keyCol, textCol)

  /** Sentence → distinct candidate mentions (instance-config n-grams). */
  def mentions(sentenceDf: DataFrame): DataFrame =
    DictionaryNer.mentions(sentenceDf, maxGram, minMentionChars)

  /** text_to_kg2_nodes (perform_NER.py:19-54): per document, curie →
    * {name = matched mention text, category}, category-filtered when
    * `categories` is non-empty, longest-mention-wins per curie with the
    * engine's deterministic tie-break (SURVEY §6.2).
    * Output: (doc_key, curie, name, category).
    */
  def textToKg2Nodes(docs: DataFrame, keyCol: String, textCol: String,
                     categories: Set[String] = Set.empty): DataFrame = {
    val m = mentions(sentences(docs, keyCol, textCol))
      .withColumn("mention_key", StringOps.simplify(col("mention")))
      .filter(length(col("mention_key")) > 0)
    val hits = m.join(dictionary, "mention_key")
    val filtered =
      if (categories.isEmpty) hits
      else hits.filter(col("preferred_category")
        .isin(categories.toSeq.map(x => x: Any): _*))
    filtered
      .groupBy(col("doc_key"), col("curie"))
      .agg(AggOps.longestWins(col("mention")).as("name"),
           max(col("preferred_category")).as("category"))
  }

  /** Map-form result (`indication_NER_aligned` /
    * `mechanistic_intermediate_nodes` shape, perform_NER.py:119-134):
    * doc_key → map<curie, struct<name, category>> with deterministically
    * sorted keys.
    */
  def asMap(matches: DataFrame): DataFrame =
    matches
      .groupBy("doc_key")
      .agg(map_from_entries(sort_array(collect_list(struct(
        col("curie"),
        struct(col("name"), col("category")).as("info")))))
        .as("matches"))
}

object DictionaryNer {

  /** P2+P3+P4: text → gated, scrubbed sentences (perform_NER.py:22-28).
    * The downstream n-gram explode is the pipeline's CPU/blow-up stage
    * and must not inherit a single-split input layout — conditional
    * repartition (no-op on a well-split scan).
    */
  def sentences(docs: DataFrame, keyCol: String, textCol: String): DataFrame =
    graft.ops.Partitioning.ensureParallelism(
        docs.select(col(keyCol).as("doc_key"), col(textCol).as("t")))
      .select(col("doc_key"),
              explode(StringOps.sentences(col("t"))).as("sentence"))
      .filter(StringOps.lengthOk(col("sentence")))
      .select(col("doc_key"),
              StringOps.dropLongTokens(col("sentence")).as("sentence"))

  /** Sentence → distinct candidate mentions: punctuation-stripped
    * (NER.py:99-100) whitespace tokens recombined into 1..maxGram-grams.
    * Gram generation, the length gate, and per-sentence dedup run inside
    * one native expression (graft.functions.NGramsExpr) — the interpreted
    * HOF version of this was the engine's hottest query by 25×.
    */
  def mentions(sentenceDf: DataFrame, maxGram: Int = 6,
               minMentionChars: Int = 3): DataFrame = {
    val toks = split(trim(StringOps.stripPunct(col("sentence"))), "\\s+")
    sentenceDf
      .select(col("doc_key"),
              explode(graft.functions.NGrams(toks, maxGram, minMentionChars))
                .as("mention"))
      .distinct()
  }
}
