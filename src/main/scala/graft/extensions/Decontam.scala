package graft.extensions

import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter benchmark decontamination — the shuffle-free scale path
  * next to the exact shingle-overlap semi-join (`decontam_flag` demo).
  *
  * The exact join shuffles (or broadcasts) every document shingle; at
  * 100 TB that is the dominant cost of a decontamination pass. The Bloom
  * route compresses the benchmark's shingle set into a fixed-size bit
  * array ONCE (offline — it IS the decontamination index, like the IVF
  * centroids), ships it to executors as a plan literal, and flags
  * documents in a single map-side pass: zero shuffles, zero joins, a
  * guaranteed superset of the exact result (Bloom filters have no false
  * negatives — a contaminated document can never slip through; the fpp
  * controls how many clean documents are needlessly flagged for the
  * exact recheck).
  *
  * Uses Spark's own sketch machinery (`BloomFilterAggregate` /
  * `BloomFilterMightContain`, the expressions behind runtime join
  * filtering) rather than a hand-rolled bitset: the aggregate merges
  * per-partition filters on the executors, and the probe expression
  * deserializes the literal once per task, not per row.
  *
  * No counterpart in the reference; part of the training-data pipeline
  * surface (SURVEY §2.10).
  */
object Decontam {

  /** Offline index build: distinct benchmark shingles → xxhash64 →
    * one merged Bloom filter, returned serialized (store it next to the
    * benchmark set; building it costs one aggregation over the — small —
    * benchmark corpus, never over the training corpus).
    */
  def benchmarkBloom(bench: DataFrame, textCol: String, shingleN: Int = 3,
                     expectedItems: Long = 1L << 20,
                     numBits: Long = 1L << 23): Array[Byte] = {
    val shingles = bench
      .select(TextAnalysis.tokens(col(textCol)).as("toks"))
      .select(explode(array_distinct(
        TextAnalysis.shinglesOfTokens(col("toks"), shingleN))).as("sh"))
      .select(hashed(col("sh")).as("h"))
    val agg = new BloomFilterAggregate(
      GraftBridge.expression(col("h")),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression()
    shingles.select(GraftBridge.column(agg).as("bf"))
      .head().getAs[Array[Byte]](0)
  }

  /** Map-side contamination flag: true when ANY document shingle might be
    * in the benchmark filter. Superset of the exact semi-join result —
    * false positives at the filter's fpp, false negatives never.
    */
  def flagContaminated(docs: DataFrame, idCol: String, textCol: String,
                       bloom: Array[Byte], shingleN: Int = 3): DataFrame = {
    // tokens and shingles staged in their own projections: generator /
    // lambda inlining would re-run them per element (see SCALE.md)
    docs
      .select(col(idCol), TextAnalysis.tokens(col(textCol)).as("toks"))
      .select(col(idCol),
        TextAnalysis.shinglesOfTokens(col("toks"), shingleN).as("grams"))
      .select(col(idCol),
        exists(col("grams"), sh => mightContain(bloom, sh))
          .as("contaminated"))
  }

  /** N-gram overlap decontamination — the GPT-3/PaLM-style rule: a
    * training document is contaminated when it shares ANY n-token
    * window (n ≈ 13) with a benchmark document, which catches benchmark
    * text quoted or paraphrase-wrapped inside a larger page that exact
    * whole-doc matching misses, while the long window keeps common
    * phrases from flagging everything (3-gram shingles would).
    *
    * Output: (doc_id, n_hits) for contaminated docs only — n_hits =
    * how many distinct benchmark windows the doc contains (the triage
    * signal: 1 hit ≈ a quote, hundreds ≈ the whole benchmark doc).
    *
    * Scale shape: the benchmark window set is the small side by
    * definition — hashed, deduped, broadcast; the corpus stream
    * explodes to one md5 per window and semi-joins map-side (no corpus
    * shuffle before the per-doc count). Windows use stride 1; a doc
    * shorter than n tokens has no window and can never flag, matching
    * the benchmark side's own gate.
    */
  def flagNgramContaminated(docs: DataFrame, idCol: String,
                            textCol: String, bench: DataFrame,
                            benchTextCol: String, n: Int = 13): DataFrame = {
    def windows(df: DataFrame, cols: Seq[Column], textC: Column) = df
      .select(cols :+ TextAnalysis.tokens(textC).as("toks"): _*)
      .filter(size(col("toks")) >= n)
      .select(cols :+ explode(
        TextAnalysis.shinglesOfTokens(col("toks"), n)).as("w"): _*)
      .select(cols :+ md5(col("w")).as("wh"): _*)
    val benchWindows = broadcast(
      windows(bench, Seq.empty, col(benchTextCol)).select("wh").distinct())
    windows(docs, Seq(col(idCol)), col(textCol))
      .join(benchWindows, "wh")
      .groupBy(col(idCol))
      .agg(count_distinct(col("wh")).as("n_hits"))
  }

  /** xxhash64 of a value — the hash `BloomFilterAggregate` expects. */
  def hashed(c: Column): Column =
    GraftBridge.column(new XxHash64(Seq(GraftBridge.expression(c))))

  /** Probe a serialized Bloom filter (plan literal — foldable, so the
    * probe deserializes it once per task).
    */
  def mightContain(bloom: Array[Byte], value: Column): Column =
    GraftBridge.column(BloomFilterMightContain(
      Literal(bloom, BinaryType),
      new XxHash64(Seq(GraftBridge.expression(value)))))
}
