package graft.extensions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, in increasing
  * sophistication: exact (hash groupBy), MinHash+LSH banding, SimHash,
  * and blocked n-gram Jaccard verification.
  *
  * Scale design: every variant avoids the O(n²) all-pairs comparison —
  * exact dedup is one hash aggregation; MinHash/SimHash reduce each doc to
  * a constant-size signature (map-side, no shuffle), then candidate
  * generation is an equi-join on band/block keys (shuffle on the band
  * key, AQE-skew-safe) and only candidates pay the verification cost.
  * All hashing is md5-based and engine-independent (oracle-checkable).
  */
object TextDedup {

  /** Exact dedup: content-hash groupBy keeping the smallest id
    * (deterministic keeper).
    */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("n_dups"))

  /** MinHash signature: k independent permutations simulated as
    * `min(md5(i || '|' || shingle))` per hash index i — one constant-size
    * signature array per doc, computed map-side.
    */
  def minhashSignature(text: Column, k: Int = 8, shingleN: Int = 3): Column = {
    val sh = TextAnalysis.shingles(text, shingleN)
    array((0 until k).map(i =>
      array_min(transform(sh,
        s => md5(concat(lit(s"$i|"), s))))): _*)
  }

  /** LSH band keys: the signature split into `bands` contiguous rows,
    * each band hashed to one bucket key. Docs sharing any band key are
    * candidate duplicates.
    */
  def bandKeys(sig: Column, k: Int = 8, bands: Int = 4): Column = {
    val rows = k / bands
    array((0 until bands).map(b =>
      concat(lit(s"$b|"),
        md5(concat_ws("|",
          (0 until rows).map(r => sig.getItem(b * rows + r)): _*)))): _*)
  }

  /** MinHash+LSH candidate pairs: explode band keys, self-join on the
    * bucket, dedup (a < b). The only shuffle is on the band key.
    */
  def minhashCandidates(docs: DataFrame, idCol: String, textCol: String,
                        k: Int = 8, bands: Int = 4): DataFrame = {
    val sigs = docs.select(col(idCol).as("id"),
        minhashSignature(col(textCol), k).as("sig"))
      .select(col("id"), explode(bandKeys(col("sig"), k, bands)).as("band"))
    val l = sigs.select(col("id").as("id_a"), col("band"))
    val r = sigs.select(col("id").as("id_b"), col("band"))
    l.join(r, "band")
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
  }

  /** SimHash: d-dimensional ±1 vote per token using md5 nibbles, sign →
    * bit. Near-duplicates differ in few bits (compare by Hamming
    * distance). Emitted as a d-char '0'/'1' string. Expression-only —
    * per-row, no shuffle.
    */
  def simhash(text: Column, d: Int = 16): Column = {
    val toks = TextAnalysis.tokens(text)
    val bits = (1 to d).map { j =>
      val votes = aggregate(toks, lit(0),
        (acc, t) => acc +
          when(substring(md5(t), j, 1).isin("8", "9", "a", "b", "c", "d",
            "e", "f"), 1).otherwise(-1))
      when(votes >= 0, lit("1")).otherwise(lit("0"))
    }
    concat(bits: _*)
  }

  /** Blocked n-gram Jaccard: candidates = docs sharing a blocking key
    * (default: the min-shingle fingerprint); verification = exact Jaccard
    * over distinct shingle sets. Counts are integers → the ratio is
    * engine-independent.
    */
  def jaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                   blockCol: Column, threshold: Double,
                   shingleN: Int = 3): DataFrame = {
    val prepped = docs.select(
      col(idCol).as("id"),
      blockCol.as("block"),
      array_distinct(TextAnalysis.shingles(col(textCol), shingleN))
        .as("shingle_set"))
    val l = prepped.select(col("id").as("id_a"), col("block"),
                           col("shingle_set").as("set_a"))
    val r = prepped.select(col("id").as("id_b"), col("block"),
                           col("shingle_set").as("set_b"))
    l.join(r, "block")
      .filter(col("id_a") < col("id_b"))
      .withColumn("n_common",
        size(array_intersect(col("set_a"), col("set_b"))).cast("long"))
      .withColumn("n_union",
        (size(col("set_a")) + size(col("set_b"))).cast("long")
          - col("n_common"))
      .withColumn("jaccard",
        col("n_common").cast("double") / col("n_union").cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "n_common", "n_union", "jaccard")
  }
}
