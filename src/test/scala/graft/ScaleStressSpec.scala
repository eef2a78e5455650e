package graft

import org.apache.spark.sql.functions._

/** Order-of-magnitude scale smoke: the near-dup pipeline on a synthetic
  * corpus 4× the sf0.1 documents table (20k docs, 40 tokens each, 1000
  * planted near-dup pairs). Guards the SCALE.md claims with numbers:
  * candidate volume stays bucket-bounded (no quadratic blow-up), recall
  * on planted pairs stays ~1, and the whole pass completes in one test
  * JVM at local[4] — the shape that scales is the shape that runs here.
  */
class ScaleStressSpec extends SparkTestBase {

  test("minhash near-dup pipeline on 20k synthetic docs: planted pairs " +
       "found, candidate volume bucket-bounded") {
    val nBase = 19000L
    val nCopies = 1000L
    // doc k's text: 40 PSEUDO-RANDOM tokens from a 100k vocabulary
    // (murmur3 of k and position — consecutive-valued tokens would give
    // the corpus a tiny shared shingle pool and near-dup EVERYTHING);
    // docs >= nBase copy doc (id - nBase) and append one extra token ->
    // near-dup, not exact-dup
    val docs = spark.range(0, nBase + nCopies).toDF("doc_id")
      .withColumn("k",
        when(col("doc_id") >= nBase, col("doc_id") - nBase)
          .otherwise(col("doc_id")))
      .withColumn("text",
        concat_ws(" ",
          transform(sequence(lit(0L), lit(39L)),
            j => concat(lit("w"),
              pmod(hash(col("k") * 997L + j * 131L), lit(99991))))))
      .withColumn("text",
        when(col("doc_id") >= nBase, concat(col("text"), lit(" extra")))
          .otherwise(col("text")))
      .select("doc_id", "text")

    val cands = graft.extensions.TextDedup
      .minhashCandidates(docs, "doc_id", "text")
    val nCands = cands.count()
    // 1000 planted near-identical pairs + md5-collision strays; a
    // quadratic bucket blow-up would be millions
    assert(nCands < 50000L, s"candidate volume blew up: $nCands")

    val pairs = graft.extensions.TextDedup
      .jaccardVerified(docs, "doc_id", "text", 0.5)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val planted = pairs.count { case (a, b) => b - a == nBase }
    // 39/41 shared shingles -> jaccard ~0.93; expected LSH misses at
    // (1 - 0.93^2)^4 per pair ~ 4e-4 -> a handful out of 1000
    assert(planted >= 990L,
      s"recall collapsed: only $planted of $nCopies planted pairs")
    // verification must kill sub-threshold strays: every surviving pair
    // at jaccard >= 0.5 with 500-vocab random text is a planted pair or
    // an exact k-collision (none by construction below 19000*7 period)
    assert(pairs.length.toLong <= nCopies + 10,
      s"false near-dups survived verification: ${pairs.length}")
  }
}
