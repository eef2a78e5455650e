package graft.extensions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Embedding similarity search: exact-arithmetic cosine, brute-force
  * top-k as the correctness baseline, and a sign-LSH bucketed variant as
  * the scale path (candidates share a hyperplane-sign bucket → only
  * bucket-mates pay the cosine).
  *
  * Determinism note: float sums are association-order-dependent, so a
  * parallel/grouped SUM differs between engines in the last ulp (and a
  * decimal detour doesn't help: engines disagree on double→decimal
  * rounding in the 16th place). Instead every reduction here is an
  * explicit SEQUENTIAL left-to-right double fold — Spark `aggregate`
  * over the array ≡ DuckDB `list_reduce` — with element-wise products
  * exact in double. Same values, same order, same IEEE ops →
  * bit-identical results on any engine, so cosine thresholds and top-k
  * orderings are oracle-checkable.
  */
object Similarity {

  /** Sequential left-to-right sum of an array<double> (deterministic,
    * engine-independent; NOT a parallel SUM).
    */
  def seqSum(arr: Column): Column =
    aggregate(arr, lit(0.0), (a, x) => a + x)

  /** Exact dot product of two float/double vectors. */
  def dot(a: Column, b: Column): Column =
    seqSum(zip_with(
      a.cast(ArrayType(DoubleType)), b.cast(ArrayType(DoubleType)),
      (x, y) => x * y))

  /** Exact-arithmetic L2 norm. */
  def norm(a: Column): Column = {
    val ad = a.cast(ArrayType(DoubleType))
    sqrt(seqSum(zip_with(ad, ad, (x, y) => x * y)))
  }

  /** Cosine similarity (exact dot/norms; null-safe on zero vectors). */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val na = norm(a)
    val nb = norm(b)
    when(na > 0 && nb > 0, d / (na * nb)).otherwise(lit(0.0))
  }

  /** All-pairs cosine above a threshold — the embedding near-dup
    * verification kernel. Norms are computed ONCE per vector (map-side)
    * before the pair join, so each pair pays only the dot product.
    * ids with idA < idB.
    */
  def pairwiseCosine(vecs: DataFrame, idCol: String, vecCol: String,
                     threshold: Double = -1.0): DataFrame = {
    val prepped = vecs.select(col(idCol).as("id"), col(vecCol).as("vec"),
                              norm(col(vecCol)).as("nrm"))
    val l = prepped.select(col("id").as("id_a"), col("vec").as("vec_a"),
                           col("nrm").as("nrm_a"))
    val r = prepped.select(col("id").as("id_b"), col("vec").as("vec_b"),
                           col("nrm").as("nrm_b"))
    l.crossJoin(r)
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
              (dot(col("vec_a"), col("vec_b"))
                / (col("nrm_a") * col("nrm_b"))).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** Brute-force top-k: every query row against the full corpus
    * (broadcast the query side; norms precomputed per side), rank by
    * (cos desc, id). The correctness baseline — O(|queries| × |corpus|);
    * the scale path is [[lshNearNeighbors]] / bucketed ranking.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = broadcast(queries.select(col(idCol).as("query_id"),
                                     col(vecCol).as("query_vec"),
                                     norm(col(vecCol)).as("query_nrm")))
    val scored = corpus
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("vec"),
              norm(col(vecCol)).as("nrm"))
      .crossJoin(q)
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
              (dot(col("query_vec"), col("vec"))
                / (col("query_nrm") * col("nrm"))).as("cos"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Deterministic ±1 hyperplane component for plane p, dimension j:
    * sign of an md5 nibble — reproducible in any engine, no RNG state.
    */
  private def planeSign(p: Int, j: Column): Column =
    when(substring(md5(concat(lit(s"plane$p|"), j.cast("string"))), 1, 1)
      .isin("8", "9", "a", "b", "c", "d", "e", "f"), lit(1.0))
      .otherwise(lit(-1.0))

  /** Sign-LSH bucket key: `planes` hyperplanes of ±1 components starting
    * at plane index `offset`; bit p = sign of Σ_j v[j]·plane_p[j] (exact
    * decimal accumulation). Vectors in the same bucket are near-neighbor
    * candidates. At scale this is the index: one map-side pass, then an
    * equi-join on the bucket; multiple tables (offsets) trade work for
    * recall.
    */
  def lshBucket(vec: Column, planes: Int = 8, offset: Int = 0): Column = {
    val vd = vec.cast(ArrayType(DoubleType))
    val bits = (offset until offset + planes).map { p =>
      val signed = zip_with(vd,
        transform(sequence(lit(0), size(vd) - 1), j => planeSign(p, j)),
        (x, s) => x * s)
      when(seqSum(signed) >= 0, lit("1")).otherwise(lit("0"))
    }
    concat(bits: _*)
  }

  /** LSH-bucketed near-neighbor pairs above a cosine threshold: candidates
    * from the bucket equi-join, verified with exact cosine.
    */
  def lshNearNeighbors(vecs: DataFrame, idCol: String, vecCol: String,
                       threshold: Double, tables: Int = 4,
                       planesPerTable: Int = 3): DataFrame = {
    val bucketed = vecs.select(
      col(idCol).as("id"), col(vecCol).as("vec"),
      norm(col(vecCol)).as("nrm"),
      explode(array((0 until tables).map(t =>
        concat(lit(s"$t|"),
          lshBucket(col(vecCol), planesPerTable, t * planesPerTable))): _*))
        .as("bucket"))
    val l = bucketed.select(col("id").as("id_a"), col("vec").as("vec_a"),
                            col("nrm").as("nrm_a"), col("bucket"))
    val r = bucketed.select(col("id").as("id_b"), col("vec").as("vec_b"),
                            col("nrm").as("nrm_b"), col("bucket"))
    l.join(r, "bucket")
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("vec_a"), col("vec_b"),
              col("nrm_a"), col("nrm_b"))
      .distinct()
      .select(col("id_a"), col("id_b"),
              (dot(col("vec_a"), col("vec_b"))
                / (col("nrm_a") * col("nrm_b"))).as("cos"))
      .filter(col("cos") >= threshold)
  }
}
