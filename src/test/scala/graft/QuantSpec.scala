package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.extensions.Similarity
import graft.functions.{NearestCentroid, PqCodes, PqDistTable, TopCells}

/** Bit-equivalence of the native quantization kernels (round-6
  * QuantExpressions) with the composed-builtin chains they replaced —
  * the chains are reconstructed here verbatim so the equivalence stays
  * executable, not a comment. Ties are planted (duplicate centroids) to
  * pin the tie-break contracts: cell ranking ties to the LARGER cell
  * (reverse array_sort order), PQ argmin ties to the SMALLER code.
  */
class QuantSpec extends SparkTestBase {

  private def vecsDf(n: Int, d: Int) = {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    (0 until n).map(i => (i.toLong, Array.fill(d)(rng.nextGaussian())))
      .toDF("id", "v")
  }

  // ---- the replaced chains, reconstructed ----
  private def chainRankedCells(nvec: Column,
                               cents: Array[Array[Double]]): Column =
    reverse(array_sort(array(cents.zipWithIndex.map { case (c, i) =>
      struct(Similarity.dot(nvec, lit(c)).as("dot"), lit(i).as("cell"))
    }: _*)))

  private def subvec(vec: Column, j: Int, dsub: Int): Column =
    slice(vec.cast("array<double>"), j * dsub + 1, dsub)

  private def chainL2sq(sub: Column, centroid: Array[Double]): Column =
    aggregate(zip_with(sub, lit(centroid), (a, c) => (a - c) * (a - c)),
      lit(0.0), (acc, x) => acc + x)

  private def chainCode(vec: Column, j: Int, dsub: Int,
                        book: Array[Array[Double]]): Column =
    array_sort(array(book.zipWithIndex.map { case (c, i) =>
      struct(chainL2sq(subvec(vec, j, dsub), c).as("d"),
             lit(i).as("code"))
    }: _*)).getItem(0).getField("code")

  test("NearestCentroid == array_min(array(struct(l2sq, id))) incl. a " +
       "planted distance tie (smaller cluster id wins) and sparse " +
       "cluster ids") {
    val rng = new scala.util.Random(13)
    val base = Array.fill(5)(Array.fill(16)(rng.nextGaussian()))
    // centroid row 4 duplicates row 1: every vector ties on their
    // distances; sparse non-contiguous ids exercise the id mapping
    val cents: Array[(Int, Array[Double])] =
      Array(0 -> base(0), 3 -> base(1), 5 -> base(2), 7 -> base(3),
            9 -> base(1).clone())
    val composed = array_min(array(cents.map { case (cid, cv) =>
      struct(chainL2sq(col("v").cast("array<double>"), cv).as("d"),
             lit(cid).as("cluster"))
    }: _*))
    val got = vecsDf(64, 16).select(col("id"),
        NearestCentroid(col("v"), cents).as("n"),
        composed.as("e"))
      .select(col("id"),
        col("n.cluster"), col("e.cluster"),
        col("n.d"), col("e.d"))
      .collect()
    got.foreach { r =>
      assert(r.getInt(1) == r.getInt(2),
        s"id ${r.getLong(0)}: cluster ${r.getInt(1)} != ${r.getInt(2)}")
      assert(java.lang.Double.compare(r.getDouble(3), r.getDouble(4)) == 0,
        s"id ${r.getLong(0)}: d ${r.getDouble(3)} != ${r.getDouble(4)}")
    }
    // all-NaN distances: the kernel must return the composed form's
    // exact (smallest id, NaN) — a +∞-seeded argmin would report +∞
    import spark.implicits._
    val nanGot = Seq(0L -> Array.fill(16)(Double.NaN))
      .toDF("id", "v")
      .select(NearestCentroid(col("v"), cents).as("n"), composed.as("e"))
      .select(col("n.cluster"), col("e.cluster"), col("n.d"), col("e.d"))
      .collect().head
    assert(nanGot.getInt(0) == 0 && nanGot.getInt(1) == 0)
    assert(nanGot.getDouble(2).isNaN && nanGot.getDouble(3).isNaN)
    // the planted tie actually surfaces: whenever the duplicated
    // centroid wins, the SMALLER id (3, not 9) must be reported
    assert(got.exists(_.getInt(1) == 3), "planted duplicate never won")
    assert(!got.exists(_.getInt(1) == 9),
      "tie must resolve to the smaller cluster id")
    // dimension-mismatch contract: shorter AND longer vectors null out
    import spark.implicits._
    val bad = Seq(1L -> Array.fill(8)(0.0), 2L -> Array.fill(32)(0.0))
      .toDF("id", "v")
      .select(NearestCentroid(col("v"), cents).as("n")).collect()
    assert(bad.forall(_.isNullAt(0)))
  }

  test("TopCells == reverse(array_sort(struct(dot, cell))) incl. " +
       "planted dot ties (larger cell wins)") {
    val rng = new scala.util.Random(11)
    val base = Array.fill(6)(Array.fill(16)(rng.nextGaussian()))
    // centroid 6 duplicates centroid 2: every row ties on their dots
    val cents = base :+ base(2).clone()
    val df = vecsDf(64, 16)
    val got = df.select(col("id"),
        TopCells(col("v"), cents, 3).as("cells"),
        slice(transform(chainRankedCells(col("v").cast("array<double>"),
          cents), s => s.getField("cell")), 1, 3).as("exp"))
      .collect()
    got.foreach { r =>
      assert(r.getSeq[Int](1) == r.getSeq[Int](2),
        s"id ${r.getLong(0)}: ${r.getSeq[Int](1)} != ${r.getSeq[Int](2)}")
    }
    // the planted tie actually surfaces: cells 2 and 6 tie, 6 must rank
    // first wherever either appears
    val first = df.select(TopCells(col("v"), cents, 7).as("c")).collect()
    first.foreach { r =>
      val order = r.getSeq[Int](0)
      assert(order.indexOf(6) < order.indexOf(2),
        s"tie must order larger cell first, got $order")
    }
  }

  test("PqCodes / PqDistTable == the array_sort/aggregate chains incl. " +
       "planted code ties (smaller code wins)") {
    val rng = new scala.util.Random(13)
    val (m, dsub, nCodes) = (4, 8, 5)
    val books = Array.fill(m)(
      Array.fill(nCodes)(Array.fill(dsub)(rng.nextGaussian())))
    // plant a tie in subspace 0: code 4 duplicates code 1 → 1 must win
    books(0)(4) = books(0)(1).clone()
    val df = vecsDf(64, m * dsub)
    val got = df.select(col("id"),
        PqCodes(col("v"), books).as("codes"),
        array((0 until m).map(j =>
          chainCode(col("v"), j, dsub, books(j))): _*).as("expCodes"),
        PqDistTable(col("v"), books).as("dt"),
        flatten(array((0 until m).map(j =>
          array(books(j).map(c =>
            chainL2sq(subvec(col("v"), j, dsub), c)): _*)): _*))
          .as("expDt"))
      .collect()
    got.foreach { r =>
      assert(r.getSeq[Int](1) == r.getSeq[Int](2),
        s"id ${r.getLong(0)} codes: ${r.getSeq[Int](1)} != ${r.getSeq[Int](2)}")
      // exact double equality — same fold order is the contract
      assert(r.getSeq[Double](3) == r.getSeq[Double](4),
        s"id ${r.getLong(0)} ADC table differs")
      // subspace 0's duplicated code 4 can never be a strict argmin —
      // code 1 (identical centroid, smaller id) always beats it
      assert(r.getSeq[Int](1).head != 4,
        "planted duplicate code 4 must lose the tie to code 1")
    }
  }

  test("short vectors yield null (documented contract)") {
    import spark.implicits._
    val df = Seq((1L, Array(0.5, 0.5))).toDF("id", "v")
    val cents = Array(Array.fill(8)(0.1), Array.fill(8)(0.9))
    val books = Array.fill(2)(Array.fill(2)(Array.fill(4)(0.0)))
    val r = df.select(
      TopCells(col("v"), cents, 1).as("a"),
      PqCodes(col("v"), books).as("b"),
      PqDistTable(col("v"), books).as("c")).collect().head
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
  }
}
