package graft.extensions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Link-graph centrality for corpus curation: PageRank over a directed
  * edge list, in fixed-point integer arithmetic so results are
  * bit-identical across engines and cluster layouts.
  *
  * Why integer: floating-point PageRank sums contributions in
  * partition order, so the same graph yields last-ulp-different ranks
  * run to run — unverifiable against an oracle and non-reproducible
  * across cluster sizes. Here ranks are scaled longs ([[Scale]] = one
  * unit of probability mass) and every step is integral (`div`
  * truncation, exact 64-bit sums), so any summation order gives the
  * same bits. The per-step truncation loses ≤1/[[Scale]] of mass per
  * vertex per round — irrelevant to ranking, decisive for testability.
  *
  * The 100 TB shape (the CommonCrawl-style "rank domains to weight a
  * training mixture" job): per iteration one join of the static
  * (src, dst, deg) frame against the current ranks plus one groupBy(dst)
  * — the classic two-shuffle PageRank round. The edge frame is hashed by
  * src ONCE and persisted, so iterations re-shuffle only the rank
  * vector (|V| rows, two longs each), never the edges (|E| rows); at
  * scale the same layout is a bucketed edges table. Per-round frames
  * are localCheckpoint'd to cut lineage (constant-size plans, same
  * stance as [[Components]]). Dangling vertices (no out-edges) simply
  * leak their damped mass — the standard simplification; it is applied
  * identically in the oracle so parity is exact.
  *
  * No counterpart in the reference (it ranks nothing); this is part of
  * the training-data pipeline surface (domain-quality weighting).
  */
object Graph {

  /** One unit of rank mass: 1.0 == 1e12. Large enough that 4–10
    * iterations of per-step truncation (≤ |iters|/Scale relative loss)
    * never reorder two vertices whose true ranks differ measurably;
    * small enough that 85 * sum(contribs) stays far inside Long range
    * (total mass ≤ Scale, so 85 * Scale ≈ 8.5e13 ≪ 2^63).
    */
  val Scale = 1000000000000L

  /** Fixed-point PageRank.
    *
    * @param edges      directed edge list; duplicate edges count twice
    *                   (multi-edge = heavier link), self-loops allowed
    * @param iterations fixed round count (rank jobs run a fixed budget,
    *                   not to convergence — reproducibility beats the
    *                   last decimal of precision)
    * @param dampNum/dampDen damping as an exact rational (85/100)
    * @return (id, rank_fp): one row per vertex appearing in `edges`,
    *         rank_fp = PageRank mass in [[Scale]] units, bit-exact for
    *         any partitioning. rank_fp/1e12 is the familiar probability.
    */
  def pageRankFixedPoint(edges: DataFrame, srcCol: String, dstCol: String,
                         iterations: Int = 4,
                         dampNum: Long = 85L, dampDen: Long = 100L): DataFrame = {
    require(iterations >= 1 && iterations <= 64, "fixed iteration budget")
    require(dampNum > 0 && dampNum < dampDen, "damping must be in (0,1)")
    val spark = edges.sparkSession
    val e = edges.select(col(srcCol).cast("long").as("src"),
                         col(dstCol).cast("long").as("dst"))

    val verts = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    // bounded driver scalar (one long), same class as Ivf's k-row builds
    val v = verts.count()
    val base = Scale / v                      // == SQL `Scale div v`
    val teleport = ((dampDen - dampNum) * base) / dampDen

    // static per-iteration probe side: (src, dst, deg), hashed by src
    // once so each round shuffles only the rank vector against it
    val linked = e.join(e.groupBy("src").agg(count(lit(1)).as("deg")), "src")
      .repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    var ranks = verts.select(col("id"), lit(base).as("rank_fp"))
      .localCheckpoint(true)
    for (_ <- 1 to iterations) {
      val contribs = linked
        .join(ranks.withColumnRenamed("id", "src"), "src")
        .select(col("dst"), expr("rank_fp div deg").as("c"))
        .groupBy("dst").agg(sum(col("c")).as("contrib"))
      val next = verts
        .join(contribs.withColumnRenamed("dst", "id"), Seq("id"), "left")
        .select(col("id"),
          (lit(teleport) +
            expr(s"($dampNum * coalesce(contrib, 0L)) div $dampDen"))
            .as("rank_fp"))
      val old = ranks
      // materialize + truncate lineage: round N's plan never contains
      // round N-1's (Components' stance — without this the logical plan
      // doubles per round and the driver re-analyzes the whole history)
      ranks = next.localCheckpoint(true)
      old.unpersist(false)
    }
    linked.unpersist(false)
    verts.unpersist(false)
    ranks
  }
}
