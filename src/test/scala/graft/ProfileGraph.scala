package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-off profiling harness for Graph shapes (mirrors
  * ProfileComponents): `sbt "Test/runMain graft.ProfileGraph [n]"`.
  */
object ProfileGraph {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1600000L)
    val spark = Sessions.local("graft-profile-graph",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    def edges: DataFrame = spark.range(0, n).toDF("src")
      .select(col("src"), explode(array(lit(1), lit(2), lit(3))).as("j"))
      .select(col("src"),
        ((col("src") + 1L +
          pmod(hash(col("src") * 31L + col("j")), lit(n - 1))) % n).as("dst"))
    // warm
    graft.extensions.Graph.pageRankFixedPoint(
      spark.range(0, 10000).toDF("src")
        .select(col("src"), ((col("src") + 1) % 10000).as("dst")),
      "src", "dst", 4).count()
    for (round <- 1 to 3) {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      graft.extensions.Graph.pageRankFixedPoint(edges, "src", "dst", 4)
        .count()
      println(f"[profile] pagerank n=$n round=$round " +
        f"${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.catalog.clearCache()
      val t1 = System.nanoTime()
      graft.extensions.Graph.deterministicWalks(edges, "src", "dst",
        steps = 3, walksPerStart = 2).count()
      val leaked = spark.sparkContext.getPersistentRDDs.size
      println(f"[profile] walks    n=$n round=$round " +
        f"${(System.nanoTime() - t1) / 1e9}%.2f s " +
        f"(persistent RDDs after: $leaked)")
      spark.catalog.clearCache()
      val tb = System.nanoTime()
      graft.extensions.Graph.biasedWalks(edges, "src", "dst",
        steps = 3, walksPerStart = 2,
        wReturn = 1, wStay = 2, wExplore = 4).count()
      println(f"[profile] biased   n=$n round=$round " +
        f"${(System.nanoTime() - tb) / 1e9}%.2f s")
      spark.catalog.clearCache()
      val t2 = System.nanoTime()
      val seeds = spark.range(0, n).toDF("id").filter(col("id") % 7 === 0)
        .select(col("id"), (col("id") % 5).cast("string").as("lab"))
      graft.extensions.Graph.labelPropagation(edges, "src", "dst",
        seeds, "id", "lab", rounds = 3).filter(col("label").isNotNull).count()
      println(f"[profile] labelprop n=$n round=$round " +
        f"${(System.nanoTime() - t2) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
