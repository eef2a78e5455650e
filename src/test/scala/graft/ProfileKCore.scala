package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-off profiling harness for the k-core peel (mirrors
  * ProfileGraph): `tools/run.sh graft.ProfileKCore [n] [k] [rounds]`.
  */
object ProfileKCore {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(5000L)
    val spark = Sessions.local("graft-profile-kcore",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    def edges: DataFrame = spark.range(0, n).toDF("src")
      .select(col("src"), explode(array(lit(1), lit(2), lit(3))).as("j"))
      .select(col("src"),
        ((col("src") + 1L +
          pmod(hash(col("src") * 31L + col("j")), lit(n - 1))) % n).as("dst"))
    // warm
    graft.extensions.Graph.kCore(
      spark.range(0, 2000).toDF("src")
        .select(col("src"), ((col("src") + 1) % 2000).as("dst")),
      "src", "dst", 2, 2).count()
    // job-count trace (r15, VERDICT r14 #7): the over-cutoff driver
    // probe fold must show up as one fewer Spark job per call
    val jobs = new java.util.concurrent.atomic.AtomicInteger()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            s: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
      })
    for ((k, rounds) <- Seq((5, 4), (5, 8), (5, 12))) {
      spark.catalog.clearCache()
      val j0 = jobs.get()
      val t0 = System.nanoTime()
      val rows = graft.extensions.Graph
        .kCore(edges, "src", "dst", k, rounds).count()
      println(f"[profile] kcore n=$n k=$k rounds=$rounds -> $rows rows " +
        f"${(System.nanoTime() - t0) / 1e9}%.2f s " +
        s"jobs=${jobs.get() - j0}")
    }
    spark.stop()
  }
}
