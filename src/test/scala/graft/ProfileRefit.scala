package graft

import org.apache.spark.sql.functions._

/** One-off profiling harness for the grouped IVF refit:
  * `sbt "Test/runMain graft.ProfileRefit [nVecs] [cells]"`.
  *
  * The claim under test (VERDICT r10 #1): the mode-split fit runs every
  * drifted cell in ONE distributed pass, so refit wall must stay FLAT
  * as the drifted-cell count grows from 1 to k/2 — the serial
  * per-cell-KMeans shape it replaced grew linearly (|D| sequential
  * Spark jobs). `fit` times the refit() call itself (advisory collect +
  * grouped split + new-index build); `e2e` adds the lazy migration's
  * materialization, whose cost tracks the drifted ROW volume (data-
  * proportional, expected to grow).
  */
object ProfileRefit {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(200000L)
    val k = args.drop(1).headOption.map(_.toInt).getOrElse(64)
    val spark = Sessions.local("graft-profile-refit",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    import spark.implicits._
    import graft.extensions.Ivf
    val dim = 16
    // executor-generated corpus: id-hash-derived vectors, one dominant
    // axis per id mod 8 so cells have real structure
    def vecs = spark.range(0, n).toDF("vec_id")
      .select(col("vec_id"),
        transform(sequence(lit(0), lit(dim - 1)), j =>
          (pmod(hash(col("vec_id") * 131L + j), lit(1000)).cast("double")
            / 1000.0 - 0.5) * 0.1 +
          when(pmod(col("vec_id"), lit(8)) * 2 === j, lit(1.0))
            .otherwise(lit(0.0))).as("embedding"))
    val index = Ivf.trainDeterministic(vecs, "vec_id", "embedding", k = k)
    val lists = Ivf.assign(vecs, "vec_id", "embedding", index)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    lists.count()
    // warm
    Ivf.refit(lists,
      advisoryFor(spark, Seq(0)), index).lists.count()
    for (d <- Seq(1, 4, 16, 32).filter(_ <= k / 2); round <- 1 to 2) {
      val adv = advisoryFor(spark, 0 until d)
      val t0 = System.nanoTime()
      val r = Ivf.refit(lists, adv, index)
      val tFit = (System.nanoTime() - t0) / 1e9
      r.lists.count()
      val tAll = (System.nanoTime() - t0) / 1e9
      println(f"[profile] refit n=$n k=$k drifted=$d%2d round=$round " +
        f"fit=$tFit%.2f s e2e=$tAll%.2f s (newK=${r.index.k})")
    }
    spark.stop()
  }

  /** Synthetic advisory flagging `cells` as drifted with a mid-range
    * error cut (hist 0.2, batch 0.8 → members above qerr 0.5 form the
    * new mode).
    */
  private def advisoryFor(spark: org.apache.spark.sql.SparkSession,
                          cells: Seq[Int]) = {
    import spark.implicits._
    cells.map(c => (c, 100L, 0.2, 100L, 0.8, true))
      .toDF("cell", "hist_n", "hist_err", "batch_n", "batch_err",
        "drifted")
  }
}
