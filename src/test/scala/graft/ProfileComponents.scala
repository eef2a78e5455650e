package graft

import org.apache.spark.sql.functions._

// scratch profiler: the SCALECURVE 6b long-path point — not a test
object ProfileComponents {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("profile-components", "32")
    if (sys.env.contains("GRAFT_PROFILE_STAGES"))
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onStageCompleted(
              s: org.apache.spark.scheduler.SparkListenerStageCompleted)
              : Unit = {
            val i = s.stageInfo
            val ms = (for {
              c <- i.completionTime; b <- i.submissionTime
            } yield c - b).getOrElse(-1L)
            if (ms > 300)
              println(s"[stage] id=${i.stageId} tasks=${i.numTasks} " +
                s"wall=${ms}ms name=${i.name.linesIterator.next()}")
          }
        })
    val n = if (args.nonEmpty) args(0).toLong else 16384L
    val mask = (n >> 1) | (n >> 3)
    val p = (c: org.apache.spark.sql.Column) => c.bitwiseXOR(lit(mask))
    val edges = spark.range(0, n - 1).toDF("i")
      .select(p(col("i")).as("src"), p(col("i") + 1).as("dst"))
    // warm
    graft.extensions.Components.connectedComponents(
      edges.limit(100), "src", "dst").count()
    val t0 = System.nanoTime()
    val labels = graft.extensions.Components
      .connectedComponents(edges, "src", "dst")
    val mislabeled = labels.filter(col("comp") =!= 0L).count()
    println(f"[profile] n=$n wall=${(System.nanoTime() - t0) / 1e9}%.1f s " +
      s"mislabeled=$mislabeled")
    spark.stop()
  }
}
