package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Spill audit for the §11 graph octaves (wave-2 follow-up to the
  * linkCandidates fix): times triangleCounts / kCore / kTruss (full
  * cascade and sparse delta) at the SCALECURVE sizes with a stage
  * listener accumulating spill + shuffle-write deltas — if an
  * operator's heavy octave is spill-bound, the expansion-sized
  * partitioning pattern applies; if not, the growth is honest work.
  * `tools/run.sh graft.ProfileGraphSpill [n ...]`
  */
object ProfileGraphSpill {
  def main(args: Array[String]): Unit = {
    val ns = if (args.nonEmpty) args.map(_.toLong).toSeq
             else Seq(1600000L, 6400000L)
    val spark = Sessions.local("graft-profile-graphspill",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    @volatile var spill = 0L
    @volatile var shufW = 0L
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted)
            : Unit = {
          val s = sc.stageInfo.taskMetrics.memoryBytesSpilled +
            sc.stageInfo.taskMetrics.diskBytesSpilled
          spill += s
          shufW += sc.stageInfo.taskMetrics.shuffleWriteMetrics
            .bytesWritten
          if (s > 256000000L)
            println(f"  [stage ${sc.stageInfo.stageId}%5d " +
              f"spill=${s / 1000000L}%6d MB tasks=" +
              f"${sc.stageInfo.numTasks}%4d] " +
              sc.stageInfo.name.take(120))
        }
      })
    // listener events arrive asynchronously on the bus — drain until
    // the counters hold still so a late stage-completed event can't be
    // attributed to the wrong phase (or dropped from the last one)
    def stabilized(): (Long, Long) = {
      var prev = (spill, shufW)
      var same = 0
      while (same < 3) {
        Thread.sleep(100)
        val cur = (spill, shufW)
        if (cur == prev) same += 1 else { same = 0; prev = cur }
      }
      prev
    }
    def phase(tag: String)(body: => Long): Unit = {
      val (s0, w0) = stabilized()
      val t0 = System.nanoTime()
      val rows = body
      val sec = (System.nanoTime() - t0) / 1e9
      val (s1, w1) = stabilized()
      println(f"[profile] $tag%-16s $sec%7.2f s" +
        f"  rows=$rows%-10d spill=${(s1 - s0) / 1000000L}%6d MB" +
        f"  shufW=${(w1 - w0) / 1000000L}%6d MB")
      spark.catalog.clearCache()
    }
    // warm
    graft.extensions.Graph.triangleCounts(
      spark.range(0, 20000).toDF("src")
        .select(col("src"), ((col("src") + 1) % 20000).as("dst")),
      "src", "dst").count()
    for (n <- ns; round <- 1 to 2) {
      println(s"== n=$n round=$round ==")
      def edges: DataFrame = spark.range(0, n).toDF("src")
        .select(col("src"), explode(array(lit(1), lit(2), lit(3))).as("j"))
        .select(col("src"),
          ((col("src") + 1L +
            pmod(hash(col("src") * 31L + col("j")), lit(n - 1))) % n)
            .as("dst"))
      def circ: DataFrame = spark.range(0, n).toDF("src")
        .select(col("src"),
          explode(array(lit(1), lit(2), lit(3), lit(4))).as("j"))
        .select(col("src"), ((col("src") + col("j")) % n).as("dst"))
      def chords: DataFrame = spark.range(0, n / 64).toDF("i")
        .select(pmod(hash(col("i") * 7L), lit(n)).cast("long").as("src"),
          pmod(hash(col("i") * 13L + 5L), lit(n)).cast("long").as("dst"))
      phase("triangles") {
        graft.extensions.Graph.triangleCounts(edges, "src", "dst").count()
      }
      phase("kcore") {
        graft.extensions.Graph.kCore(edges, "src", "dst",
          k = 4, maxRounds = 4).count()
      }
      phase("ktruss k6") {
        graft.extensions.Graph.kTruss(circ, "src", "dst",
          k = 6, maxRounds = 2, localCutoff = 0).count()
      }
      phase("ktruss sparse") {
        graft.extensions.Graph.kTruss(circ.unionByName(chords),
          "src", "dst", k = 5, maxRounds = 3, localCutoff = 0).count()
      }
    }
    spark.stop()
  }
}
