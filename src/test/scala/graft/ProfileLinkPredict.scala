package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** One-off profiling harness for the linkCandidates ×4.1 last octave
  * (VERDICT r13 #3): replicates the operator's internal chain stage
  * by stage at the SCALECURVE §11 sizes and reports per-phase wall
  * plus cumulative spill/shuffle deltas from a stage listener —
  * naming WHERE the superlinear step lives (wedge agg spill, persist
  * materialization, anti-join, or top-k).
  * `tools/run.sh graft.ProfileLinkPredict [n ...]`
  */
object ProfileLinkPredict {
  def main(args: Array[String]): Unit = {
    val ns = if (args.nonEmpty) args.map(_.toLong).toSeq
             else Seq(1600000L, 6400000L)
    val spark = Sessions.local("graft-profile-linkpredict",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    @volatile var spill = 0L
    @volatile var shufW = 0L
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted)
            : Unit = {
          spill += sc.stageInfo.taskMetrics.memoryBytesSpilled +
            sc.stageInfo.taskMetrics.diskBytesSpilled
          shufW += sc.stageInfo.taskMetrics.shuffleWriteMetrics
            .bytesWritten
        }
      })
    def phase(tag: String)(body: => Long): Unit = {
      val (s0, w0) = (spill, shufW)
      val t0 = System.nanoTime()
      val rows = body
      println(f"[profile] $tag%-22s ${(System.nanoTime() - t0) / 1e9}%7.2f s" +
        f"  rows=$rows%-12d spill=${(spill - s0) / 1000000L}%6d MB" +
        f"  shufW=${(shufW - w0) / 1000000L}%6d MB")
    }
    // warm
    graft.extensions.Graph.linkCandidates(
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
      if (sys.env.get("SPARK_GRAFT_PROFILE_FULL_ONLY").contains("1")) {
        phase("full operator") {
          graft.extensions.Graph.linkCandidates(edges, "src", "dst",
            maxCenterDegree = 64, k = 50).count()
        }
        spark.catalog.clearCache()
      } else {
      // the operator's chain, replicated stage by stage
      val und = edges.filter(col("src") =!= col("dst"))
        .select(least(col("src"), col("dst")).as("a"),
          greatest(col("src"), col("dst")).as("b"))
        .distinct().persist(StorageLevel.MEMORY_AND_DISK)
      phase("und distinct")(und.count())
      val sym = und.union(und.select(col("b"), col("a")))
      val deg = sym.groupBy(col("a").as("u"))
        .agg(count(lit(1)).as("degree"))
      val centers = sym.select(col("a").as("u"), col("b").as("nbr"))
        .join(deg.filter(col("degree") <= 64), "u")
        .withColumn("invw", expr("1048576 div degree"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      phase("centers persist")(centers.count())
      val pairs = centers.as("c1")
        .join(centers.as("c2"),
          col("c1.u") === col("c2.u") && col("c1.nbr") < col("c2.nbr"))
        .groupBy(col("c1.nbr").as("a"), col("c2.nbr").as("b"))
        .agg(count(lit(1)).as("common"), sum(col("c1.invw")).as("wscore"))
      phase("wedge agg")(pairs.count())
      phase("anti + topk") {
        pairs.join(und, Seq("a", "b"), "left_anti")
          .orderBy(col("wscore").desc, col("a"), col("b"))
          .limit(50).count()
      }
      Seq(und, centers).foreach(_.unpersist(true))
      phase("full operator") {
        graft.extensions.Graph.linkCandidates(edges, "src", "dst",
          maxCenterDegree = 64, k = 50).count()
      }
      spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
