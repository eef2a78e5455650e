package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

// Standalone re-measurement of the r18 SCALECURVE additions (§13b,
// §12c nProbe=2 recovery, 5c-cores): the full-file regen hit ENOSPC in
// a late section twice, so the NEW sections are measured here and
// spliced into the committed md with a note. Deleted before commit.
object TmpScalePatch {

  private def timeIt(spark: SparkSession)(action: => Long): (Double, Long) = {
    var rows = 0L
    val samples = (1 to 2).map { _ =>
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      rows = action
      (System.nanoTime() - t0) / 1e9
    }
    (samples.min, rows)
  }

  def main(args: Array[String]): Unit = {
    val which = args.headOption.getOrElse("all")

    if (which == "13b" || which == "all") {
      val spark = Sessions.local("graft-scalepatch", "32")
      val alpha = lit("abcdefghijklmnopqrstuvwxyz")
      val n = 800000L
      val types = 200000L
      val docs = spark.range(0, n).toDF("doc_id")
        .withColumn("text", concat_ws(" ",
          transform(sequence(lit(0L), lit(29L)), j => {
            val w = pmod(hash(col("doc_id") * 1009L + j * 131L),
              lit(types)).cast("long")
            concat((0 until 10).map(p => alpha.substr(
              (pmod(hash(w * lit(31L) + lit(p.toLong)), lit(26L)) + 1L)
                .cast("int"), lit(1))): _*)
          })))
        .select("doc_id", "text")
      val wf = graft.extensions.Bpe.wordFreqIds(docs, "text")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      var vocab = 0L
      var t0 = System.nanoTime()
      vocab = wf.count()
      val secW = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      val mSeq = graft.extensions.Bpe.collectMergesIdsFrom(wf, 256).size
      val secSeq = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      val mFast = graft.extensions.Bpe.collectMergesIdsFastFrom(wf, 8192).size
      val secFast = (System.nanoTime() - t0) / 1e9
      println(f"PATCH13B| $n | $vocab | $secW%.2f | $mSeq/$mSeq/$secSeq%.1f " +
        f"| $mFast/2/$secFast%.1f | ${secSeq / mSeq * mFast}%.0f |")
      wf.unpersist(false)
      spark.catalog.clearCache()
      if (which == "13b") spark.stop()
    }

    if (which == "12c" || which == "all") {
      val spark = Sessions.local("graft-scalepatch", "32")
      val n = 200000L
      val vecs = ScaleCurve.vectorCorpus(spark, n)
      val k = 100000
      val nSup2 = 316
      val nSup3 = 46
      val cents = graft.extensions.Kmeans.lloydFramed(vecs, "vec_id",
        "embedding", k = k, rounds = 1, nSupers = nSup2)
      cents.count()
      val cc = cents.localCheckpoint(true)
      val r2raw = graft.extensions.Kmeans.framedRoutingFor(
        cc, "cluster", "cv", nSupers = nSup2)
      val r2 = graft.extensions.Kmeans.FramedRouting(
        r2raw.routeCents, r2raw.members.localCheckpoint(true))
      val r3raw = graft.extensions.Kmeans.framedRoutingFor3(
        cc, "cluster", "cv", nSupers = nSup3, nMids = nSup3)
      val r3 = graft.extensions.Kmeans.FramedRouting3(
        r3raw.routeCents, r3raw.mids.localCheckpoint(true),
        r3raw.members.localCheckpoint(true))
      val (secA3, _) = timeIt(spark) {
        graft.extensions.Kmeans.framedAssign3(vecs, "vec_id",
            "embedding", r3)
          .agg(sum(col("dq"))).collect().head.getLong(0)
      }
      val (secA3p2, _) = timeIt(spark) {
        graft.extensions.Kmeans.framedAssign3(vecs, "vec_id",
            "embedding", r3, nProbe = 2)
          .agg(sum(col("dq"))).collect().head.getLong(0)
      }
      def asg(df: DataFrame, c: String) =
        df.select(col("id"), col("cluster").as(c))
      val a2 = asg(graft.extensions.Kmeans.framedAssign(vecs, "vec_id",
        "embedding", r2), "c2").localCheckpoint(true)
      val a3 = asg(graft.extensions.Kmeans.framedAssign3(vecs, "vec_id",
        "embedding", r3), "c3").localCheckpoint(true)
      def frac(l: DataFrame, r: DataFrame): Double = {
        val row = l.join(r, "id")
          .agg(sum(when(col("c2") === col("c3"), 1L).otherwise(0L)),
               count(lit(1))).collect().head
        row.getLong(0).toDouble / row.getLong(1)
      }
      val agree1 = frac(a2, a3)
      val a2p2 = asg(graft.extensions.Kmeans.framedAssign(vecs, "vec_id",
        "embedding", r2, nProbe = 2), "c2").localCheckpoint(true)
      val a3p2 = asg(graft.extensions.Kmeans.framedAssign3(vecs, "vec_id",
        "embedding", r3, nProbe = 2), "c3").localCheckpoint(true)
      val agree2 = frac(a2p2, a3p2)
      println(f"PATCH12C| $n | $k | $nSup3×$nSup3 | $secA3%.2f " +
        f"| $secA3p2%.2f | $agree1%.3f | $agree2%.3f |")
      spark.catalog.clearCache()
      if (which == "12c") spark.stop()
    }

    if (which == "cores" || which == "all") {
      org.apache.spark.sql.SparkSession.getActiveSession
        .foreach(_.stop())
      def measureAt(cpusN: Int): Double = {
        val s = Sessions.local(s"graft-scale-cores$cpusN", cpusN.toString)
        try {
          val n = 64000000L
          val nameMod = n * 3 / 5
          val (nodes, clusters, edges) = ScaleCurve.synTables(s, n, nameMod)
          val syn = new graft.synonymizer.Synonymizer(nodes, clusters,
            edges,
            probeJoin = graft.synonymizer.Synonymizer.ShuffleProbe(16))
          val probes = s.range(0, 100000L).select(
            when(col("id") % 2 === 0,
              concat(lit("N:"), pmod(col("id") * 7L, lit(n))))
            .otherwise(concat(lit("Name"), pmod(col("id"), lit(nameMod))))
            .as("input"))
          val (sec, _) = timeIt(s) {
            syn.normalizerResults(probes)
              .agg(sum(size(col("nodes"))).as("m"),
                   count(col("preferred_category")).as("c"))
              .collect().head.getLong(1)
          }
          sec
        } finally {
          s.stop()
          ()
        }
      }
      val s32 = measureAt(32)
      val s16 = measureAt(16)
      println(f"PATCHCORES| 64000000 | 100000 | $s32%.2f | $s16%.2f " +
        f"| ${s16 / s32}%.2f |")
    }
  }
}
