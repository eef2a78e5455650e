package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart,
  SparkListenerStageCompleted, SparkListenerTaskEnd}
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Measurement harness for the optimization rounds (guide §1): per
  * query, after one untimed warm-up, reports min-of-3 wall seconds plus
  * the job/stage/task counts and shuffle bytes of ONE cold run — the
  * fixed-overhead profile that dominates demo-scale wall time and the
  * shuffle profile that dominates at 100 TB. Pure read-only
  * instrumentation over the same SparkEntry registry the bench runs;
  * never part of the driver contract.
  *
  * Usage: Profile <sfDir> [query1,query2,...]   (default: all queries)
  * Output: one TSV line per query on stdout —
  *   name  wallMinSec  jobs  stages  tasks  shuffleWriteMB  warmSec
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names: Seq[String] =
      if (args.length > 1) args(1).split(",").toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.local("graft-profile", cpus)

    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val shuffleWrite = new AtomicLong(0L)
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        val m = t.taskMetrics
        if (m != null) shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      }
    }
    spark.sparkContext.addSparkListener(listener)

    println("name\twall_min_s\tjobs\tstages\ttasks\tshuffle_mb\twarm_s")
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => System.err.println(s"[profile] unknown query: $name")
        case Some(fn) =>
          spark.sparkContext.setJobDescription(s"profile: $name")
          val w0 = System.nanoTime()
          try fn(spark, sfDir).count()
          catch { case e: Throwable =>
            System.err.println(s"[profile] $name warmup FAILED: ${e.getMessage}")
          }
          val warm = (System.nanoTime() - w0) / 1e9
          // settle listener events from the warm-up before counting
          // (the bus is async and private[spark]; a short sleep is
          // accurate enough for whole-query job/stage counts)
          Thread.sleep(300)
          jobs.set(0); stages.set(0); tasks.set(0); shuffleWrite.set(0L)
          val t0 = System.nanoTime()
          fn(spark, sfDir).count()
          val first = (System.nanoTime() - t0) / 1e9
          Thread.sleep(300)
          val (j, st, tk, sw) =
            (jobs.get(), stages.get(), tasks.get(), shuffleWrite.get())
          val rest = (1 to 2).map { _ =>
            val r0 = System.nanoTime()
            fn(spark, sfDir).count()
            (System.nanoTime() - r0) / 1e9
          }
          val best = (first +: rest).min
          println(f"$name\t$best%.3f\t$j\t$st\t$tk\t${sw / 1e6}%.1f\t$warm%.3f")
      }
    }
    spark.stop()
  }
}
