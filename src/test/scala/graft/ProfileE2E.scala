package graft

// scratch profiler for drugbank_e2e stage timing — not a test
object ProfileE2E {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local("profile-e2e", "32")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    val taskMs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted)
            : Unit = {
          stages.incrementAndGet()
          tasks.addAndGet(s.stageInfo.numTasks)
          if (sys.env.contains("GRAFT_PROFILE_STAGES")) {
            val i = s.stageInfo
            val ms = (for {
              c <- i.completionTime; b <- i.submissionTime
            } yield c - b).getOrElse(-1L)
            println(s"[stage] id=${i.stageId} tasks=${i.numTasks} " +
              s"wall=${ms}ms name=${i.name.linesIterator.next()}")
          }
        }
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (t.taskInfo != null) taskMs.addAndGet(t.taskInfo.duration)
      })
    val df = time("build plan") {
      SparkEntry.queries("drugbank_e2e")(spark, dir)
    }
    time("run 1")(df.collect().length)
    println(s"[profile] run 1: stages=${stages.get} tasks=${tasks.get} " +
      f"taskTime=${taskMs.get / 1e3}%.1f s")
    stages.set(0); tasks.set(0); taskMs.set(0)
    time("run 2")(SparkEntry.queries("drugbank_e2e")(spark, dir)
      .collect().length)
    println(s"[profile] run 2: stages=${stages.get} tasks=${tasks.get} " +
      f"taskTime=${taskMs.get / 1e3}%.1f s")
    spark.stop()
  }
}
