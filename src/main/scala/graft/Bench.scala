package graft
import java.nio.file.{Files, Paths}
object Bench {
  /** Per-query wall time at SPARK_GRAFT_SF_DIR, one JSON line on stdout
    * AND written to a file (`SPARK_GRAFT_BENCH_OUT`, default
    * /root/repo/bench.json): stdout passes through sbt's `[info]` prefix,
    * which broke the driver's parser two rounds running — the file is the
    * machine-readable artifact (same pattern as Verify's oracle_sql.json).
    *
    * Methodology: each query runs once untimed (JIT + codegen + file
    * listing warm-up — multi-second on first execution and pure constant
    * overhead, not throughput), then the better of two timed full
    * executions is recorded (the host shows multi-second scheduling
    * noise; min-of-2 keeps the gate comparing engine work, not noisy
    * neighbors). Keep the methodology fixed across rounds so the 2×
    * regression gate compares like with like (BASELINE.md).
    *
    * A failed query records a large positive penalty (600s) so the total
    * visibly DEGRADES — the previous -1.0 sentinel subtracted from the
    * total, making a failing round look faster.
    */
  val failurePenaltySec = 600.0

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
      name -> (if (failed) failurePenaltySec else times.min)
    }
    // 3-decimal times: r01-r03 all came back "parsed": null — the driver
    // reads a bounded stdout tail, and 85 queries at full double precision
    // overflow it, truncating the JSON line mid-object. ~1ms resolution is
    // far below this host's scheduling noise, and the line stays < 2.5 KB.
    def f(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + f(v) }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    val json =
      s"""{"metric":"total","value":${f(total)},"unit":"sec","queries":$qs,"sf":"$sfDir","failures":$failures}"""
    println(json)
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/root/repo/bench.json")
    Files.writeString(Paths.get(out), json + "\n")
    spark.stop()
  }
}
