package graft

/** Measurement main behind the SCALECURVE §12b kernel fix: times one
  * framed training round and the framed assignment at the k = 10,000
  * shape (the HOF-fold argmin measured 43 s at n = 100k; the
  * NearestCentroidIn kernel is the fix under test).
  * Run: tools/run.sh graft.ProfileFramedAssign [n]
  */
object ProfileFramedAssign {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("profile-framed",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val n = args.headOption.map(_.toLong).getOrElse(100000L)
    val vecs = ScaleCurve.vectorCorpus(spark, n)
    val t0 = System.nanoTime()
    val cents = graft.extensions.Kmeans.lloydFramed(vecs, "vec_id",
      "embedding", k = 10000, rounds = 1, nSupers = 100)
    println(f"[profile] train framed: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    val routing0 = graft.extensions.Kmeans.framedRoutingFor(cents,
      "cluster", "cv", nSupers = 100)
    val routing = graft.extensions.Kmeans.FramedRouting(
      routing0.routeCents, routing0.members.localCheckpoint(true))
    for (i <- 1 to 2) {
      spark.catalog.clearCache()
      val t1 = System.nanoTime()
      graft.extensions.Kmeans.framedAssign(vecs, "vec_id", "embedding",
          routing)
        .agg(org.apache.spark.sql.functions.sum("dq")).collect()
      println(f"[profile] assign framed run $i: ${(System.nanoTime() - t1) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
