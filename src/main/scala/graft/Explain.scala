package graft

/** Plan inspector: prints the formatted physical plan (and optionally
  * times two consecutive runs) for named SparkEntry queries, or runs ad
  * hoc SQL with the GraftExtensions functions registered.
  *
  * Usage: Explain <sfDir> <query1> [query2 ...] [--time]
  *        Explain --sql "SELECT seq_dot(array(1.0d,2.0d), array(3.0d,4.0d))"
  */
object Explain {
  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("--sql")) {
      val spark = org.apache.spark.sql.SparkSession.builder()
        .master("local[4]")
        .appName("graft-sql")
        .withExtensions(new GraftExtensions)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      spark.sql(args(1)).show(50, truncate = false)
      spark.stop()
      return
    }
    val time = args.contains("--time")
    val rest = args.filterNot(_ == "--time")
    val sfDir = rest.head
    val names = rest.tail
    val spark = Sessions.local("graft-explain",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      println(s"===== $name =====")
      df.explain("formatted")
      if (time) {
        (1 to 2).foreach { i =>
          val t0 = System.nanoTime()
          val n = SparkEntry.queries(name)(spark, sfDir).count()
          println(f"run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
        }
      }
    }
    spark.stop()
  }
}

/** Per-round plan evidence for the PageRank family (VERDICT r19 #6/#7):
  * the production loops are lazy chains cut by ONE final
  * localCheckpoint, so `Explain` on the registered queries shows only
  * the checkpoint scan — this main rebuilds ONE round from the
  * extracted production loop bodies (`Graph.prep` feeding
  * `Graph.pageRankRound` / `Graph.seededRound`, the exact functions the
  * loops call) over the real demo edge list and prints its formatted
  * plan twice: broadcast ON (the demo regime, where the rank vector
  * broadcasts) and broadcast OFF (the production regime, where the rank
  * vector exceeds any broadcast threshold and the round must reuse the
  * cached edge frame's hash-by-src layout instead of re-exchanging it).
  * Read-only instrumentation; never part of the driver contract.
  */
object ExplainPageRankRound {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.local("graft-explain-round",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    val G = graft.extensions.Graph
    val edges = graft.queries.PipelineDemos.docLinkEdges(spark, sfDir)
    val (verts, linked) = G.prep(edges, "src", "dst", 4, 85L, 100L)
    val v = verts.count()
    val base = G.Scale / v
    val teleport = (15L * base) / 100L
    val vertsT = verts.select(col("id"), lit(teleport).as("tp"))
    // a MATERIALIZED round-k rank vector (lineage-cut), so the dumped
    // plan is exactly one round, not the whole chain
    val ranks = verts.select(col("id"), lit(base).as("rank_fp"))
      .localCheckpoint(true)
    val seedsT = ranks.filter(col("id") % 50 === 0)
      .select(col("id"), lit(teleport).as("tp")).localCheckpoint(true)
    val seedRanks = seedsT.select(col("id"), lit(base).as("rank_fp"))
      .localCheckpoint(true)
    def dump(title: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      println(s"===== $title =====")
      mk.explain("formatted")
    }
    dump("pagerank round (demo regime: broadcast on)")(
      G.pageRankRound(vertsT, linked, ranks, 85L, 100L))
    dump("pagerank_seeded round (demo regime: broadcast on)")(
      G.seededRound(seedsT, linked, seedRanks, 85L, 100L))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    dump("pagerank round (production regime: broadcast off — the static" +
         " linked side must show NO new Exchange, its cached" +
         " hash-by-src layout is the join distribution)")(
      G.pageRankRound(vertsT, linked, ranks, 85L, 100L))
    dump("pagerank_seeded round (production regime: broadcast off)")(
      G.seededRound(seedsT, linked, seedRanks, 85L, 100L))
    spark.stop()
  }
}
