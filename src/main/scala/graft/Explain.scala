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
