package graft

/** Plan inspector: prints the formatted physical plan (and optionally
  * times two consecutive runs) for named SparkEntry queries.
  *
  * Usage: Explain <sfDir> <query1> [query2 ...] [--time]
  */
object Explain {
  def main(args: Array[String]): Unit = {
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
