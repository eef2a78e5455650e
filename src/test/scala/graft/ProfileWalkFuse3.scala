package graft
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Variant hunt for the fused walk skip-grams at the 6.4M octave:
  * (a) current shape (persisted stepped frames + checkpointed agg);
  * (b) fully lazy (no persist, O(steps^2)/2 join chains, lazy agg);
  * (c) persisted steps, LAZY aggregate (count only — no checkpoint).
  */
object ProfileWalkFuse3 {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("graft-profile-walkfuse3", "32")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $tag%-30s ${(System.nanoTime() - t0) / 1e9}%.2f s  -> $r")
      r
    }
    def edges(n: Long) = spark.range(0, n).toDF("src")
      .select(col("src"), explode(array(lit(1), lit(2), lit(3))).as("j"))
      .select(col("src"),
        ((col("src") + 1L +
          pmod(hash(col("src") * 31L + col("j")), lit(n - 1))) % n)
          .as("dst"))

    def pick(t: Int): org.apache.spark.sql.Column =
      conv(substring(md5(concat(col("cur").cast("string"),
          lit("#"), col("walk").cast("string"), lit(s"#$t"))), 1, 8),
        16, 10).cast("long")

    def lazyFused(e0: DataFrame, steps: Int, wps: Int, window: Int,
                  persistSteps: Boolean): DataFrame = {
      val e = e0.select(col("src").cast("long").as("src"),
                        col("dst").cast("long").as("dst"))
      val neighbors = e.groupBy("src")
        .agg(sort_array(collect_list(col("dst"))).as("dsts"),
             count(lit(1)).as("deg"))
        .persist()
      var frontier = e.select(col("src").as("start")).distinct()
        .select(col("start"),
          explode(sequence(lit(0), lit(wps - 1))).as("walk"))
        .select(col("start"), col("walk"), col("start").as("cur"),
          array(col("start")).as("recent"))
      var parts = List.empty[DataFrame]
      for (t <- 1 to steps) {
        var stepped = frontier.withColumn("h", pick(t))
          .join(neighbors, col("cur") === col("src"))
          .select(col("start"), col("walk"), col("recent"),
            element_at(col("dsts"),
              (col("h") % col("deg") + 1L).cast("int")).as("cur"))
        if (persistSteps) stepped = stepped.persist()
        parts ::= stepped.select(explode(concat(
            transform(col("recent"), r =>
              struct(r.as("center"), col("cur").as("context"))),
            transform(col("recent"), r =>
              struct(col("cur").as("center"), r.as("context"))))).as("p"))
          .select(col("p.center").as("center"),
                  col("p.context").as("context"))
        if (t < steps) {
          val appended = concat(col("recent"), array(col("cur")))
          frontier = stepped.select(col("start"), col("walk"), col("cur"),
            when(size(appended) > window, slice(appended, 2, window))
              .otherwise(appended).as("recent"))
        }
      }
      parts.reduce(_.union(_)).groupBy("center", "context")
        .agg(count(lit(1)).as("cnt"))
    }

    // warm-up
    lazyFused(edges(100000L), 3, 2, 2, persistSteps = false).count()
    spark.catalog.clearCache()
    val n = 6400000L
    t(s"LAZY no-persist no-ckpt n=$n")(
      lazyFused(edges(n), 3, 2, 2, persistSteps = false).count())
    spark.catalog.clearCache()
    t(s"PERSIST lazy-agg        n=$n")(
      lazyFused(edges(n), 3, 2, 2, persistSteps = true).count())
    spark.catalog.clearCache()
    t(s"CURRENT (ckpt)          n=$n")(graft.extensions.Graph
      .walkSkipGramPairs(edges(n), "src", "dst", 3, 2, 2).count())
    spark.stop()
  }
}
