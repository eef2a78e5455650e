package graft
import org.apache.spark.sql.functions._

/** Decompose the fused-pairs cost at the 6.4M octave: lazy aggregate
  * vs localCheckpointed, vs the full unfused pipeline
  * (walks → self-join → count) it replaces.
  */
object ProfileWalkFuse2 {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("graft-profile-walkfuse2", "32")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $tag%-38s ${(System.nanoTime() - t0) / 1e9}%.2f s  -> $r")
      r
    }
    def edges(n: Long) = spark.range(0, n).toDF("src")
      .select(col("src"), explode(array(lit(1), lit(2), lit(3))).as("j"))
      .select(col("src"),
        ((col("src") + 1L +
          pmod(hash(col("src") * 31L + col("j")), lit(n - 1))) % n)
          .as("dst"))
    graft.extensions.Graph.walkSkipGramPairs(edges(100000L), "src",
      "dst", 3, 2, 2).count()
    spark.catalog.clearCache()
    for (n <- Seq(1600000L, 6400000L)) {
      t(s"UNFUSED walks+selfjoin+agg n=$n") {
        val w = graft.extensions.Graph.deterministicWalks(edges(n),
          "src", "dst", 3, 2)
        graft.extensions.Graph.skipGramPairs(w, window = 2).count()
      }
      spark.catalog.clearCache()
      t(s"FUSED (checkpointed)      n=$n")(graft.extensions.Graph
        .walkSkipGramPairs(edges(n), "src", "dst", 3, 2, 2).count())
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
