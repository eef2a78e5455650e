package graft
import org.apache.spark.sql.functions._

/** r15 spot-check (VERDICT r14 #3/#4): (a) fused walk skip-grams vs
  * the materializing corpus job at the §10 octaves; (b) one §11
  * octave re-run under the session-isolated expansion scope to show
  * the spill fix survived the newSession rebase. Run via tools/run.sh
  * in tmux (long).
  */
object ProfileWalkFuse {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("graft-profile-walkfuse", "32")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $tag%-34s ${(System.nanoTime() - t0) / 1e9}%.2f s  -> $r")
      r
    }
    def edges(n: Long) = spark.range(0, n).toDF("src")
      .select(col("src"), explode(array(lit(1), lit(2), lit(3))).as("j"))
      .select(col("src"),
        ((col("src") + 1L +
          pmod(hash(col("src") * 31L + col("j")), lit(n - 1))) % n)
          .as("dst"))
    // warm-up
    graft.extensions.Graph.walkSkipGramPairs(edges(100000L), "src",
      "dst", 3, 2, 2).count()
    spark.catalog.clearCache()
    for (n <- Seq(1600000L, 6400000L)) {
      t(s"walks ARTIFACT n=$n")(graft.extensions.Graph
        .deterministicWalks(edges(n), "src", "dst", 3, 2).count())
      spark.catalog.clearCache()
      t(s"fused PAIRS   n=$n")(graft.extensions.Graph
        .walkSkipGramPairs(edges(n), "src", "dst", 3, 2, 2).count())
      spark.catalog.clearCache()
    }
    // §11 one octave under the child-session expansion scope
    val n = 1600000L
    t(s"triangles scoped n=$n")(graft.extensions.Graph
      .triangleCounts(edges(n), "src", "dst")
      .agg(sum(col("triangles"))).collect().head.getLong(0))
    spark.catalog.clearCache()
    t(s"linkpredict scoped n=$n")(graft.extensions.Graph
      .linkCandidates(edges(n), "src", "dst").count())
    spark.stop()
  }
}
