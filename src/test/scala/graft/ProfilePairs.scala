package graft
import org.apache.spark.sql.functions._
import graft.extensions.{Components, CorpusClean}
object ProfilePairs {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = Sessions.local("graft-profile-pairs", "32")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $tag%-30s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val e = graft.tables.Tables.embeddings(spark, dir)
    // (a) raw corpus pairs (dedup_embed_components shape)
    val idxA = graft.extensions.Ivf.trainDeterministic(e, "vec_id", "embedding", 8)
    val pairsA = graft.extensions.Ivf.nearDupPairs(e, "vec_id", "embedding", idxA, 0.45, 2).select(col("id_a"), col("id_b"))
    println("[profile] pairsA n=" + pairsA.count())
    t("components RAW")(Components.dedupClusters(pairsA).count())
    spark.catalog.clearCache()
    // (b) composite pairs (pipeline_embed_e2e shape)
    val cleaned = CorpusClean.run(graft.tables.Tables.documents(spark, dir), "doc_id", "text")
      .select(col("id")).persist()
    val vecs = e.join(cleaned.select(col("id").as("vec_id")), "vec_id").select("vec_id", "embedding")
    val idxB = graft.extensions.Ivf.trainDeterministic(vecs, "vec_id", "embedding", 8)
    val pairsB = graft.extensions.Ivf.nearDupPairs(vecs, "vec_id", "embedding", idxB, 0.45, 2).select(col("id_a"), col("id_b"))
    println("[profile] pairsB n=" + pairsB.count())
    t("components COMPOSITE")(Components.dedupClusters(pairsB).count())
    println("[profile] planA nodes=" + pairsA.queryExecution.optimizedPlan.collect { case x => x }.size
      + " analyzed=" + pairsA.queryExecution.analyzed.collect { case x => x }.size)
    println("[profile] planB nodes=" + pairsB.queryExecution.optimizedPlan.collect { case x => x }.size
      + " analyzed=" + pairsB.queryExecution.analyzed.collect { case x => x }.size)
    val jp = graft.extensions.TextDedup.jaccardVerified(graft.tables.Tables.documents(spark, dir), "doc_id", "text", 0.5)
      .select(col("id_a"), col("id_b"))
    println("[profile] planJ analyzed=" + jp.queryExecution.analyzed.collect { case x => x }.size)
    val pairsBp = pairsB.persist()
    println("[profile] pairsBp n=" + pairsBp.count())
    t("components COMPOSITE-PERSISTED")(Components.dedupClusters(pairsBp).count())
    import spark.implicits._
    val local = pairsB.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.toDF("id_a", "id_b")
    t("components LOCAL-COPY")(Components.dedupClusters(local).count())
    spark.stop()
  }
}
