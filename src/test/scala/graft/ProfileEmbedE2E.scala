package graft

import org.apache.spark.sql.functions._

import graft.extensions.{Components, CorpusClean, TextAnalysis}

/** Step-by-step timing of the pipeline_embed_e2e composite:
  * `sbt "Test/runMain graft.ProfileEmbedE2E [sfDir]"`.
  */
object ProfileEmbedE2E {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.local("graft-profile-embed",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    for (round <- 1 to 2) {
      println(s"--- round $round")
      spark.catalog.clearCache()
      val cleaned = CorpusClean.run(graft.tables.Tables.documents(spark, dir),
          "doc_id", "text")
        .select(col("id"),
                TextAnalysis.groupSplit(col("id")).as("split"),
                TextAnalysis.tokenCount(col("text")).as("n_tokens"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      t("cleaned.count")(cleaned.count())
      val vecs = graft.tables.Tables.embeddings(spark, dir)
        .join(cleaned.select(col("id").as("vec_id")), "vec_id")
        .select("vec_id", "embedding")
      t("vecs.count")(vecs.count())
      val index = t("trainDeterministic")(
        graft.extensions.Ivf.trainDeterministic(vecs, "vec_id", "embedding",
          k = 8))
      val pairs = graft.extensions.Ivf.nearDupPairs(vecs, "vec_id",
          "embedding", index, 0.45, nProbe = 2)
        .select(col("id_a"), col("id_b"))
      t("nearDupPairs.count")(pairs.count())
      val losers = Components.dedupClusters(pairs)
        .filter(!col("survivor")).select(col("id"))
      t("dedupClusters losers.count")(losers.count())
      t("final anti-join")(
        cleaned.join(losers, Seq("id"), "left_anti").orderBy("id").count())
    }
    spark.stop()
  }
}
