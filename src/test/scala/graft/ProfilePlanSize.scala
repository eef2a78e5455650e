package graft

import org.apache.spark.sql.functions._

/** One-off profiling harness (the Profile* convention): analyzed-plan
  * node counts of the SemDeDup pairs frame before/after the dense-cell
  * cap — Components.connectedComponents switches lineage policy at 128
  * analyzed nodes (lazy persist vs eager localCheckpoint), so a plan
  * growth across that threshold changes the demo's execution shape.
  */
object ProfilePlanSize {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("plansize", "8")
    val dir = "/root/testdata/sf0.01"
    val e = graft.tables.Tables.embeddings(spark, dir)
    val m = graft.extensions.Kmeans.lloyd(e, "vec_id", "embedding", 8, 3)
    val staged = graft.extensions.Kmeans.semStage(e, "vec_id", "embedding", m)
    val pairs = graft.extensions.Kmeans.pairsOf(staged, 0.45)
    println("NEW pairs analyzed nodes: " +
      pairs.queryExecution.analyzed.collect { case p => p }.size)
    val oldPairs = {
      val colocated = staged.repartition(col("cluster"))
      val a = colocated.select(col("cluster"), col("id").as("id_a"),
        col("v").as("v_a"), col("nrm").as("nrm_a"))
      val b = colocated.select(col("cluster"), col("id").as("id_b"),
        col("v").as("v_b"), col("nrm").as("nrm_b"))
      a.join(b, Seq("cluster")).filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          when(col("nrm_a") > 0 && col("nrm_b") > 0,
            graft.extensions.Similarity.dot(col("v_a"), col("v_b"))
              / (col("nrm_a") * col("nrm_b"))).otherwise(lit(0.0)).as("cos"))
        .filter(col("cos") >= 0.45)
    }
    println("OLD pairs analyzed nodes: " +
      oldPairs.queryExecution.analyzed.collect { case p => p }.size)
    // end-to-end pipeline wall, old vs new pair generator (min of 3
    // after a warm-up each — the bench methodology)
    import org.apache.spark.sql.expressions.Window
    def pipeline(p: org.apache.spark.sql.DataFrame): Long = {
      val comps = graft.extensions.Components
        .connectedComponents(p, "id_a", "id_b")
      comps.join(staged.select(col("id"), col("dq")), "id")
        .withColumn("rn", row_number().over(
          Window.partitionBy("comp").orderBy(col("dq").desc, col("id"))))
        .count()
    }
    def time3(mk: => Long, label: String): Unit = {
      mk
      val best = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); mk; (System.nanoTime() - t0) / 1e9
      }.min
      println(f"$label pipeline min-of-3: $best%.3f s")
    }
    time3(pipeline(oldPairs), "OLD")
    time3(pipeline(graft.extensions.Kmeans.pairsOf(staged, 0.45)), "NEW")
    time3(pipeline(oldPairs), "OLD2")
    spark.stop()
  }
}
