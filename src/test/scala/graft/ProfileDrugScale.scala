package graft

import org.apache.spark.sql.functions._

// scratch: validate the ScaleCurve §7 planted truths at small n — not a test
object ProfileDrugScale {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("profile-drugscale", "32")
    val n = if (args.nonEmpty) args(0).toLong else 1280L
    val (drugs, nodes, clusters) = ScaleCurve.drugCorpus(spark, n, 100L, 50L)
    val edges = spark.range(0, 0).select(
      lit("").as("id"), lit("").as("subject"), lit("").as("predicate"),
      lit("").as("object"), lit("").as("upstream_resource_id"),
      lit("").as("primary_knowledge_source"))
    val syn = new graft.synonymizer.Synonymizer(nodes, clusters, edges)
    val t0 = System.nanoTime()
    val s2 = graft.drugbank.Stage2.run(
      graft.drugbank.Stage1.run(drugs, syn,
        new graft.ner.DictionaryNer(nodes, clusters)),
      new graft.stage2.IdentifierAlignment(syn)).persist()
    val recs = s2.count()
    val mech = s2.select(explode(col("mechanistic_intermediate_nodes"))).count()
    val ind = s2.select(explode(col("indication_NER_aligned"))).count()
    println(f"[drugscale] n=$n recs=$recs/${n} " +
      s"mech=$mech/${2 * n + n / 2 + n / 4 + n / 8} ind=$ind/${n / 2} " +
      f"wall=${(System.nanoTime() - t0) / 1e9}%.1f s")
    if (mech != 2 * n + n / 2 + n / 4 + n / 8) {
      // diagnose: per-cluster-prefix histogram of mech entries
      s2.select(explode(col("mechanistic_intermediate_nodes"))
          .as(Seq("curie", "info")))
        .groupBy(substring(col("curie"), 1, 4)).count()
        .orderBy(col("count").desc).show(20, false)
    }
    spark.stop()
  }
}
