package graft

/** Registry-wide structural guards — run against EVERY entry so a future
  * query can't quietly ship an anti-pattern the per-query specs don't
  * cover.
  */
class RegistryAuditSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("every oracle key names a registered query (no orphan oracles)") {
    val orphans = SparkEntry.oracleSql.keySet.diff(SparkEntry.queries.keySet)
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("approx_distinct estimates stay within 5% of the exact distinct " +
       "count (the documented reason it runs without a SQL oracle: the " +
       "HLL++ sketch layout is impl-specific, so accuracy is pinned " +
       "here instead)") {
    import org.apache.spark.sql.functions._
    val li = graft.tables.Tables.lineitem(spark, dir)
    val approx = SparkEntry.queries("approx_distinct")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = li.groupBy("l_returnflag")
      .agg(count_distinct(col("l_partkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    for ((k, e) <- exact) {
      val a = approx(k)
      assert(math.abs(a - e).toDouble / e <= 0.05,
        s"group $k: approx $a vs exact $e exceeds 5%")
    }
  }

  test("every registered query plans at sf0.001 and no plan contains a " +
       "CartesianProduct (unbroadcast cross joins are the one shape " +
       "that cannot survive scale)") {
    // BroadcastNestedLoopJoin over a broadcast 1-row/tiny frame is fine
    // (corpus-total joins, labeled brute-force baselines); a
    // CartesianProduct means BOTH sides ship everywhere — never acceptable.
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = fn(spark, dir).queryExecution.executedPlan.toString
        if (plan.contains("CartesianProduct")) Some(name) else None
    }
    assert(bad.isEmpty, s"queries with CartesianProduct plans: $bad")
  }
}
