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
