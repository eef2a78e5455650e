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

  test("biased walk oracle generators emit well-formed WITH lists at " +
       "every steps value — steps=1 has an empty per-step CTE list and " +
       "used to leave a dangling comma (r15 review fix)") {
    for (steps <- 1 to 3;
         sql <- Seq(
           graft.queries.PipelineDemos.biasedWalksOracle(
             steps, walks = 2, wR = 1, wS = 2, wE = 4),
           graft.queries.PipelineDemos.biasedWalkPairsOracle(
             steps, walks = 2, window = 2, wR = 1, wS = 2, wE = 4))) {
      assert(!sql.contains(",,") &&
             !sql.linesIterator.exists(_.trim == ","),
        s"dangling comma in the steps=$steps WITH list:\n$sql")
      // the per-step CTEs must actually be present when steps >= 2
      assert((steps == 1) != sql.contains("b2 AS"),
        s"steps=$steps: per-step CTE presence mismatch")
    }
  }

  test("approx_distinct: the HLL++ estimate stays within 5% of exact — " +
       "both via the query's own approx_ok contract column and via an " +
       "independent recomputation of the raw estimate") {
    import org.apache.spark.sql.functions._
    // (1) the registered query's contract column must hold everywhere
    val rows = SparkEntry.queries("approx_distinct")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getBoolean(2),
      s"approx_ok false for group ${r.getString(0)}"))
    // (2) independent: raw estimate vs exact, not through the query
    val li = graft.tables.Tables.lineitem(spark, dir)
    val both = li.groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_partkey")).as("a"),
           count_distinct(col("l_partkey")).as("e"))
      .collect()
    both.foreach { r =>
      val (a, e) = (r.getLong(1), r.getLong(2))
      assert(math.abs(a - e).toDouble / e <= 0.05,
        s"group ${r.getString(0)}: approx $a vs exact $e exceeds 5%")
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

  test("registry-wide whole-stage-codegen audit: NO query leaves a " +
       "Project outside WholeStageCodegen (a single CodegenFallback " +
       "expression silently drops its whole operator to interpreted " +
       "row-at-a-time eval)") {
    // executes every query at sf0.001 — AQE only collapses codegen
    // stages at materialization, so a plan-only check can't see them
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val df = fn(spark, dir)
        df.collect()
        val phys = df.queryExecution.executedPlan match {
          case ad: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            ad.executedPlan
          case other => other
        }
        val naked = phys.collect {
          case p: org.apache.spark.sql.execution.ProjectExec
            if !phys.exists {
              case w: org.apache.spark.sql.execution.WholeStageCodegenExec =>
                w.collect { case x if x eq p => x }.nonEmpty
              case _ => false
            } => p
        }
        if (naked.nonEmpty) Some(s"$name(${naked.size})") else None
    }
    assert(offenders.isEmpty,
      s"queries with interpreted projections: $offenders")
  }
}
