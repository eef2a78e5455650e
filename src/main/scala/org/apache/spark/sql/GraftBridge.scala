package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into the `private[sql]` Column↔Expression conversions —
  * the standard pattern for Spark extension libraries that define custom
  * Catalyst expressions (the public API intentionally hides the
  * expression-backed Column constructor since Spark 4's backend split).
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** DataFrame from a logical plan (plan-shape tests re-plan a subtree
    * after peeling a presentation-only operator). */
  def ofRows(spark: SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Identity token of the LIVE CacheManager entry this frame's plan
    * resolves to, if any. The token is the identity hash of the stored
    * `CachedData` record, which is created at `persist()` registration
    * and replaced by a NEW record after `clearCache()`/`unpersist()` +
    * re-persist — so two verdicts computed "over the cache" can be told
    * apart even when the plans are semantically identical (same path,
    * rewritten data). `Dataset.storageLevel` only answers "cached NOW",
    * which cannot distinguish a re-registered entry from the one a
    * memoized verdict was computed on. */
  def cacheEntryToken(df: Dataset[_]): Option[Int] = {
    val ds = df.asInstanceOf[classic.Dataset[_]]
    ds.sparkSession.sharedState.cacheManager.lookupCachedData(ds)
      .map(System.identityHashCode(_))
  }
}
