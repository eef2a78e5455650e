package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LeafNode, Project}

/** Partition-layout rescue for CPU-bound map stages.
  *
  * A small input (one parquet split) pins a whole shingle/minhash/n-gram
  * pass to one task; an unconditional `repartition()` fixes that but
  * forces a full shuffle of (id, text) at real scale where the scan
  * already yields thousands of splits — pure tax before map-side work
  * that needs no co-location. So: shuffle ONLY when the current layout
  * is narrower than the session's parallelism.
  */
object Partitioning {

  /** Repartition to `defaultParallelism` only if the plan's current
    * layout has fewer partitions — a no-op (no added Exchange) on any
    * well-split input.
    *
    * Applies ONLY to scan-rooted plans (projections/filters over a
    * single leaf): inspecting `df.rdd` runs physical planning, and with
    * AQE enabled a plan containing joins/aggregates would eagerly
    * materialize its query stages — real Spark jobs for the probe, then
    * re-executed by the returned DataFrame (silent double execution).
    * On a pure scan there are no query stages, so the probe is free.
    * Anything more complex is returned unchanged — by then the plan has
    * shuffles whose partitioning AQE already right-sizes.
    */
  def ensureParallelism(df: DataFrame): DataFrame = {
    val scanRooted = df.queryExecution.optimizedPlan.collect {
      case p => p
    }.forall {
      case _: Project | _: Filter | _: LeafNode => true
      case _ => false
    }
    if (!scanRooted) df
    else {
      val target = df.sparkSession.sparkContext.defaultParallelism
      if (df.rdd.getNumPartitions < target) df.repartition(target) else df
    }
  }
}
