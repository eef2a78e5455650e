package graft.ops

import org.apache.spark.sql.DataFrame

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
    * well-split input. Inspecting `df.rdd` runs physical planning but no
    * job.
    */
  def ensureParallelism(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
