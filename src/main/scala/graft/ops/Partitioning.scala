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

  /** Write `df` as a bucketed, per-bucket-sorted parquet table and read
    * it back through the catalog. Joins/aggregations keyed on `key`
    * between tables sharing a bucket count then plan with ZERO
    * ShuffleExchange on the bucketed sides — the write is the shuffle,
    * paid once, reused by every subsequent query. This is the
    * co-located-join layout the 100 TB design leans on: fact and
    * dimension bucketed on the join key at ingest time make the daily
    * join/agg jobs shuffle-free (and bucket pruning turns key-equality
    * predicates into file skipping).
    *
    * The table is external (explicit `path`); `name` must be unique per
    * (corpus, process) — callers key both by a corpus content stamp +
    * pid, same stance as the ANN index artifacts.
    */
  def bucketedTable(df: DataFrame, name: String, key: String, buckets: Int,
                    path: String): DataFrame =
    bucketedTable(df, name, Seq(key), buckets, path)

  /** Multi-key variant: bucket (and per-bucket sort) on ALL of `keys`.
    * Needed whenever the consuming join is keyed on a composite: with
    * Spark's default `requireAllClusterKeysForCoPartition=true`, a scan
    * bucketed on a strict subset of the join keys does NOT count as
    * co-partitioned — the planner re-shuffles on the full key and then
    * disables the bucketed read entirely. Bucketing on the full
    * composite keeps the join shuffle-free.
    */
  def bucketedTable(df: DataFrame, name: String, keys: Seq[String],
                    buckets: Int, path: String): DataFrame = {
    require(keys.nonEmpty, "bucketedTable needs >=1 bucket key")
    val spark = df.sparkSession
    // a same-name catalog table whose files live at `path` marks the
    // path as a previous build of THIS table — safe to clear below
    val priorSameTable = spark.catalog.tableExists(name) &&
      scala.util.Try {
        val loc = spark.sessionState.catalog
          .getTableMetadata(org.apache.spark.sql.catalyst
            .TableIdentifier(name)).location
        java.nio.file.Paths.get(loc.getPath).normalize() ==
          java.nio.file.Paths.get(path).normalize()
      }.getOrElse(false)
    spark.sql(s"DROP TABLE IF EXISTS `$name`")
    // the drop above leaves an EXTERNAL table's files behind; clear the
    // path so a reused (name, path) pair rebuilds cleanly. The
    // destructive step is SCOPED to paths this process owns: a
    // registered per-pid scratch location (ScratchDirs.covers — every
    // production caller) or the location of the same-name table just
    // dropped (a cross-session rebuild in one process). Any OTHER
    // non-empty path fails loudly here — the overwrite-mode write below
    // would otherwise silently destroy unrelated data (overwrite
    // truncates the location; the CTAS non-empty-location error only
    // guards the error-if-exists mode).
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(hp)) {
      if (priorSameTable || graft.tables.ScratchDirs.covers(path))
        fs.delete(hp, true)
      else require(fs.listStatus(hp).isEmpty,
        s"bucketedTable: $path is non-empty and not a location this " +
          "process owns (not ScratchDirs-registered, not the dropped " +
          s"table's own location) — refusing to overwrite it; pass a " +
          "dedicated scratch path (ScratchDirs.register/tmp)")
    }
    df.write.format("parquet")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .option("path", path)
      .mode("overwrite")
      .saveAsTable(name)
    spark.table(name)
  }
}
