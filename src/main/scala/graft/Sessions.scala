package graft

import org.apache.spark.sql.SparkSession

/** Shared SparkSession construction for the driver mains and tests.
  *
  * - shuffle partitions sized to the local core count (not the 200
  *   default) — at cluster scale this is instead set per-job / by AQE.
  * - AQE on: runtime coalescing + skew-join splitting.
  * - `nanosAsLong`: the events testdata carries INT64 TIMESTAMP(NANOS),
  *   unreadable by Spark's vectorized reader otherwise (Tables.events
  *   converts back to TimestampType).
  */
object Sessions {
  def local(appName: String, cpus: String): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // honor advisoryPartitionSizeInBytes when coalescing instead of
      // keeping defaultParallelism partitions: post-shuffle partitions
      // are sized to data volume, so a tiny shuffle collapses to one
      // task instead of `cpus` near-empty ones (the composite pipelines
      // were paying ~50 ms of scheduling per empty task), while a 100 TB
      // shuffle still fans out to volume/64 MB partitions
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
              "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // shuffle files live until a JVM GC lets ContextCleaner collect
      // their dependencies; the 30 min default outlives whole sections
      // of a long single-session batch run (the r18 SCALECURVE regen
      // filled 230 GB of /tmp with dead shuffles and crashed) — a
      // 2 min cadence reclaims continuously at negligible cost
      .config("spark.cleaner.periodicGC.interval", "2min")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
