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
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
