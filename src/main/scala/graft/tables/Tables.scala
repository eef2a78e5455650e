package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-generated TPC-H-ish parquet testdata
  * (TESTDATA.md). Every `SparkEntry.queries` entry receives the sf
  * directory and reads through here so the scan is a plain parquet
  * relation Catalyst can push filters/projections into.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** events.parquet stores `ts` as INT64 TIMESTAMP(NANOS) which Spark's
    * parquet reader rejects; sessions set
    * `spark.sql.legacy.parquet.nanosAsLong=true` (see Sessions.base) so it
    * arrives as nanos-since-epoch LongType, converted here to a micros
    * TimestampType column (truncation — Spark's native precision).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val df = load(s, d, "events")
    // integral division — `/` on longs goes through double, whose ulp at
    // ~1.7e18 ns is 256 ns (measured: 1,494/100k timestamps off by 1 µs)
    if (df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
