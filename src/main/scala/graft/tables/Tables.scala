package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

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
  /** events.parquet has shipped `ts` in three parquet flavors across
    * testdata regenerations; all three must read to the same UTC-instant
    * TimestampType column:
    *   - INT64 TIMESTAMP(NANOS): Spark's reader rejects it natively, so
    *     sessions set `spark.sql.legacy.parquet.nanosAsLong=true`
    *     (Sessions.base) and it arrives as nanos-since-epoch LongType,
    *     converted here to micros (truncation — Spark's native precision);
    *   - TIMESTAMP(MICROS) isAdjustedToUTC=true: already TimestampType;
    *   - TIMESTAMP(MICROS) without tz metadata: arrives TIMESTAMP_NTZ,
    *     cast to TimestampType — instant-exact because the session
    *     timezone is pinned UTC (Sessions.base).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val df = load(s, d, "events")
    df.schema("ts").dataType match {
      // integral division — `/` on longs goes through double, whose ulp at
      // ~1.7e18 ns is 256 ns (measured: 1,494/100k timestamps off by 1 µs)
      case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Cheap content stamp of one table's parquet under `dir` (file
    * names + sizes + mtimes, sorted): the memo key for per-corpus
    * offline artifacts (index/Bloom/stats caches), so a driver-side
    * testdata regeneration mid-session invalidates them instead of
    * serving a stale index against the new data — the oracle always
    * recomputes from the files on disk, so a path-keyed memo would
    * silently diverge.
    */
  def contentStamp(dir: String, name: String): String = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
      else Seq(f)
    val root = new java.io.File(s"$dir/$name.parquet")
    val parts =
      if (root.exists()) walk(root)
        .map(f => s"${f.getName}:${f.length()}:${f.lastModified()}").sorted
      else Seq("missing")
    s"$dir/$name.parquet|${parts.mkString(",")}"
  }
}

/** Per-corpus memo for offline artifacts (frozen indexes, Bloom
  * filters, history stats): callers key by the sf dir, but entries are
  * stored under [[Tables.contentStamp]] of the backing table, so a
  * driver-side regeneration of the parquet mid-session starts a fresh
  * entry instead of serving an index fitted to data that no longer
  * exists.
  */
final class CorpusMemo[V](table: String) {
  private val entries = scala.collection.concurrent.TrieMap.empty[String, V]
  def getOrElseUpdate(dir: String, v: => V): V =
    entries.getOrElseUpdate(Tables.contentStamp(dir, table), v)
}
