package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Structured Streaming over the events table (SURVEY §2.9 — extension
  * beyond the batch-only reference): tumbling-window aggregation with a
  * watermark for late data, plus the identical batch transform used for
  * both the DuckDB oracle demo (`stream_window`) and the
  * streaming-equals-batch parity test.
  *
  * Scale notes: the aggregation state is bounded by the watermark
  * horizon; partitioning follows the groupBy keys (event_type ×
  * window), and the same code runs `readStream` in production —
  * parquet-directory source here, Kafka/queue source on a cluster.
  */
object EventsStream {

  /** Shared transform: tumbling 1-hour counts + exact value sums per
    * event type. Works on a batch OR streaming DataFrame with (ts,
    * event_type, value).
    */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
           graft.ops.AggOps.exactSum(col("value")).as("sum_value"))
      .select(unix_timestamp(col("w.start")).as("window_start"),
              col("event_type"), col("cnt"), col("sum_value"))

  /** Batch demo form with deterministic ordering (the `stream_window`
    * queries entry).
    */
  def batchDemo(events: DataFrame): DataFrame =
    windowedCounts(events).orderBy("window_start", "event_type")

  /** Streaming form: watermarked source → windowed aggregation. The
    * caller supplies the streaming DataFrame (e.g. readStream.parquet).
    */
  def streamingCounts(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    windowedCounts(events.withWatermark("ts", watermark))

  /** Drive the streaming form synchronously over a parquet directory and
    * return the materialized result (used by tests and local parity
    * checks; `complete` output mode into a memory sink).
    */
  def runOnce(spark: SparkSession, parquetDir: String,
              queryName: String = "events_stream"): DataFrame = {
    val schema = spark.read.parquet(parquetDir).schema
    val stream = spark.readStream.schema(schema).parquet(parquetDir)
    // same nanos-as-long handling as Tables.events
    val tsFixed =
      if (schema("ts").dataType == LongType)
        stream.withColumn("ts",
          timestamp_micros(floor(col("ts") / 1000L).cast("long")))
      else stream
    val q = streamingCounts(tsFixed)
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(queryName)
  }
}
