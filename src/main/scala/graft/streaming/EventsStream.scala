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

  /** Exactly-once event dedup by id, then per-type totals — the batch
    * form (plain dropDuplicates; the `stream_dedup` demo feeds it a
    * self-union so the dedup provably removes rows).
    */
  def dedupedCounts(events: DataFrame): DataFrame =
    events.dropDuplicates("event_id")
      .groupBy("event_type")
      .agg(count(lit(1)).as("cnt"),
           graft.ops.AggOps.exactSum(col("value")).as("sum_value"))
      .orderBy("event_type")

  /** Stream-static enrichment join — the canonical Structured Streaming
    * dimension-lookup pattern: the static side is re-planned (and
    * re-broadcast) each micro-batch, so dim updates are picked up
    * without restarting the query, and the stream side never shuffles
    * for the join. Works identically on a batch frame (the registered
    * demo form; streaming parity asserted in StreamingSpec).
    */
  def enrichedCounts(events: DataFrame, customers: DataFrame): DataFrame =
    events
      .join(broadcast(customers.select(col("c_custkey"),
                                       col("c_mktsegment"))),
            events("user_id") === col("c_custkey"))
      .groupBy("c_mktsegment", "event_type")
      .agg(count(lit(1)).as("cnt"),
           graft.ops.AggOps.exactSum(col("value")).as("sum_value"))

  /** Stream-stream event-time interval join — view→purchase attribution:
    * each purchase joins the same user's views in the preceding
    * `horizonMinutes`. The canonical two-stream join shape: with a
    * watermark on both sides plus this time-bound condition, Spark
    * derives a state watermark per side, so join state is reaped as
    * event time advances — bounded state, append-mode output. Identical
    * transform works on batch frames (the registered `stream_stream_join`
    * demo form; two-stream parity asserted in StreamingSpec).
    *
    * Timestamps compare at Spark's native microsecond precision; the
    * lag is emitted as epoch-micro longs (exact on both engines).
    */
  def attributionJoin(views: DataFrame, purchases: DataFrame,
                      horizonMinutes: Int = 60): DataFrame = {
    val v = views.select(col("user_id").as("v_user"),
      col("event_id").as("view_id"), col("ts").as("view_ts"))
    val p = purchases.select(col("user_id").as("p_user"),
      col("event_id").as("purchase_id"), col("ts").as("purchase_ts"))
    p.join(v,
        col("p_user") === col("v_user") &&
          col("view_ts") <= col("purchase_ts") &&
          col("view_ts") >= col("purchase_ts") -
            expr(s"INTERVAL $horizonMinutes MINUTES"))
      .select(col("p_user").as("user_id"), col("purchase_id"),
        col("view_id"),
        (unix_micros(col("purchase_ts")) - unix_micros(col("view_ts")))
          .as("lag_us"))
  }

  /** Streaming form over one event stream: watermark once, split by
    * type, self-join (Spark plans the two filtered branches as a
    * stream-stream join with per-side state watermarks).
    */
  def streamingAttribution(events: DataFrame, horizonMinutes: Int = 60,
                           watermark: String = "2 hours"): DataFrame = {
    val wm = events.withWatermark("ts", watermark)
    attributionJoin(wm.filter(col("event_type") === "view"),
      wm.filter(col("event_type") === "purchase"), horizonMinutes)
  }

  /** Streaming exactly-once dedup: `dropDuplicatesWithinWatermark` keys
    * state by event_id and reaps it once the watermark passes — bounded
    * state, and a duplicate arriving in a LATER micro-batch (within the
    * horizon) is still dropped. Parity with the batch form asserted in
    * StreamingSpec across micro-batches.
    */
  def streamingDeduped(events: DataFrame,
                       watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Custom-state sessionization (KeyValueGroupedDataset +
    * flatMapGroupsWithState): group events per user into sessions closed
    * by a `gapMinutes` inactivity timeout. Batch variant below shares the
    * session-assembly semantics for parity testing; the streaming variant
    * is the production shape (state bounded by the timeout).
    */
  final case class SessionEvent(user_id: Long, ts: java.sql.Timestamp,
                                value: Double)
  final case class UserSession(user_id: Long, session_start: Long,
                               session_end: Long, n_events: Long,
                               sum_value: Double)

  /** Batch sessionization via the classic lag/cumsum window pattern —
    * same output contract as the stateful streaming form.
    */
  def sessionizeBatch(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts")
    val gap = gapMinutes * 60L
    events
      .select(col("user_id"), col("ts"), col("value"))
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > gap, 1)
          .otherwise(0))
      .withColumn("session_id", sum(col("new_session")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_id")
      .agg(unix_timestamp(min(col("ts"))).as("session_start"),
           unix_timestamp(max(col("ts"))).as("session_end"),
           count(lit(1)).as("n_events"),
           graft.ops.AggOps.exactSum(col("value")).as("sum_value"))
      .select("user_id", "session_start", "session_end", "n_events",
              "sum_value")
  }

  /** Open-session state carried between micro-batches (seconds since
    * epoch; money tracked in cents so the fold is exact and matches the
    * batch variant's decimal-exact sum bit-for-bit).
    */
  final case class OpenSession(start: Long, end: Long, n: Long,
                               sumCents: Long)

  /** Custom-state sessionization via
    * `KeyValueGroupedDataset.flatMapGroupsWithState`: per user, events
    * more than `gapMinutes` apart open a new session.
    *
    * Two modes:
    *  - `finalFlush = true` (batch / parity testing): every key is
    *    invoked exactly once; the trailing open session is emitted
    *    eagerly and no state survives — batch output is complete.
    *  - `finalFlush = false` (the production streaming shape): the open
    *    session is CARRIED ACROSS MICRO-BATCHES in the group state
    *    (`state.update`) with an EVENT-TIME timeout at session end + gap
    *    — a session spanning micro-batches stays one session; it is
    *    emitted when a later event exceeds the gap or when the watermark
    *    passes the timeout with no new events. The caller must put a
    *    `withWatermark("ts", ...)` on the stream. State is bounded: one
    *    OpenSession per active user, reaped by the timeout.
    *    (Event-time, NOT processing-time, timeout: ProcessingTimeTimeout
    *    makes `shouldRunAnotherBatch` permanently true, so the stream
    *    livelocks running empty micro-batches back-to-back and
    *    `processAllAvailable()` never returns; event-time timeouts only
    *    re-trigger when the watermark actually advances.)
    */
  def sessionizeStateful(events: org.apache.spark.sql.Dataset[SessionEvent],
                         gapMinutes: Int = 30,
                         finalFlush: Boolean = true)
      : org.apache.spark.sql.Dataset[UserSession] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val gap = gapMinutes * 60L
    val timeoutConf =
      if (finalFlush) GroupStateTimeout.NoTimeout
      else GroupStateTimeout.EventTimeTimeout
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, UserSession](
        OutputMode.Append, timeoutConf) {
        (user, it, state) =>
          def toSession(s: OpenSession): UserSession =
            UserSession(user, s.start, s.end, s.n, s.sumCents / 100.0)
          if (state.hasTimedOut) {
            // gap elapsed with no new events → flush the open session
            val out = state.getOption.map(toSession)
            state.remove()
            out.iterator
          } else {
            val sorted = it.toSeq.sortBy(_.ts.getTime)
            val out = scala.collection.mutable.ArrayBuffer.empty[UserSession]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = java.lang.Math.floorDiv(e.ts.getTime, 1000L)
              val cents = math.round(e.value * 100)
              cur match {
                case Some(s) if t > s.end + gap =>
                  out += toSession(s)
                  cur = Some(OpenSession(t, t, 1, cents))
                case Some(s) if t >= s.start - gap =>
                  // in (or adjacent to) the open window; a late arrival
                  // from an earlier micro-batch may have t < s.end, so
                  // merge with min/max rather than assuming order
                  cur = Some(OpenSession(math.min(s.start, t),
                                         math.max(s.end, t),
                                         s.n + 1, s.sumCents + cents))
                case Some(_) =>
                  // straggler > gap BEFORE the open session: nothing it
                  // could merge with is still open — emit it as its own
                  // session, leave the open session untouched
                  out += UserSession(user, t, t, 1, cents / 100.0)
                case None =>
                  cur = Some(OpenSession(t, t, 1, cents))
              }
            }
            if (finalFlush) {
              cur.foreach(s => out += toSession(s))
              state.remove()
            } else {
              cur.foreach { s =>
                state.update(s)
                // flush when the watermark passes session end + gap;
                // clamp above the current watermark (a timeout at or
                // below it is rejected by Spark)
                state.setTimeoutTimestamp(
                  math.max((s.end + gap) * 1000L + 1L,
                           state.getCurrentWatermarkMs() + 1L))
              }
            }
            out.iterator
          }
      }
  }

  /** Drive the streaming form synchronously over a parquet directory and
    * return the materialized result (used by tests and local parity
    * checks; `complete` output mode into a memory sink).
    */
  def runOnce(spark: SparkSession, parquetDir: String,
              queryName: String = "events_stream"): DataFrame = {
    val schema = spark.read.parquet(parquetDir).schema
    val stream = spark.readStream.schema(schema).parquet(parquetDir)
    // same nanos-as-long handling as Tables.events (integral div — long
    // `/` routes through double and corrupts ns-scale values)
    val tsFixed =
      if (schema("ts").dataType == LongType)
        stream.withColumn("ts", timestamp_micros(expr("ts div 1000")))
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
