package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import graft.streaming.EventsStream
import graft.tables.Tables

/** Streaming-shaped demo: the tumbling-window aggregation registered in
  * its batch form (identical transform feeds the Structured Streaming
  * path — parity asserted in StreamingSpec).
  */
object StreamingDemos {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "stream_window" -> ((s, dir) =>
      EventsStream.batchDemo(Tables.events(s, dir))),
    // Sessionization (batch form; stateful flatMapGroupsWithState parity
    // asserted in StreamingSpec).
    "sessionize" -> ((s, dir) =>
      EventsStream.sessionizeBatch(Tables.events(s, dir), 30)
        .orderBy("user_id", "session_start")),
    // Exactly-once dedup by event_id (batch form over a self-union, so
    // every id arrives twice and the dedup provably halves it; streaming
    // dropDuplicatesWithinWatermark parity asserted in StreamingSpec).
    "stream_dedup" -> ((s, dir) => {
      val e = Tables.events(s, dir)
      EventsStream.dedupedCounts(e.unionByName(e))
    }),
    // Stream-static enrichment join (batch form; per-micro-batch
    // broadcast parity asserted in StreamingSpec).
    "stream_enrich" -> ((s, dir) =>
      EventsStream.enrichedCounts(Tables.events(s, dir),
          Tables.customer(s, dir))
        .orderBy("c_mktsegment", "event_type")),
    // Stream-stream event-time interval join: purchases ⋈ same-user
    // views within the previous hour (batch form; two-watermarked-stream
    // parity asserted in StreamingSpec).
    "stream_stream_join" -> ((s, dir) => {
      val e = Tables.events(s, dir)
      EventsStream.attributionJoin(
          e.filter(col("event_type") === "view"),
          e.filter(col("event_type") === "purchase"))
        .orderBy("purchase_id", "view_id")
    }))

  val oracleSql: Map[String, String] = Map(
    "sessionize" ->
      """WITH l AS (SELECT user_id, ts, value,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts FROM events),
        |s AS (SELECT *, CASE WHEN prev_ts IS NULL
        |    OR floor(epoch(ts)) - floor(epoch(prev_ts)) > 1800 THEN 1 ELSE 0 END AS new_session FROM l),
        |c AS (SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS session_id FROM s)
        |SELECT user_id,
        |  CAST(floor(epoch(min(ts))) AS BIGINT) AS session_start,
        |  CAST(floor(epoch(max(ts))) AS BIGINT) AS session_end,
        |  count(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM c GROUP BY user_id, session_id
        |ORDER BY user_id, session_start""".stripMargin,
    "stream_window" ->
      """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS window_start,
        |  event_type, count(*) AS cnt,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY window_start, event_type
        |ORDER BY window_start, event_type""".stripMargin,
    // the self-union collapses back to the plain per-type aggregate
    "stream_dedup" ->
      """SELECT event_type, count(*) AS cnt,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "stream_enrich" ->
      """SELECT c_mktsegment, event_type, count(*) AS cnt,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY c_mktsegment, event_type
        |ORDER BY c_mktsegment, event_type""".stripMargin,
    // epoch_us on both sides of the condition: Spark compares at its
    // native µs precision (ts already ns→µs truncated), so the oracle
    // must too — raw TIMESTAMP_NS comparison could flip a boundary pair
    "stream_stream_join" ->
      """WITH v AS (SELECT user_id, event_id AS view_id, epoch_us(ts) AS v_us
        |           FROM events WHERE event_type = 'view'),
        |p AS (SELECT user_id, event_id AS purchase_id, epoch_us(ts) AS p_us
        |      FROM events WHERE event_type = 'purchase')
        |SELECT p.user_id, purchase_id, view_id, p_us - v_us AS lag_us
        |FROM p JOIN v ON p.user_id = v.user_id
        |  AND v_us <= p_us AND v_us >= p_us - 3600000000
        |ORDER BY purchase_id, view_id""".stripMargin)
}
