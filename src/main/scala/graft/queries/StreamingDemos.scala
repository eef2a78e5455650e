package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
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
      EventsStream.batchDemo(Tables.events(s, dir))))

  val oracleSql: Map[String, String] = Map(
    "stream_window" ->
      """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS window_start,
        |  event_type, count(*) AS cnt,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY window_start, event_type
        |ORDER BY window_start, event_type""".stripMargin)
}
