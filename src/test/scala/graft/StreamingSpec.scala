package graft

import graft.streaming.EventsStream
import graft.tables.Tables

/** Structured Streaming parity: the windowed aggregation over the events
  * table must produce identical results through the streaming path
  * (memory sink, processAllAvailable) and the batch path.
  */
class StreamingSpec extends SparkTestBase {

  test("stateful sessionization == batch window sessionization") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    val typed = events
      .select(col("user_id"), col("ts"), col("value"))
      .as[EventsStream.SessionEvent]
    val stateful = EventsStream.sessionizeStateful(typed, 30)
      .collect()
      .map(s => (s.user_id, s.session_start, s.session_end, s.n_events,
                 s.sum_value))
      .toSet
    val batch = EventsStream.sessionizeBatch(events, 30)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getDouble(4)))
      .toSet
    assert(stateful == batch)
    assert(batch.nonEmpty)
  }

  test("streaming windowed counts == batch windowed counts") {
    val batchEvents = Tables.events(spark, "/root/testdata/sf0.001")
    val tmp = java.nio.file.Files.createTempDirectory("graft-stream").toString
    batchEvents.write.mode("overwrite").parquet(s"$tmp/events")

    val streamed = EventsStream.runOnce(spark, s"$tmp/events")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val batch = EventsStream.batchDemo(batchEvents)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }
}
