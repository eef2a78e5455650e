package graft

import graft.streaming.EventsStream
import graft.tables.Tables

/** Structured Streaming parity: the windowed aggregation over the events
  * table must produce identical results through the streaming path
  * (memory sink, processAllAvailable) and the batch path.
  */
class StreamingSpec extends SparkTestBase {

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
