package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Streaming event-rate spike detection — the streaming face of the
  * `spike_detect` batch query, with the same integer-exact rule: an
  * hour spikes when `n · n_trail > 2 · sum_trail` against the trailing
  * ≤24 observed hours of its event type.
  *
  * State per key (event_type): OPEN hourly counts (hours the watermark
  * has not passed — late events still merge into them) plus the deque
  * of the last 24 FINALIZED (hour, count) pairs. An hour finalizes when
  * the event-time watermark passes its end; at that moment it is
  * compared against the deque, emitted if it spikes, then pushed (deque
  * trimmed to 24). State is bounded by 24 + open hours per key
  * regardless of stream length — the watermark reaps opens, the trim
  * reaps history.
  *
  * Event-time timeout (not processing-time, see sessionizeStateful's
  * note) lets an idle key finalize its open hours when other keys
  * advance the watermark.
  */
object SpikeStream {

  final case class TypedEvent(event_type: String, ts: java.sql.Timestamp)
  final case class Spike(event_type: String, hour: Long, n: Long,
                         sum_trail: Long, n_trail: Long)
  /** open: hour → count (not yet finalized); trail: most recent ≤24
    * finalized (hour, count), newest first; lastActiveMs: the event-time
    * watermark at the key's last activity (data seen or hour finalized)
    * — the anchor the lapse reap measures idleness from. Without it the
    * wake-to-finalize timeout is indistinguishable from the lapse
    * timeout, and a key going idle for one batch right after its hours
    * finalized would lose its trail immediately (the round-6 fix). */
  final case class SpikeState(open: Map[Long, Long],
                              trail: List[(Long, Long)],
                              lastActiveMs: Long = 0L)

  private val HourMs = 3600L * 1000L
  /** Event-time lapse after which an idle key's trail is reaped. */
  private val LapseMs = 7L * 24L * HourMs

  /** Batch-parity face of [[detectStateful]] on an (event_type, ts)
    * frame: the identical integer-exact rule over the trailing ≤24
    * observed hours — INCLUDING the lapse reap. A gap of more than
    * LapseMs between a key's consecutive observed hours starts a new
    * "epoch" (the batch rendering of the stream's idle-state removal),
    * and the trailing window never reaches across an epoch boundary,
    * exactly as a reaped key restarts trail-less. On gap-free keys
    * this coincides with the plain trailing-window form
    * (`spike_detect`); the epoch split is what makes it the STREAM's
    * semantics rather than the window's.
    *
    * Boundary note: the stream reaps on the event-time watermark
    * passing (last activity + LapseMs), so a key resuming within ±1
    * hour of the lapse boundary can differ between the two faces by
    * that hour; StreamingSpec's equivalence fixture keeps gaps away
    * from the boundary (real monitoring gaps are days, not minutes).
    *
    * Scale shape: one shuffle keyed by event_type for the hourly
    * count, then per-key windows (epoch id via running sum of gap
    * flags, trail over (event_type, epoch)) — no self-join, state
    * bounded by the 24-row frame.
    */
  def detectBatch(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byType = Window.partitionBy("event_type").orderBy("hour")
    val run = byType.rowsBetween(Window.unboundedPreceding,
                                 Window.currentRow)
    val trail = Window.partitionBy("event_type", "epoch").orderBy("hour")
      .rowsBetween(-24, -1)
    events
      .select(col("event_type"),
              // FLOOR division, exact in long arithmetic: `div` alone
              // truncates toward zero, so a pre-1970 timestamp would land
              // one hour later here than in detectStateful's
              // Math.floorDiv and the oracle's flooring `//`; subtracting
              // the positive remainder first makes truncation == floor
              expr("(unix_micros(ts) - pmod(unix_micros(ts), 3600000000))" +
                   " div 3600000000").as("hour"))
      .groupBy("event_type", "hour")
      .agg(count(lit(1)).as("n"))
      .withColumn("gap", col("hour") - lag(col("hour"), 1).over(byType))
      .withColumn("epoch",
        sum(when(col("gap").isNull || col("gap") > LapseMs / HourMs, 1L)
          .otherwise(0L)).over(run))
      .withColumn("sum_trail", coalesce(sum(col("n")).over(trail), lit(0L)))
      .withColumn("n_trail", count(col("n")).over(trail))
      .filter(col("n_trail") > 0 &&
              col("n") * col("n_trail") > col("sum_trail") * 2)
      .select(col("event_type"), col("hour"), col("n"),
              col("sum_trail"), col("n_trail"))
  }

  def detectStateful(events: Dataset[TypedEvent]): Dataset[Spike] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    events.groupByKey(_.event_type)
      .flatMapGroupsWithState[SpikeState, Spike](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key, it, state) =>
          val prev = state.getOption.getOrElse(SpikeState(Map.empty, Nil))
          val wm = state.getCurrentWatermarkMs()
          // merge this micro-batch's events into the open hours,
          // DROPPING events for hours the watermark already closed (the
          // standard late-data contract — without it a straggler would
          // re-open a judged hour and emit a duplicate, partial verdict)
          var sawData = false
          val open = it.foldLeft(prev.open) { (m, e) =>
            sawData = true
            val h = java.lang.Math.floorDiv(e.ts.getTime, HourMs)
            if ((h + 1) * HourMs <= wm) m
            else m.updated(h, m.getOrElse(h, 0L) + 1L)
          }
          // finalize closed hours in ascending order (cross-batch
          // determinism: each hour is judged exactly once, in sequence)
          val (closed, stillOpen) =
            open.partition { case (h, _) => (h + 1) * HourMs <= wm }
          var trail = prev.trail
          val out = scala.collection.mutable.ArrayBuffer.empty[Spike]
          closed.toSeq.sortBy(_._1).foreach { case (h, n) =>
            val nTrail = trail.size.toLong
            val sumTrail = trail.map(_._2).sum
            if (nTrail > 0 && n * nTrail > 2 * sumTrail)
              out += Spike(key, h, n, sumTrail, nTrail)
            trail = ((h, n) :: trail).take(24)
          }
          // activity anchor: advances to the current watermark whenever
          // the key saw data or finalized an hour; idleness is measured
          // from it, so a wake-to-finalize timeout can never masquerade
          // as a lapse
          val anchor =
            if (sawData || closed.nonEmpty) wm else prev.lastActiveMs
          if (stillOpen.isEmpty && trail.isEmpty) state.remove()
          else if (state.hasTimedOut && stillOpen.isEmpty &&
                   wm >= anchor + LapseMs)
            // lapse reap: a key whose hours all finalized and that saw
            // no events for LapseMs of event time drops its trail —
            // otherwise every event_type ever seen keeps a 24-entry
            // state forever and "bounded state" fails on churning key
            // domains. A key resuming after the lapse restarts with an
            // empty trail (its first hours are judged trail-less),
            // the documented deviation from the batch ROWS frame
            // (detectBatch renders it as the >168h epoch split).
            state.remove()
          else {
            state.update(SpikeState(stillOpen, trail, anchor))
            if (stillOpen.nonEmpty) {
              // wake when the earliest open hour can finalize, even if
              // this key receives no further events
              val earliestEnd = (stillOpen.keys.min + 1) * HourMs
              state.setTimeoutTimestamp(math.max(earliestEnd, wm + 1L))
            } else
              // wake at the lapse deadline (strictly ahead of wm: when
              // wm had already passed it we either reaped above or
              // re-anchored on activity)
              state.setTimeoutTimestamp(math.max(anchor + LapseMs, wm + 1L))
          }
          out.iterator
      }
  }
}
