package graft.streaming

import org.apache.spark.sql.Dataset

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
    * finalized (hour, count), newest first. */
  final case class SpikeState(open: Map[Long, Long],
                              trail: List[(Long, Long)])

  private val HourMs = 3600L * 1000L
  /** Event-time lapse after which an idle key's trail is reaped. */
  private val LapseMs = 7L * 24L * HourMs

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
          val open = it.foldLeft(prev.open) { (m, e) =>
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
          if (stillOpen.isEmpty && trail.isEmpty) state.remove()
          else if (state.hasTimedOut && stillOpen.isEmpty)
            // lapse reap: a key whose hours all finalized and that saw
            // no events for LapseMs of event time drops its trail —
            // otherwise every event_type ever seen keeps a 24-entry
            // state forever and "bounded state" fails on churning key
            // domains. A key resuming after the lapse restarts with an
            // empty trail (its first hours are judged trail-less),
            // the documented deviation from the batch ROWS frame.
            state.remove()
          else {
            state.update(SpikeState(stillOpen, trail))
            if (stillOpen.nonEmpty) {
              // wake when the earliest open hour can finalize, even if
              // this key receives no further events
              val earliestEnd = (stillOpen.keys.min + 1) * HourMs
              state.setTimeoutTimestamp(math.max(earliestEnd, wm + 1L))
            } else
              state.setTimeoutTimestamp(wm + LapseMs)
          }
          out.iterator
      }
  }
}
