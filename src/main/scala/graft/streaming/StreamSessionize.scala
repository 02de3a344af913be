package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of operators.Sessionize (reference:
  * etl-ddl-backfill.sql:119-186): the same gap rule — a new event more
  * than `gapSeconds` after the open session's end closes it — expressed
  * as per-key state over an unbounded stream instead of a window
  * function over a bounded partition.
  *
  * State is one open session per key (constant size); sessions close
  * either when a late-enough event arrives or when the event-time
  * watermark passes `end + gap` (timeout), so state cannot grow with
  * the stream. At cluster scale the stream is hash-partitioned by key
  * — the same partitioning the batch operator shuffles to, so batch
  * and streaming results are interchangeable (spec-tested parity).
  */
object StreamSessionize {

  /** eventTime mirrors startTs as a timestamp — the watermark column. */
  case class Exposure(
      key: String,
      startTs: Long,
      endTs: Long,
      duration: Long,
      eventTime: java.sql.Timestamp)

  object Exposure {
    def at(key: String, startTs: Long, endTs: Long, duration: Long): Exposure =
      Exposure(key, startTs, endTs, duration, new java.sql.Timestamp(startTs * 1000L))
  }

  /** `prevEnd` is the END of the last event in sort order — the batch
    * rule's LAG(exposure_end_ts) — which is NOT `sessionEnd` (the MAX
    * end) when events overlap: an early long event must not keep later
    * events mergeable forever. */
  case class OpenSession(
      key: String,
      sessionStart: Long,
      sessionEnd: Long,
      prevEnd: Long,
      totalDuration: Long,
      events: Long)

  case class ClosedSession(
      key: String,
      sessionStart: Long,
      sessionEnd: Long,
      totalDuration: Long,
      events: Long)

  /** Events for one key arrive (within a micro-batch) unordered — sort
    * by start ts, then fold with the gap rule. Emits sessions closed in
    * this batch; keeps at most one open session in state.
    *
    * `finalFlush` is set for batch execution, where this is invoked
    * exactly once per key with ALL of the key's events and timeouts
    * never fire: the trailing session is complete by construction, so
    * it is emitted instead of parked in state (which batch discards). */
  def updateKey(
      gapSeconds: Long,
      minSessionSeconds: Long,
      finalFlush: Boolean = false)(
      key: String,
      events: Iterator[Exposure],
      state: GroupState[OpenSession]): Iterator[ClosedSession] = {

    def close(s: OpenSession): Option[ClosedSession] =
      if (s.totalDuration >= minSessionSeconds)
        Some(ClosedSession(s.key, s.sessionStart, s.sessionEnd, s.totalDuration, s.events))
      else None

    if (events.isEmpty && state.hasTimedOut) {
      val out = state.getOption.flatMap(close)
      state.remove()
      return out.iterator
    }

    val sorted = events.toSeq.sortBy(e => (e.startTs, e.endTs))
    var open = state.getOption
    val closed = Seq.newBuilder[ClosedSession]
    sorted.foreach { e =>
      open match {
        case Some(s) if e.startTs - s.prevEnd <= gapSeconds =>
          open = Some(s.copy(
            sessionEnd = math.max(s.sessionEnd, e.endTs),
            prevEnd = e.endTs,
            totalDuration = s.totalDuration + e.duration,
            events = s.events + 1))
        case maybePrev =>
          maybePrev.flatMap(close).foreach(closed += _)
          open = Some(OpenSession(key, e.startTs, e.endTs, e.endTs, e.duration, 1))
      }
    }
    if (finalFlush) {
      open.flatMap(close).foreach(closed += _)
    } else open.foreach { s =>
      state.update(s)
      // Close via watermark once no joinable event can still arrive —
      // joinability is judged against prevEnd (the batch LAG rule).
      state.setTimeoutTimestamp((s.prevEnd + gapSeconds) * 1000L)
    }
    closed.result().iterator
  }

  def sessions(
      exposures: Dataset[Exposure],
      gapSeconds: Long = 300L,
      minSessionSeconds: Long = 180L,
      watermarkDelay: String = "10 minutes"): Dataset[ClosedSession] = {
    implicit val closedEnc = Encoders.product[ClosedSession]
    implicit val openEnc = Encoders.product[OpenSession]
    implicit val keyEnc = Encoders.STRING
    val streaming = exposures.isStreaming
    val src =
      if (streaming) exposures.withWatermark("eventTime", watermarkDelay)
      else exposures
    src
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        updateKey(gapSeconds, minSessionSeconds, finalFlush = !streaming))
  }
}
