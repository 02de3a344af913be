package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{
  ExpiredTimerInfo, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

import StreamSessionize.{ClosedSession, Exposure, OpenSession}

/** The gap sessionizer on Spark 4's arbitrary-state API
  * (`transformWithState` + `StatefulProcessor`) — same semantics as
  * [[StreamSessionize]] (flatMapGroupsWithState form), same
  * `OpenSession` state and gap rule, but with the API generation the
  * runtime is moving to: explicit named state (`ValueState`), explicit
  * event-time TIMERS instead of a single timeout slot, and RocksDB
  * state-store backing (required by the API; also the store that
  * scales past executor-heap state at 100 TB).
  *
  * Timer discipline: one live timer per key at
  * `(prevEnd + gap) * 1000`. A joinable event moves the deadline:
  * the old timer is deleted and a new one registered — unlike
  * flatMapGroupsWithState's implicit single timeout, stale timers
  * MUST be cleaned up by the processor or they fire spuriously.
  */
object StreamSessionizeV2 {

  class SessionProcessor(gapSeconds: Long, minSessionSeconds: Long)
      extends StatefulProcessor[String, Exposure, ClosedSession] {

    @transient private var open: ValueState[OpenSession] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      open = getHandle.getValueState[OpenSession](
        "open", Encoders.product[OpenSession], TTLConfig.NONE)

    private def deadlineMs(s: OpenSession): Long = (s.prevEnd + gapSeconds) * 1000L

    private def close(s: OpenSession): Option[ClosedSession] =
      if (s.totalDuration >= minSessionSeconds)
        Some(ClosedSession(s.key, s.sessionStart, s.sessionEnd, s.totalDuration, s.events))
      else None

    override def handleInputRows(
        key: String,
        rows: Iterator[Exposure],
        timerValues: TimerValues): Iterator[ClosedSession] = {
      val sorted = rows.toSeq.sortBy(e => (e.startTs, e.endTs))
      var cur = if (open.exists) Option(open.get) else None
      val prevDeadline = cur.map(deadlineMs)
      val closed = Seq.newBuilder[ClosedSession]
      sorted.foreach { e =>
        cur match {
          case Some(s) if e.startTs - s.prevEnd <= gapSeconds =>
            cur = Some(s.copy(
              sessionEnd = math.max(s.sessionEnd, e.endTs),
              prevEnd = e.endTs,
              totalDuration = s.totalDuration + e.duration,
              events = s.events + 1))
          case maybePrev =>
            maybePrev.flatMap(close).foreach(closed += _)
            cur = Some(OpenSession(key, e.startTs, e.endTs, e.endTs, e.duration, 1))
        }
      }
      cur.foreach { s =>
        open.update(s)
        if (!prevDeadline.contains(deadlineMs(s))) {
          prevDeadline.foreach(getHandle.deleteTimer)
          getHandle.registerTimer(deadlineMs(s))
        }
      }
      closed.result().iterator
    }

    override def handleExpiredTimer(
        key: String,
        timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[ClosedSession] =
      if (open.exists && deadlineMs(open.get) <= expiredTimerInfo.getExpiryTimeInMs) {
        val out = close(open.get)
        open.clear()
        out.iterator
      } else Iterator.empty // stale timer for an already-extended session
  }

  def sessions(
      exposures: Dataset[Exposure],
      gapSeconds: Long = 300L,
      minSessionSeconds: Long = 180L,
      watermarkDelay: String = "10 minutes"): Dataset[ClosedSession] = {
    implicit val closedEnc = Encoders.product[ClosedSession]
    implicit val keyEnc = Encoders.STRING
    exposures
      .withWatermark("eventTime", watermarkDelay)
      .groupByKey(_.key)
      .transformWithState(
        new SessionProcessor(gapSeconds, minSessionSeconds),
        TimeMode.EventTime(),
        OutputMode.Append())
  }
}
