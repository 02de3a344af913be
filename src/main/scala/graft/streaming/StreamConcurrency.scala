package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{
  OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming twin of q_peak_concurrency (C105): the sweep-line
  * concurrency counter as `transformWithState` — state per content is
  * TWO longs (current level, running peak), each micro-batch folds its
  * ±1 deltas in (tsSec, delta) order on top of them. The batch form
  * re-runs the whole curve per day; this form answers "current and
  * peak concurrent viewers" continuously with O(1) state and
  * only-touched-keys work — the live-ops readout (capacity alerts,
  * "peak viewers right now" tickers).
  *
  * Ordering contract (the H13/H17 CDC-append discipline): rows sort
  * (tsSec, delta) within a batch — delta ASC processes interval ENDS
  * before STARTS at the same instant, the half-open convention the
  * batch row pins — and the per-key stream arrives in event-time
  * order across batches. Building deltas from an interval log means
  * emitting each −1 at its END time: in-order for a sorted backfill
  * feed; a live feed needs watermark-timer buffering (the documented
  * trade — the batch row is the replay/backfill path).
  *
  * Emission: Update mode, one (current, peak) row per touched key per
  * micro-batch. The peak is monotone; `current` is the live level.
  */
object StreamConcurrency {

  case class Delta(contentId: String, tsSec: Long, delta: Long)

  case class Concurrency(content_id: String, current: Long, peak: Long)

  case class CState(current: Long, peak: Long)

  class ConcurrencyProcessor
      extends StatefulProcessor[String, Delta, Concurrency] {

    @transient private var st: ValueState[CState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[CState](
        "conc", Encoders.product[CState], TTLConfig.NONE)

    override def handleInputRows(
        key: String,
        rows: Iterator[Delta],
        timerValues: TimerValues): Iterator[Concurrency] = {
      var s = if (st.exists) st.get else CState(0L, 0L)
      rows.toSeq.sortBy(d => (d.tsSec, d.delta)).foreach { d =>
        val cur = s.current + d.delta
        s = CState(cur, math.max(s.peak, cur))
      }
      st.update(s)
      Iterator.single(Concurrency(key, s.current, s.peak))
    }
  }

  def peaks(deltas: Dataset[Delta]): Dataset[Concurrency] = {
    implicit val outEnc = Encoders.product[Concurrency]
    implicit val keyEnc = Encoders.STRING
    deltas
      .groupByKey(_.contentId)
      .transformWithState(
        new ConcurrencyProcessor, TimeMode.None(), OutputMode.Update())
  }

  // ------------------------------------------------------------------
  // Interval-input form: event-time TIMERS close the ordering trade —
  // a live feed delivers each interval ONCE (at its start), and the
  // −1 must take effect at the interval's END, which may be several
  // micro-batches later and interleaved with out-of-order starts.
  // ------------------------------------------------------------------

  /** One viewing interval [startSec, endSec); `eventTime` (= start)
    * carries the watermark. */
  case class Interval(
      contentId: String, eventTime: java.sql.Timestamp,
      startSec: Long, endSec: Long)

  /** +1s and −1s buffered at one instant, awaiting the watermark. */
  case class Pending(plus: Long, minus: Long)

  /** Concurrency level/peak AS OF a watermark-passed instant. */
  case class TimedConcurrency(
      content_id: String, as_of_sec: Long, current: Long, peak: Long)

  /** Buffers every delta in MapState keyed by its instant and folds
    * strictly in event-time order when timers fire — so arrival order
    * (across batches, within the watermark) no longer matters: the
    * curve is replayed exactly as q_peak_concurrency's batch sweep
    * orders it, −1 before +1 at equal instants (half-open). One live
    * timer per pending instant; a stale fire (its instant already
    * folded by a later timer that came first) emits nothing. */
  class IntervalProcessor
      extends StatefulProcessor[String, Interval, TimedConcurrency] {

    @transient private var st: ValueState[CState] = _
    @transient private var pend: org.apache.spark.sql.streaming.MapState[Long, Pending] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      st = getHandle.getValueState[CState](
        "conc", Encoders.product[CState], TTLConfig.NONE)
      pend = getHandle.getMapState[Long, Pending](
        "pending", Encoders.scalaLong, Encoders.product[Pending], TTLConfig.NONE)
    }

    private def bump(tsSec: Long, dPlus: Long, dMinus: Long): Unit = {
      val cur = if (pend.containsKey(tsSec)) pend.getValue(tsSec) else Pending(0L, 0L)
      pend.updateValue(tsSec, Pending(cur.plus + dPlus, cur.minus + dMinus))
      getHandle.registerTimer(tsSec * 1000L)
    }

    override def handleInputRows(
        key: String,
        rows: Iterator[Interval],
        timerValues: TimerValues): Iterator[TimedConcurrency] = {
      rows.foreach { iv =>
        if (iv.endSec > iv.startSec) {
          bump(iv.startSec, 1L, 0L)
          bump(iv.endSec, 0L, 1L)
        }
      }
      Iterator.empty // emission happens at watermark time, not arrival
    }

    override def handleExpiredTimer(
        key: String,
        timerValues: TimerValues,
        expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo)
        : Iterator[TimedConcurrency] = {
      val upTo = expiredTimerInfo.getExpiryTimeInMs / 1000L
      val due = pend.keys().filter(_ <= upTo).toSeq.sorted
      if (due.isEmpty) Iterator.empty
      else {
        var s = if (st.exists) st.get else CState(0L, 0L)
        due.foreach { ts =>
          val p = pend.getValue(ts)
          val dipped = s.current - p.minus // ends first: half-open
          val cur = dipped + p.plus
          s = CState(cur, math.max(s.peak, cur))
          pend.removeKey(ts)
        }
        st.update(s)
        Iterator.single(TimedConcurrency(key, due.last, s.current, s.peak))
      }
    }
  }

  def peaksFromIntervals(
      intervals: Dataset[Interval],
      watermarkDelay: String = "10 minutes"): Dataset[TimedConcurrency] = {
    implicit val outEnc = Encoders.product[TimedConcurrency]
    implicit val keyEnc = Encoders.STRING
    intervals
      .withWatermark("eventTime", watermarkDelay)
      .groupByKey(_.contentId)
      .transformWithState(
        new IntervalProcessor, TimeMode.EventTime(), OutputMode.Append())
  }
}
