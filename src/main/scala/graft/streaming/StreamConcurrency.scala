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
}
