package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{
  OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming twin of q_change_events (QueriesFns C65): per-user
  * running counters — event-type switches (LAG IS DISTINCT FROM),
  * high-value events, total events — kept in `transformWithState`
  * ValueState instead of an unbounded window sort. The batch form
  * re-sorts every user's whole history per run; the streaming form
  * carries ONE tiny struct per user and touches only the keys present
  * in each micro-batch — the shape that still works when the history
  * is 100 TB and the increment is a few GB (mirrors the reference's
  * incremental-MERGE discipline, etl-dag.sql watermark stages).
  *
  * Semantics pinned by StreamingSpec against the batch query: switch
  * counting is null-safe-DISTINCT — "no previous event" behaves like
  * a NULL previous type, exactly as LAG yields NULL on the first row
  * (so a first event with a non-null type counts one switch, and a
  * null-type first event does not).
  *
  * Ordering contract: rows are sorted (ts, event_id) WITHIN a batch;
  * across batches the per-key stream must arrive in order (the usual
  * CDC/append-log contract — a late event would need the batch
  * rebuild, which is what q_change_events itself is for).
  *
  * Emission: Update mode, one current-counters row per touched key
  * per micro-batch; downstream MERGEs it into a serving table the
  * same way q_incremental_merge lands watermark increments.
  */
object StreamChangeEvents {

  case class ChangeEvent(
      userId: Long, tsSec: Long, eventId: Long, eventType: String, value: Double)

  case class ChangeCounts(
      user_id: Long, n_switches: Long, n_high_value: Long, n_events: Long)

  /** lastType is nullable — "no previous event" and "previous type
    * was NULL" intentionally share the null encoding, because LAG's
    * first-row NULL makes them indistinguishable to the batch form's
    * IS DISTINCT FROM too. */
  case class CounterState(
      lastType: String,
      nSwitches: Long, nHighValue: Long, nEvents: Long)

  class ChangeProcessor(highValue: Double)
      extends StatefulProcessor[Long, ChangeEvent, ChangeCounts] {

    @transient private var st: ValueState[CounterState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[CounterState](
        "counts", Encoders.product[CounterState], TTLConfig.NONE)

    // NULL-safe IS DISTINCT FROM: (null,null) is NOT a switch — and
    // "no previous" IS a null previous, matching LAG's first-row NULL
    private def distinct(a: String, b: String): Boolean =
      if (a == null || b == null) !(a == null && b == null) else a != b

    override def handleInputRows(
        key: Long,
        rows: Iterator[ChangeEvent],
        timerValues: TimerValues): Iterator[ChangeCounts] = {
      var s = if (st.exists) st.get else CounterState(null, 0L, 0L, 0L)
      rows.toSeq.sortBy(e => (e.tsSec, e.eventId)).foreach { e =>
        s = CounterState(
          e.eventType,
          s.nSwitches + (if (distinct(s.lastType, e.eventType)) 1L else 0L),
          s.nHighValue + (if (e.value > highValue) 1L else 0L),
          s.nEvents + 1L)
      }
      st.update(s)
      Iterator.single(ChangeCounts(key, s.nSwitches, s.nHighValue, s.nEvents))
    }
  }

  def counts(
      events: Dataset[ChangeEvent],
      highValue: Double = 50.0): Dataset[ChangeCounts] = {
    implicit val outEnc = Encoders.product[ChangeCounts]
    implicit val keyEnc = Encoders.scalaLong
    events
      .groupByKey(_.userId)
      .transformWithState(
        new ChangeProcessor(highValue),
        TimeMode.None(),
        OutputMode.Update())
  }
}
