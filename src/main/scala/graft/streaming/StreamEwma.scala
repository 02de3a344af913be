package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{
  OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming EXACT exponential smoothing — the recursive form
  * ewma' = α·x + (1−α)·ewma that batch SQL cannot express
  * declaratively (q_ewma, C70, ships the bounded-window
  * approximation whose dropped tail weighs (1−α)^w). Streaming is
  * where the recursion is natural: one double of ValueState per key,
  * each event folds in O(1), and only batch-touched keys do any work
  * — the telemetry-smoothing shape at 100 TB of history with GB-sized
  * increments.
  *
  * Emission: one row PER EVENT carrying its smoothed value (the
  * enriched stream a downstream sink appends), in (tsSec, eventId)
  * order within each key and batch.
  *
  * Ordering contract: same as [[StreamChangeEvents]] — in-batch rows
  * are sorted (tsSec, eventId); across batches the per-key stream
  * must arrive in order (append-log/CDC contract; a late event needs
  * the batch rebuild).
  */
object StreamEwma {

  case class Obs(userId: Long, tsSec: Long, eventId: Long, value: Double)

  case class Smoothed(user_id: Long, event_id: Long, ewma: Double)

  case class EwmaState(ewma: Double, initialized: Boolean)

  class EwmaProcessor(alpha: Double)
      extends StatefulProcessor[Long, Obs, Smoothed] {

    @transient private var st: ValueState[EwmaState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[EwmaState](
        "ewma", Encoders.product[EwmaState], TTLConfig.NONE)

    override def handleInputRows(
        key: Long,
        rows: Iterator[Obs],
        timerValues: TimerValues): Iterator[Smoothed] = {
      var s = if (st.exists) st.get else EwmaState(0.0, initialized = false)
      val out = rows.toSeq.sortBy(o => (o.tsSec, o.eventId)).map { o =>
        s =
          if (!s.initialized) EwmaState(o.value, initialized = true)
          else EwmaState(alpha * o.value + (1.0 - alpha) * s.ewma, true)
        Smoothed(key, o.eventId, s.ewma)
      }
      st.update(s)
      out.iterator
    }
  }

  def smooth(obs: Dataset[Obs], alpha: Double = 0.3): Dataset[Smoothed] = {
    implicit val outEnc = Encoders.product[Smoothed]
    implicit val keyEnc = Encoders.scalaLong
    obs
      .groupByKey(_.userId)
      .transformWithState(
        new EwmaProcessor(alpha),
        TimeMode.None(),
        OutputMode.Update())
  }
}
