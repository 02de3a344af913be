package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{
  ExpiredTimerInfo, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming form of the C113 binge-run row (q_binge_sessions,
  * QueriesTv.scala): per (viewer, title), program exposures ordered by
  * start form a RUN that breaks when the gap from the previous
  * exposure's END exceeds the binge gap (4 h); runs of ≥ `minViews`
  * exposures are reported with span and total duration. Same
  * `transformWithState` + event-time-timer discipline as
  * [[StreamSessionizeV2]] (H1's gap sessionizer — reference
  * semantics etl-ddl-backfill.sql:119-186 at binge granularity), with
  * two deltas that mirror the batch row exactly:
  *
  *  - the state carries `runIdx`, the per-key count of runs STARTED,
  *    so emitted binge_ids equal the batch cumsum-of-breaks run_id
  *    (short runs consume an id without emitting — batch numbering
  *    has the same holes);
  *  - the state tracks `prevEnd` (last exposure's end — the LAG the
  *    gap compares against) and `maxEnd` (the run's max end — what
  *    the batch MAX aggregate reports) separately: an exposure that
  *    outlasts its successors must not shrink the reported span.
  *
  * Scale shape: state is one small fixed-size row per OPEN
  * (viewer, title) run in RocksDB, timers close runs as the watermark
  * passes prevEnd + gap, and output is append-only — the same
  * economics as H1, keyed twice as finely.
  *
  * ORDERING CONTRACT (the H13/H17/H19 CDC-append discipline, shared
  * with [[StreamSessionize]]): exposures may arrive in any order
  * WITHIN a micro-batch (each batch is sorted into the batch row's
  * (start, end, event_id) total order before folding), but must be
  * non-decreasing in start time per (viewer, title) ACROSS
  * micro-batches. A watermark-legal straggler that starts BEFORE the
  * run's current prevEnd folds in at arrival position — batch SQL
  * would have sorted it into place and taken its LAG there — so gap
  * decisions downstream of it can diverge from the C113 row (e.g.
  * prevEnd moving backwards re-opens break distances batch would
  * have closed). Per-key ordered delivery (the Kafka partition-key
  * guarantee) satisfies the contract; without it, widen the
  * watermark and sessionize in batch instead. */
object StreamBinge {

  /** One program exposure; eventTime = start (the watermark column). */
  case class BingeExposure(smbaId: String, title: String, eventId: Long,
      startTs: Long, endTs: Long, duration: Long,
      eventTime: java.sql.Timestamp)
  object BingeExposure {
    def at(smbaId: String, title: String, eventId: Long,
        startTs: Long, endTs: Long, duration: Long): BingeExposure =
      BingeExposure(smbaId, title, eventId, startTs, endTs, duration,
        new java.sql.Timestamp(startTs * 1000L))
  }

  /** Open-run state. `runIdx` = batch run_id of THIS run. */
  case class OpenRun(runIdx: Long, start: Long, maxEnd: Long,
      prevEnd: Long, dur: Long, n: Long)

  /** Column names match the batch row so parity compares directly. */
  case class BingeRun(smba_id: String, title: String, binge_id: Long,
      n_views: Long, binge_start_ts: Long, binge_end_ts: Long,
      total_duration: Long)

  class BingeProcessor(gapSeconds: Long, minViews: Long)
      extends StatefulProcessor[(String, String), BingeExposure, BingeRun] {

    @transient private var open: ValueState[OpenRun] = _
    // run counter surviving timer closes, so binge_ids keep matching
    // the batch cumsum-of-breaks numbering across runs of silence
    // (one long per key; a production deploy bounds it with a TTL
    // matched to its id-comparability retention window)
    @transient private var lastIdx: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      open = getHandle.getValueState[OpenRun](
        "open", Encoders.product[OpenRun], TTLConfig.NONE)
      lastIdx = getHandle.getValueState[Long](
        "last_idx", Encoders.scalaLong, TTLConfig.NONE)
    }

    private def deadlineMs(s: OpenRun): Long = (s.prevEnd + gapSeconds) * 1000L

    private def close(key: (String, String), s: OpenRun): Option[BingeRun] =
      if (s.n >= minViews)
        Some(BingeRun(key._1, key._2, s.runIdx, s.n, s.start, s.maxEnd, s.dur))
      else None

    override def handleInputRows(
        key: (String, String),
        rows: Iterator[BingeExposure],
        timerValues: TimerValues): Iterator[BingeRun] = {
      // the batch window's total order within the key
      val sorted = rows.toSeq.sortBy(e => (e.startTs, e.endTs, e.eventId))
      var cur = if (open.exists) Option(open.get) else None
      val prevDeadline = cur.map(deadlineMs)
      val closed = Seq.newBuilder[BingeRun]
      sorted.foreach { e =>
        cur match {
          case Some(s) if e.startTs - s.prevEnd <= gapSeconds =>
            cur = Some(s.copy(
              maxEnd = math.max(s.maxEnd, e.endTs),
              prevEnd = e.endTs,
              dur = s.dur + e.duration,
              n = s.n + 1))
          case maybePrev =>
            maybePrev.foreach { s => close(key, s).foreach(closed += _) }
            val idx = maybePrev.map(_.runIdx)
              .getOrElse(if (lastIdx.exists) lastIdx.get else 0L) + 1
            lastIdx.update(idx)
            cur = Some(OpenRun(idx, e.startTs, e.endTs, e.endTs, e.duration, 1))
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
        key: (String, String),
        timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[BingeRun] =
      if (open.exists && deadlineMs(open.get) <= expiredTimerInfo.getExpiryTimeInMs) {
        val out = close(key, open.get)
        open.clear() // lastIdx survives, so the next run keeps the
        // batch-matching numbering
        out.iterator
      } else Iterator.empty // stale timer for an already-extended run
  }

  def runs(
      exposures: Dataset[BingeExposure],
      gapSeconds: Long = 14400L,
      minViews: Long = 3L,
      watermarkDelay: String = "10 minutes"): Dataset[BingeRun] = {
    implicit val outEnc = Encoders.product[BingeRun]
    implicit val keyEnc = Encoders.product[(String, String)]
    exposures
      .withWatermark("eventTime", watermarkDelay)
      .groupByKey(e => (e.smbaId, e.title))
      .transformWithState(
        new BingeProcessor(gapSeconds, minViews),
        TimeMode.EventTime(),
        OutputMode.Append())
  }
}
