package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.SparkSession

/** The reference's orchestration surface (etl-dag.sql): a DAG of named
  * tasks with AFTER dependencies, executed in topological order —
  * root kickoff → panel windows + raw events → weighted events →
  * viewing sessions → control-table watermark update.
  *
  * Snowflake runs these on a cron schedule (ingest-dag.sql:2-3
  * `schedule = 'using cron …'`); here the schedule is the caller's
  * concern and maps one-to-one onto any Spark-adjacent scheduler —
  * the cron expression becomes an Airflow DAG `schedule_interval`, a
  * Databricks Workflows job trigger, or a Structured Streaming
  * `Trigger.ProcessingTime`, each invoking [[run]] per tick — while
  * the DAG contributes ordering, cycle detection, and per-task
  * status. Tasks run sequentially in dependency order; Spark
  * parallelizes WITHIN each task, which is where the cluster's
  * resources belong — two concurrent actions would just split the
  * same executors.
  */
object TaskDag {

  final case class Task(
      name: String,
      after: Seq[String] = Seq.empty,
      run: SparkSession => Unit)

  final case class TaskResult(
      name: String, ok: Boolean, error: Option[String], seconds: Double,
      attempts: Int = 1)

  /** Snowflake tasks carry two failure knobs this DAG must mirror
    * (etl-dag.sql:3-5 creates tasks whose production form sets them):
    * `TASK_AUTO_RETRY_ATTEMPTS` — re-run a failed task up to N extra
    * times before declaring the run failed — and
    * `SUSPEND_TASK_AFTER_NUM_FAILURES` — after N CONSECUTIVE failed
    * runs the task auto-suspends and stays suspended (skipping its
    * dependents) until an operator resumes it, so a permanently broken
    * upstream stops burning warehouse credits every tick. */
  final case class Policy(
      maxRetries: Int = 0,
      suspendAfterFailures: Int = Int.MaxValue) {
    require(maxRetries >= 0, "maxRetries must be >= 0")
    require(suspendAfterFailures >= 1, "suspendAfterFailures must be >= 1")
  }

  /** Cross-run failure bookkeeping for [[Policy]]: persisted by the
    * caller between ticks exactly like the `lastRun` watermark of
    * [[runScheduled]] (the task_control pattern — at scale this is a
    * two-column parquet next to the control table). `resume` is the
    * operator's `ALTER TASK … RESUME`: clears suspension AND the
    * consecutive-failure count, so the task gets a fresh budget. */
  final case class DagState(
      consecutiveFailures: Map[String, Int] = Map.empty,
      suspended: Set[String] = Set.empty) {
    def resume(task: String): DagState =
      DagState(consecutiveFailures - task, suspended - task)
  }

  /** [[DagState]] persisted as the task-control pattern: one parquet
    * row per task carrying (consecutive_failures, suspended), written
    * through the staged-publish rename so a crash between runs never
    * leaves a torn state file. Load of an absent path is the fresh
    * state — first run needs no bootstrap step. */
  def saveState(spark: SparkSession, state: DagState, path: String): Unit = {
    import spark.implicits._
    val rows = (state.consecutiveFailures.keySet ++ state.suspended).toSeq.sorted
      .map(t => (t, state.consecutiveFailures.getOrElse(t, 0), state.suspended.contains(t)))
    val staged = graft.sources.LakeWriter.stagingPath(path)
    rows.toDF("task", "consecutive_failures", "suspended")
      .coalesce(1).write.mode("overwrite").parquet(staged)
    graft.sources.LakeWriter.publish(spark, staged, path)
  }

  def loadState(spark: SparkSession, path: String): DagState = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) DagState()
    else {
      val rows = spark.read.parquet(path)
        .select("task", "consecutive_failures", "suspended").collect()
      DagState(
        rows.map(r => r.getString(0) -> r.getInt(1)).toMap.filter(_._2 > 0),
        rows.filter(_.getBoolean(2)).map(_.getString(0)).toSet)
    }
  }

  /** Kahn's topological sort; rejects cycles and unknown deps. */
  def order(tasks: Seq[Task]): Seq[Task] = {
    val byName = tasks.map(t => t.name -> t).toMap
    require(byName.size == tasks.size, "duplicate task names")
    tasks.flatMap(_.after).foreach { d =>
      require(byName.contains(d), s"unknown dependency: $d")
    }
    val indeg = mutable.Map(tasks.map(t => t.name -> t.after.size): _*)
    val dependents = tasks
      .flatMap(t => t.after.map(_ -> t.name))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val queue = mutable.Queue(tasks.filter(_.after.isEmpty).map(_.name).sorted: _*)
    val out = mutable.ArrayBuffer.empty[Task]
    while (queue.nonEmpty) {
      val n = queue.dequeue()
      out += byName(n)
      dependents.getOrElse(n, Seq.empty).sorted.foreach { m =>
        indeg(m) -= 1
        if (indeg(m) == 0) queue.enqueue(m)
      }
    }
    require(out.size == tasks.size, "cycle in task graph")
    out.toSeq
  }

  /** Schedule-driven execution (reference: etl-dag.sql:3 `SCHEDULE =
    * 'USING CRON 0 5 * * * UTC'` on the root task): runs the graph
    * when — and only when — a cron tick came due in `(lastRun, now]`,
    * with Snowflake's coalescing semantics: ticks missed while a run
    * was in flight (or the graph suspended) fire ONCE at the latest
    * due tick, never queue N-deep. Returns the fired tick + results,
    * or None when nothing is due; callers persist the returned tick
    * as the next `lastRun` (the task_control pattern applied to the
    * scheduler itself). */
  def runScheduled(spark: SparkSession, tasks: Seq[Task], cron: Cron,
      lastRun: java.time.Instant, now: java.time.Instant)
      : Option[(java.time.Instant, Seq[TaskResult])] =
    cron.ticksBetween(lastRun, now).lastOption.map(tick => tick -> run(spark, tasks))

  /** Runs in dependency order; a failed task skips its transitive
    * dependents (matching Snowflake task-graph semantics) but
    * independent branches continue. */
  def run(spark: SparkSession, tasks: Seq[Task]): Seq[TaskResult] =
    runWithPolicy(spark, tasks, Policy(), DagState())._1

  /** [[run]] under a failure [[Policy]], threading [[DagState]]
    * across invocations. Per task: suspended → not attempted (its
    * dependents skip, like any failure); otherwise attempted up to
    * `1 + maxRetries` times within THIS run (Snowflake's
    * TASK_AUTO_RETRY_ATTEMPTS retries the graph; per-task is the
    * strictly-finer grain — an idempotent task re-runs alone instead
    * of re-running the whole day). A run that still fails bumps the
    * task's consecutive-failure count and, at `suspendAfterFailures`,
    * suspends it; success resets the count. Skipped dependents don't
    * touch counts — they weren't attempted, and charging them would
    * suspend the whole downstream graph for one broken root. */
  def runWithPolicy(spark: SparkSession, tasks: Seq[Task], policy: Policy,
      state: DagState): (Seq[TaskResult], DagState) = {
    val failed = mutable.Set.empty[String]
    val counts = mutable.Map(state.consecutiveFailures.toSeq: _*)
    val suspended = mutable.Set(state.suspended.toSeq: _*)
    val results = order(tasks).map { t =>
      if (suspended.contains(t.name)) {
        failed += t.name
        TaskResult(t.name, ok = false, Some("suspended"), 0.0, attempts = 0)
      } else if (t.after.exists(failed.contains)) {
        failed += t.name
        TaskResult(t.name, ok = false, Some("skipped: upstream failed"), 0.0, attempts = 0)
      } else {
        val t0 = System.nanoTime()
        var attempt = 0
        var outcome: Option[String] = None
        var done = false
        while (!done) {
          attempt += 1
          try { t.run(spark); outcome = None; done = true }
          catch {
            case e: Throwable =>
              outcome = Some(e.getMessage)
              done = attempt > policy.maxRetries
          }
        }
        val secs = (System.nanoTime() - t0) / 1e9
        if (outcome.isEmpty) {
          counts -= t.name
          TaskResult(t.name, ok = true, None, secs, attempt)
        } else {
          failed += t.name
          val n = counts.getOrElse(t.name, 0) + 1
          counts(t.name) = n
          if (n >= policy.suspendAfterFailures) suspended += t.name
          TaskResult(t.name, ok = false, outcome, secs, attempt)
        }
      }
    }
    (results, DagState(counts.toMap, suspended.toSet))
  }

  /** `SHOW TASKS IN SCHEMA` (etl-dag.sql:157) as a projection over the
    * graph + [[DagState]] + the last run's results: one row per task
    * with its dependency edge, schedule (roots only — dependents run
    * AFTER, exactly Snowflake's layout), suspension state, the
    * consecutive-failure count the [[Policy]] acts on, and the last
    * run's outcome. Control-plane sized (|tasks| rows), built on the
    * driver like the state it reads. */
  def show(spark: SparkSession, tasks: Seq[Task], state: DagState,
      schedule: Option[String] = None,
      lastResults: Seq[TaskResult] = Seq.empty): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val byName = lastResults.map(r => r.name -> r).toMap
    order(tasks).map { t =>
      val last = byName.get(t.name)
      (t.name,
        if (t.after.isEmpty) schedule else None,
        t.after.mkString(","),
        if (state.suspended.contains(t.name)) "suspended" else "started",
        state.consecutiveFailures.getOrElse(t.name, 0),
        last.map(_.ok),
        last.flatMap(_.error),
        last.map(_.seconds))
    }.toDF("task", "schedule", "after", "state", "consecutive_failures",
      "last_ok", "last_error", "last_seconds")
  }

  /** [[runScheduled]] under a [[Policy]]: ticks that come due while a
    * task is suspended still fire the graph (independent branches keep
    * running — Snowflake suspends the TASK, not the schedule), and the
    * returned [[DagState]] is what the caller persists alongside the
    * fired tick. */
  def runScheduledWithPolicy(spark: SparkSession, tasks: Seq[Task], cron: Cron,
      lastRun: java.time.Instant, now: java.time.Instant,
      policy: Policy, state: DagState)
      : Option[(java.time.Instant, Seq[TaskResult], DagState)] =
    cron.ticksBetween(lastRun, now).lastOption.map { tick =>
      val (results, next) = runWithPolicy(spark, tasks, policy, state)
      (tick, results, next)
    }
}
