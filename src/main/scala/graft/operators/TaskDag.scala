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

  final case class TaskResult(name: String, ok: Boolean, error: Option[String], seconds: Double)

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
  def run(spark: SparkSession, tasks: Seq[Task]): Seq[TaskResult] = {
    val failed = mutable.Set.empty[String]
    order(tasks).map { t =>
      if (t.after.exists(failed.contains)) {
        failed += t.name
        TaskResult(t.name, ok = false, Some("skipped: upstream failed"), 0.0)
      } else {
        val t0 = System.nanoTime()
        try {
          t.run(spark)
          TaskResult(t.name, ok = true, None, (System.nanoTime() - t0) / 1e9)
        } catch {
          case e: Throwable =>
            failed += t.name
            TaskResult(t.name, ok = false, Some(e.getMessage), (System.nanoTime() - t0) / 1e9)
        }
      }
    }
  }
}
