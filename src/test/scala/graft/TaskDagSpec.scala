package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import graft.operators.TaskDag
import graft.operators.TaskDag.Task

class TaskDagSpec extends SparkTestBase {

  test("topological order respects AFTER dependencies") {
    val seen = scala.collection.mutable.ArrayBuffer.empty[String]
    def t(n: String, after: String*) = Task(n, after, _ => seen += n)
    val results = TaskDag.run(spark, Seq(
      t("d", "b", "c"), t("b", "a"), t("c", "a"), t("a")))
    assert(results.forall(_.ok))
    assert(seen.head == "a" && seen.last == "d")
    assert(seen.indexOf("b") > seen.indexOf("a") && seen.indexOf("c") > seen.indexOf("a"))
  }

  test("failure skips transitive dependents, independent branches run") {
    val seen = scala.collection.mutable.ArrayBuffer.empty[String]
    val results = TaskDag.run(spark, Seq(
      Task("a", run = _ => seen += "a"),
      Task("boom", Seq("a"), _ => throw new RuntimeException("x")),
      Task("child", Seq("boom"), _ => seen += "child"),
      Task("grandchild", Seq("child"), _ => seen += "grandchild"),
      Task("other", Seq("a"), _ => seen += "other"))).map(r => r.name -> r.ok).toMap
    assert(results("a") && results("other"))
    assert(!results("boom") && !results("child") && !results("grandchild"))
    assert(seen.toSet == Set("a", "other"))
  }

  test("cycles and unknown deps are rejected") {
    intercept[IllegalArgumentException] {
      TaskDag.order(Seq(Task("a", Seq("b"), _ => ()), Task("b", Seq("a"), _ => ())))
    }
    intercept[IllegalArgumentException] {
      TaskDag.order(Seq(Task("a", Seq("zzz"), _ => ())))
    }
  }

  test("policy: retries recover a flaky task within one run") {
    var calls = 0
    val (results, state) = TaskDag.runWithPolicy(spark, Seq(
      Task("flaky", run = { _ =>
        calls += 1
        if (calls < 3) throw new RuntimeException("transient")
      })), TaskDag.Policy(maxRetries = 2), TaskDag.DagState())
    assert(results.head.ok && results.head.attempts == 3)
    // success resets the consecutive-failure counter
    assert(state.consecutiveFailures.isEmpty && state.suspended.isEmpty)
  }

  test("policy: consecutive failed runs auto-suspend; resume clears") {
    val boom = Seq(Task("boom", run = _ => throw new RuntimeException("x")),
      Task("child", Seq("boom"), _ => ()))
    val policy = TaskDag.Policy(maxRetries = 1, suspendAfterFailures = 2)
    // run 1: fails (2 attempts), not yet suspended
    val (r1, s1) = TaskDag.runWithPolicy(spark, boom, policy, TaskDag.DagState())
    assert(!r1.head.ok && r1.head.attempts == 2)
    assert(s1.consecutiveFailures("boom") == 1 && !s1.suspended("boom"))
    // run 2: fails again -> suspended
    val (r2, s2) = TaskDag.runWithPolicy(spark, boom, policy, s1)
    assert(s2.suspended("boom"))
    assert(r2.map(r => r.name -> r.error).toMap.apply("child")
      == Some("skipped: upstream failed"))
    // run 3: suspended task is not attempted at all, dependents skip
    val (r3, s3) = TaskDag.runWithPolicy(spark, boom, policy, s2)
    val byName = r3.map(r => r.name -> r).toMap
    assert(byName("boom").attempts == 0 && byName("boom").error == Some("suspended"))
    assert(!byName("child").ok)
    assert(s3.suspended("boom"))
    // operator RESUME: fresh failure budget
    val resumed = s3.resume("boom")
    assert(!resumed.suspended("boom") && !resumed.consecutiveFailures.contains("boom"))
    val (_, s4) = TaskDag.runWithPolicy(spark, boom, policy, resumed)
    assert(s4.consecutiveFailures("boom") == 1 && !s4.suspended("boom"))
  }

  test("policy: suspension stops the task, not the schedule") {
    // a suspended branch must not block independent branches or ticks
    var others = 0
    val tasks = Seq(
      Task("boom", run = _ => throw new RuntimeException("x")),
      Task("other", run = _ => others += 1))
    val cron = graft.operators.Cron.parse("0 5 * * *")
    val policy = TaskDag.Policy(suspendAfterFailures = 1)
    val t0 = java.time.Instant.parse("2024-01-01T00:00:00Z")
    val t1 = java.time.Instant.parse("2024-01-01T06:00:00Z")
    val t2 = java.time.Instant.parse("2024-01-02T06:00:00Z")
    val Some((tick1, r1, s1)) =
      TaskDag.runScheduledWithPolicy(spark, tasks, cron, t0, t1, policy, TaskDag.DagState())
    assert(s1.suspended("boom") && r1.exists(r => r.name == "other" && r.ok))
    val Some((tick2, r2, s2)) =
      TaskDag.runScheduledWithPolicy(spark, tasks, cron, tick1, t2, policy, s1)
    assert(tick2.isAfter(tick1))
    assert(r2.map(r => r.name -> r.ok).toMap.apply("other") && others == 2)
    assert(s2.suspended("boom"))
  }

  test("show: SHOW TASKS projection over a suspended + healthy mix") {
    val tasks = Seq(
      Task("root", run = _ => ()),
      Task("boom", after = Seq("root"), run = _ => throw new RuntimeException("kaput")),
      Task("leaf", after = Seq("boom"), run = _ => ()))
    val policy = TaskDag.Policy(suspendAfterFailures = 1)
    val (results, state) =
      TaskDag.runWithPolicy(spark, tasks, policy, TaskDag.DagState())
    val df = TaskDag.show(spark, tasks, state,
      schedule = Some("USING CRON 0 5 * * * UTC"), lastResults = results)
    val rows = df.collect().map(r => r.getString(0) -> r).toMap
    assert(df.columns.toSeq == Seq("task", "schedule", "after", "state",
      "consecutive_failures", "last_ok", "last_error", "last_seconds"))
    // roots carry the cron; dependents run AFTER (Snowflake layout)
    assert(rows("root").getString(1) == "USING CRON 0 5 * * * UTC")
    assert(rows("boom").isNullAt(1) && rows("boom").getString(2) == "root")
    assert(rows("root").getString(3) == "started" &&
      rows("root").getBoolean(5) && rows("root").getInt(4) == 0)
    assert(rows("boom").getString(3) == "suspended" &&
      !rows("boom").getBoolean(5) && rows("boom").getInt(4) == 1 &&
      rows("boom").getString(6) == "kaput")
    assert(rows("leaf").getString(3) == "started" &&
      rows("leaf").getString(6) == "skipped: upstream failed")
  }

  test("policy: DagState round-trips through parquet (task_control pattern)") {
    val path = Files.createTempDirectory("dagstate").toString + "/state"
    assert(TaskDag.loadState(spark, path) == TaskDag.DagState(), "absent -> fresh")
    val s = TaskDag.DagState(Map("a" -> 2, "b" -> 1), Set("a"))
    TaskDag.saveState(spark, s, path)
    assert(TaskDag.loadState(spark, path) == s)
    // overwrite with the resumed state; load reflects it
    TaskDag.saveState(spark, s.resume("a"), path)
    assert(TaskDag.loadState(spark, path) == TaskDag.DagState(Map("b" -> 1), Set.empty))
  }

  test("dailyDag materializes the reference's table chain end-to-end") {
    val out = Files.createTempDirectory("dag").toString
    val results = TaskDag.run(spark, Pipeline.dailyDag(Sf, out))
    assert(results.forall(_.ok), results.filterNot(_.ok).toString)
    val sessions = spark.read.parquet(s"$out/viewing_sessions")
    assert(sessions.count() > 0)
    // the DAG's sessions must equal the one-shot pipeline's sessions
    val oneShot = Pipeline.sessions(spark, Sf)
    assert(sessions.count() == oneShot.count())
    assert(spark.read.parquet(s"$out/task_control").count() == 1)
  }
}
