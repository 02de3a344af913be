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
