package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session for all suites (fork=true → one JVM). */
object SparkTestBase {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-tests")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-wh").toString)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

abstract class SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestBase.spark
  val Sf = "/root/testdata/sf0.001"

  /** Run `f` with session confs overridden, ALWAYS restored — the
    * session is shared across every suite, so a leaked conf would
    * silently poison later tests. */
  def withConfs[T](pairs: (String, String)*)(f: => T): T = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  /** Run `f` with janino fallback disabled: a whole-stage-codegen
    * compile error THROWS instead of silently dropping to interpreted
    * execution (the plan string still shows the starred span on
    * fallback, so only this catches a broken doConsume). */
  def withStrictCodegen[T](f: => T): T =
    withConfs("spark.sql.codegen.fallback" -> "false")(f)
}
