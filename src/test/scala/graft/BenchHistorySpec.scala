package graft

/** The committed bench record (bench/history.jsonl). The stdout
  * contract stays bounded (the driver tail-parses it); the side file
  * carries the FULL per-query map so a cross-round total swing is
  * attributable to named queries — and divisible by calib to separate
  * VM drift from a real plan regression. */
class BenchHistorySpec extends SparkTestBase {

  private val results = Seq(
    ("q_b", Some(1.23456), 2),
    ("q_a", Some(0.5), 2),
    ("q_fail", None, 2))

  test("line: one JSON object, sorted query keys, null for failures") {
    val line = BenchHistory.line("/root/testdata/sf0.1", 0.4, 0.6, 1.73456, results)
    assert(!line.contains("\n"), "one run = one jsonl line")
    assert(line.indexOf("\"q_a\"") < line.indexOf("\"q_b\""),
      "sorted keys so consecutive runs diff cleanly")
    assert(line.contains(""""q_fail":{"sec":null,"passes":2}"""))
    assert(line.contains(""""calib_mean":0.5000"""))
    assert(line.contains(""""calib_sec":[0.4000,0.6000]"""))
    assert(line.contains(""""n_queries":3"""))
    // parseable by any JSON reader: balance check suffices without a lib
    assert(line.count(_ == '{') == line.count(_ == '}'))
    assert(line.startsWith("{") && line.endsWith("}"))
  }

  test("append: creates parents, appends in order, never throws") {
    val dir = java.nio.file.Files.createTempDirectory("bench-hist")
    val p = dir.resolve("sub/history.jsonl").toString
    BenchHistory.append(p, """{"run":1}""")
    BenchHistory.append(p, """{"run":2}""")
    val lines = java.nio.file.Files.readAllLines(java.nio.file.Paths.get(p))
    assert(lines.size() == 2 && lines.get(0) == """{"run":1}""" && lines.get(1) == """{"run":2}""")
    // unwritable path: the bench must not fail on a read-only checkout
    BenchHistory.append("/proc/graft-definitely-not-writable/x.jsonl", "{}")
  }

  test("gitHead resolves this repo's HEAD to a 12-char sha") {
    val sha = BenchHistory.gitHead("/root/repo")
    assert(sha.length == 12 && sha.forall(c => c.isDigit || ('a' to 'f').contains(c)),
      s"got: $sha")
    assert(BenchHistory.gitHead("/tmp") == "unknown", "no .git -> unknown, not a throw")
  }
}
