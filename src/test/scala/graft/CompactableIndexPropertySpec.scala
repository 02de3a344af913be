package graft

/** Property coverage for the [[graft.operators.CompactableIndex]]
  * protocol itself, independent of any family: under ANY interleaving
  * of appends, same-batch replays, and compactions that preserve the
  * in-flight batch, the index holds EXACTLY the landed rows — no
  * duplicates (the Winnow n_shared fatality class), no losses (the
  * fold-the-replayable-batch class), seeds intact (the id-space
  * class). The family specs pin these through their own loops; this
  * spec pins the shared kernel directly so a future sixth family
  * inherits tested, not just shared, behavior. */
class CompactableIndexPropertySpec extends SparkTestBase {

  private object TestIdx extends graft.operators.CompactableIndex {
    override protected def clusterCols: Seq[String] = Seq("k")
    def append(df: org.apache.spark.sql.DataFrame, path: String, id: Long): Unit =
      landStreamBatch(df, path, id)
    def seed(df: org.apache.spark.sql.DataFrame, path: String): Unit =
      landSeedBatch(df, path, SeedBatchId)
  }

  test("random append/replay/compact interleavings hold exactly the landed rows") {
    import spark.implicits._
    val rnd = new scala.util.Random(42) // deterministic trials
    (0 until 3).foreach { trial =>
      val path = java.nio.file.Files
        .createTempDirectory(s"cidxprop$trial").toString + "/idx"
      def rows(id: Long) =
        (0 until 20).map(j => (id, id * 100 + j)).toDF("k", "v")
      TestIdx.seed(rows(999), path)
      var landed = Set(999L)
      (0L until 8L).foreach { i =>
        TestIdx.append(rows(i), path, i)
        landed += i
        // at-least-once replay of the IN-FLIGHT batch (the only one
        // that can replay — commits are ordered)
        if (rnd.nextBoolean()) TestIdx.append(rows(i), path, i)
        // random in-loop compaction, preserving the in-flight batch
        // per the loop-safe contract
        if (rnd.nextInt(3) == 0) {
          TestIdx.compactIndex(spark, path,
            numFiles = 2, preserveBatchIds = Set(i))
          // the replay window extends ACROSS the compaction (crash
          // after compact, before commit): the preserved dir absorbs
          // the re-delivery by overwrite
          if (rnd.nextBoolean()) TestIdx.append(rows(i), path, i)
        }
      }
      val want = landed.flatMap(id => (0 until 20).map(j => (id, id * 100L + j)))
      val got = TestIdx.readIndex(spark, path)
        .as[(Long, Long)].collect()
      assert(got.toSet == want,
        s"trial $trial: missing=${(want -- got.toSet).take(3)} extra=${(got.toSet -- want).take(3)}")
      // set equality hides duplicates — row count must match too
      assert(got.length == want.size,
        s"trial $trial: ${got.length} rows for ${want.size} distinct — duplicates survived")
      // bounded dirs: everything folded except batch=-1 + the last
      // preserved batch (when the final iteration compacted)
      val dirs = new java.io.File(path).listFiles()
        .filter(_.isDirectory).map(_.getName).count(_.startsWith("batch="))
      assert(dirs <= 9, s"trial $trial: $dirs batch dirs after compactions")
    }
  }
}
