package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.sources.{LakeWriter, Snapshots}

/** Snapshot versioning: pinned reproducible reads, crash-window
  * invisibility, vacuum retention. */
class SnapshotsSpec extends SparkTestBase {
  import spark.implicits._

  test("commit/read/readVersion: pinned versions survive later commits") {
    val root = Files.createTempDirectory("snap").toString + "/t"
    assert(Snapshots.latestVersion(spark, root).isEmpty)
    val v1 = Snapshots.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), root)
    val v2 = Snapshots.commit(Seq((1L, "a"), (2L, "B"), (3L, "c")).toDF("id", "s"), root)
    assert(v1 == 1L && v2 == 2L)
    assert(Snapshots.read(spark, root).count() == 3)
    // the pinned v1 read is byte-stable after v2 committed
    val pinned = Snapshots.readVersion(spark, root, v1)
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(pinned == Seq((1L, "a"), (2L, "b")))
    assert(Snapshots.latestVersion(spark, root) == Some(2L))
  }

  test("crash window: a complete but unreferenced version dir is invisible") {
    val root = Files.createTempDirectory("snap2").toString + "/t"
    Snapshots.commit(Seq(1L).toDF("id"), root)
    // simulate a crash AFTER the v=2 dir landed but BEFORE the manifest
    // flip: write the dir directly, leave _latest at 1
    Seq(1L, 2L).toDF("id").write.parquet(s"$root/v=2")
    assert(Snapshots.latestVersion(spark, root) == Some(1L))
    assert(Snapshots.read(spark, root).count() == 1)
    // the next commit reuses the slot and the new data wins
    val v = Snapshots.commit(Seq(10L, 20L, 30L).toDF("id"), root)
    assert(v == 2L)
    assert(Snapshots.read(spark, root).as[Long].collect().sorted.toSeq
      == Seq(10L, 20L, 30L))
  }

  test("lost manifest: readers recover from the directory listing") {
    val root = Files.createTempDirectory("snap5").toString + "/t"
    Snapshots.commit(Seq(1L).toDF("id"), root)
    Snapshots.commit(Seq(1L, 2L).toDF("id"), root)
    // simulate a store that lost _latest (or a legacy delete+rename
    // crash): committed version dirs are complete, manifest gone
    java.nio.file.Files.delete(java.nio.file.Paths.get(root, "_latest"))
    assert(Snapshots.latestVersion(spark, root) == Some(2L),
      "latestVersion must fall back to the newest listed version dir")
    assert(Snapshots.read(spark, root).count() == 2)
    // the next commit continues the numbering and restores the manifest
    val v = Snapshots.commit(Seq(1L, 2L, 3L).toDF("id"), root)
    assert(v == 3L)
    assert(Snapshots.latestVersion(spark, root) == Some(3L))
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(root, "_latest")))
  }

  test("changes: row-level delta between versions, updates as delete+insert") {
    val root = Files.createTempDirectory("snap4").toString + "/t"
    Snapshots.commit(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"), root)
    Snapshots.commit(Seq((1L, "a"), (2L, "B"), (4L, "d")).toDF("k", "v"), root)
    val delta = Snapshots.changes(spark, root, 1L, 2L)
      .as[(Long, String, String)].collect().toSet
    assert(delta == Set(
      (2L, "B", "insert"), (4L, "d", "insert"),  // update half + new row
      (2L, "b", "delete"), (3L, "c", "delete")), delta.toString)
    // applying the delta to v1 reproduces v2 (stream-consumer contract)
    val v1 = Snapshots.readVersion(spark, root, 1L)
    val applied = v1.unionByName(
        delta.toSeq.filter(_._3 == "insert").map(t => (t._1, t._2)).toDF("k", "v"))
      .exceptAll(delta.toSeq.filter(_._3 == "delete").map(t => (t._1, t._2)).toDF("k", "v"))
    val v2 = Snapshots.readVersion(spark, root, 2L)
    assert(applied.exceptAll(v2).isEmpty && v2.exceptAll(applied).isEmpty)
  }

  test("AT(TIMESTAMP =>): readAt resolves the version that was latest at the instant") {
    val root = Files.createTempDirectory("snapAt").toString + "/t"
    val before = System.currentTimeMillis() - 1
    val v1 = Snapshots.commit(Seq((1L, "a")).toDF("id", "s"), root)
    Thread.sleep(5) // distinct commit instants at millis granularity
    val t1 = System.currentTimeMillis()
    Thread.sleep(5)
    val v2 = Snapshots.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), root)
    // an instant between the commits reads v1's bytes, regardless of v2
    assert(Snapshots.versionAt(spark, root, t1) == Some(v1))
    assert(Snapshots.readAt(spark, root, t1).count() == 1)
    // "now" reads the latest
    assert(Snapshots.versionAt(spark, root, System.currentTimeMillis()) == Some(v2))
    assert(Snapshots.readAt(spark, root, System.currentTimeMillis()).count() == 2)
    // before the table existed: no snapshot, loud failure
    assert(Snapshots.versionAt(spark, root, before).isEmpty)
    intercept[java.util.NoSuchElementException] {
      Snapshots.readAt(spark, root, before)
    }
    // a crash-orphaned unreferenced slot never becomes readable
    Seq(99L).toDF("id").write.parquet(s"$root/v=3")
    assert(Snapshots.versionAt(spark, root, System.currentTimeMillis()) == Some(v2))
  }

  test("vacuum keeps the newest K and the current version") {
    val root = Files.createTempDirectory("snap3").toString + "/t"
    (1 to 4).foreach(i => Snapshots.commit(Seq(i.toLong).toDF("id"), root))
    val dropped = Snapshots.vacuum(spark, root, keep = 2)
    assert(dropped == Seq(1L, 2L))
    assert(Snapshots.readVersion(spark, root, 3L).count() == 1)
    assert(Snapshots.read(spark, root).as[Long].head() == 4L)
    intercept[Exception] { Snapshots.readVersion(spark, root, 1L).collect() }
  }

  test("vacuumOlderThan keeps the boundary version readAt(cutoff) resolves to") {
    import spark.implicits._
    val root = Files.createTempDirectory("snapret").toString + "/t"
    (1 to 4).foreach(i => Snapshots.commit(Seq(i.toLong).toDF("id"), root))
    // synthetic commit times: v1@1000, v2@2000, v3@3000, v4@4000
    (1 to 4).foreach { v =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$root/_commits/$v"),
        (v * 1000L).toString.getBytes("UTF-8"))
      // the nio write bypasses Hadoop's ChecksumFileSystem — drop the
      // now-stale .crc sidecar or the next read throws ChecksumException
      java.nio.file.Files.deleteIfExists(
        java.nio.file.Paths.get(s"$root/_commits/.$v.crc"))
    }
    // retention cutoff 2500: v3/v4 are inside the window, and v2 is
    // the version in effect AT 2500 — only v1 is unreachable
    val dropped = Snapshots.vacuumOlderThan(spark, root, cutoffMillis = 2500L)
    assert(dropped == Seq(1L), s"dropped $dropped")
    assert(Snapshots.versionAt(spark, root, 2500L) == Some(2L))
    assert(Snapshots.readAt(spark, root, 2500L).as[Long].head() == 2L,
      "time travel to the cutoff instant must survive the vacuum")
    // cutoff far in the future: everything but the current goes
    val dropped2 = Snapshots.vacuumOlderThan(spark, root, cutoffMillis = 9000L)
    assert(dropped2 == Seq(2L, 3L), s"dropped2 $dropped2")
    assert(Snapshots.read(spark, root).as[Long].head() == 4L)
  }

  test("rollbackTo restores old content as a NEW version; history stays append-only") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("snaprb").toString + "/t"
    Snapshots.commit(Seq(1L, 2L).toDF("v"), root)   // v1 good
    Snapshots.commit(Seq(9L, 9L, 9L).toDF("v"), root) // v2 bad load
    val restored = Snapshots.rollbackTo(spark, root, 1L)
    assert(restored == 3L, "rollback commits forward, never rewrites history")
    assert(Snapshots.read(spark, root).as[Long].collect().sorted.toSeq == Seq(1L, 2L))
    // the bad version stays pinned and auditable
    assert(Snapshots.readVersion(spark, root, 2L).count() == 3)
    // the rollback is itself roll-back-able
    assert(Snapshots.rollbackTo(spark, root, 2L) == 4L)
    assert(Snapshots.read(spark, root).count() == 3)
  }
}
