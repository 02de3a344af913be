package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.{StatsIndex, ViewingData}

/** [[sources.StatsIndex]]: driver-side file skipping must (a) actually
  * skip files on a range-laid table, (b) never change results vs the
  * full scan, (c) drop everything for an out-of-range predicate, and
  * (d) degrade to correct-but-unpruned on a layout with overlapping
  * ranges (skipping is a layout property, not a correctness one).
  */
class StatsIndexSpec extends SparkTestBase {

  private def writeRangeLaid(): String = {
    val dir = Files.createTempDirectory("statsidx").toString + "/events"
    ViewingData.table(spark, Sf, "events")
      .repartitionByRange(8, col("ts"))
      .sortWithinPartitions("ts")
      .write.mode("overwrite").parquet(dir)
    dir
  }

  test("range-laid table: narrow window prunes most files, result parity holds") {
    val dir = writeRangeLaid()
    StatsIndex.build(spark, dir, Seq("ts", "value"))
    val lo = java.sql.Timestamp.valueOf("2024-01-10 00:00:00")
    val hi = java.sql.Timestamp.valueOf("2024-01-12 00:00:00")
    val (kept, total) = StatsIndex.pruneFiles(spark, dir, "ts", lo, hi)
    assert(total == 8, s"expected 8 data files, manifest saw $total")
    assert(kept.nonEmpty && kept.size <= total / 2,
      s"a ~2-of-30-day window must prune >= half the range-laid files, kept ${kept.size}/$total")
    val got = StatsIndex.prunedRead(spark, dir, "ts", lo, hi)
      .agg(count(lit(1)), sum("event_id")).collect()(0)
    val full = spark.read.parquet(dir)
      .filter(col("ts") >= lit(lo) && col("ts") <= lit(hi))
      .agg(count(lit(1)), sum("event_id")).collect()(0)
    assert(got.getLong(0) > 0 && got == full)
  }

  test("out-of-range predicate: zero files scanned, empty frame with table schema") {
    val dir = writeRangeLaid()
    StatsIndex.build(spark, dir, Seq("ts"))
    val lo = java.sql.Timestamp.valueOf("1990-01-01 00:00:00")
    val hi = java.sql.Timestamp.valueOf("1990-12-31 00:00:00")
    val (kept, _) = StatsIndex.pruneFiles(spark, dir, "ts", lo, hi)
    assert(kept.isEmpty)
    val df = StatsIndex.prunedRead(spark, dir, "ts", lo, hi)
    assert(df.count() == 0)
    assert(df.columns.toSet == spark.read.parquet(dir).columns.toSet)
  }

  test("hash-laid table (overlapping ranges): no pruning, still correct") {
    val dir = Files.createTempDirectory("statsidx").toString + "/events"
    ViewingData.table(spark, Sf, "events")
      .repartition(8, col("user_id")) // every file spans ~the full ts range
      .write.mode("overwrite").parquet(dir)
    StatsIndex.build(spark, dir, Seq("ts"))
    val lo = java.sql.Timestamp.valueOf("2024-01-10 00:00:00")
    val hi = java.sql.Timestamp.valueOf("2024-01-12 00:00:00")
    val (kept, total) = StatsIndex.pruneFiles(spark, dir, "ts", lo, hi)
    assert(kept.size == total, "overlapping layouts legitimately keep every file")
    val got = StatsIndex.prunedRead(spark, dir, "ts", lo, hi).count()
    val full = spark.read.parquet(dir)
      .filter(col("ts") >= lit(lo) && col("ts") <= lit(hi)).count()
    assert(got == full && got > 0)
  }

  test("refresh indexes only NEW files: old files' bytes are never re-read") {
    val dir = writeRangeLaid()
    StatsIndex.build(spark, dir, Seq("ts"))
    // corrupt an already-indexed data file IN PLACE: any attempt to
    // re-scan it now throws, so a passing refresh proves old bytes
    // stay untouched (a full build() over the same table fails)
    val victim = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
      .head.toPath
    Files.write(victim, Array.fill[Byte](64)(0x7f))
    intercept[Exception] {
      spark.read.parquet(dir).agg(min(col("ts"))).collect()
    }
    // new files arrive (a later day's append), manifest refreshes fine
    ViewingData.table(spark, Sf, "events")
      .limit(500).write.mode("append").parquet(dir)
    StatsIndex.refresh(spark, dir, Seq("ts"))
    val manifest = spark.read.parquet(s"$dir/_graft_stats")
    val dataFiles = new java.io.File(dir).listFiles()
      .count(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
    assert(manifest.count() == dataFiles,
      s"manifest must cover all ${dataFiles} files after refresh")
    assert(manifest.filter(col("ts__min").isNull).count() == 0)
  }

  test("refresh drops manifest rows for deleted files") {
    val dir = writeRangeLaid()
    StatsIndex.build(spark, dir, Seq("ts"))
    val before = spark.read.parquet(s"$dir/_graft_stats").count()
    val victim = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_")).head
    assert(victim.delete())
    StatsIndex.refresh(spark, dir, Seq("ts"))
    val after = spark.read.parquet(s"$dir/_graft_stats")
    assert(after.count() == before - 1)
    // pruning never returns a path the scan would fail on
    val lo = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val hi = java.sql.Timestamp.valueOf("2024-02-01 00:00:00")
    val (kept, _) = StatsIndex.pruneFiles(spark, dir, "ts", lo, hi)
    assert(!kept.exists(_.contains(victim.getName)))
    StatsIndex.prunedRead(spark, dir, "ts", lo, hi).count() // must not throw
  }

  test("hive-partitioned table: pruned read keeps the partition column") {
    val dir = Files.createTempDirectory("statsidx").toString + "/events"
    ViewingData.table(spark, Sf, "events")
      .withColumn("day", dayofmonth(col("ts")))
      .repartitionByRange(4, col("value"))
      .write.partitionBy("day").mode("overwrite").parquet(dir)
    StatsIndex.build(spark, dir, Seq("value"))
    val df = StatsIndex.prunedRead(spark, dir, "value", 0.0, 1.0)
    assert(df.columns.contains("day"),
      s"partition column must survive the file-list read: ${df.columns.toSeq}")
    val full = spark.read.parquet(dir).filter(col("value").between(0.0, 1.0))
    assert(df.count() == full.count() && df.count() > 0)
    assert(df.agg(sum(col("day"))).head.getLong(0) ==
      full.agg(sum(col("day"))).head.getLong(0))
  }

  test("z-order rewrite auto-rebuilds an existing manifest over the new layout") {
    val dir = Files.createTempDirectory("statsidx").toString + "/t"
    ViewingData.table(spark, Sf, "events")
      .select("event_id", "user_id", "value", "ts")
      .write.mode("overwrite").parquet(dir)
    StatsIndex.build(spark, dir, Seq("value"))
    graft.sources.LakeWriter.zorderBy(spark, dir, "value", "user_id", nFiles = 4)
    assert(StatsIndex.exists(spark, dir), "manifest must survive the layout swap")
    assert(StatsIndex.indexedColumns(spark, dir) == Seq("value"))
    val manifest = spark.read.parquet(s"$dir/_graft_stats")
    val liveFiles = new java.io.File(dir).listFiles()
      .count(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
    assert(manifest.count() == liveFiles,
      s"manifest must describe the POST-rewrite files (${manifest.count()} vs $liveFiles)")
    // and the index actually prunes on the z-ordered layout
    val (kept, total) = StatsIndex.pruneFiles(spark, dir, "value", 0.0, 0.5)
    assert(kept.size < total, s"z-ordered layout must prune: $kept of $total")
    val got = StatsIndex.prunedRead(spark, dir, "value", 0.0, 0.5).count()
    val full = spark.read.parquet(dir).filter(col("value").between(0.0, 0.5)).count()
    assert(got == full && got > 0)
  }

  test("bloom index: point lookup on a hash-laid key prunes to ~one file") {
    val dir = Files.createTempDirectory("statsidx").toString + "/events"
    // hash layout: every file spans the full user range (min/max
    // stats prune NOTHING here) but each user lives in exactly one file
    ViewingData.table(spark, Sf, "events")
      .repartition(8, col("user_id"))
      .write.mode("overwrite").parquet(dir)
    StatsIndex.buildBloom(spark, dir, "user_id")
    val probe = ViewingData.table(spark, Sf, "events")
      .select("user_id").head.getLong(0)
    val (kept, total) = StatsIndex.pruneFilesEq(spark, dir, "user_id", probe)
    assert(total >= 6 && kept.nonEmpty && kept.size <= 2,
      s"one user lives in one file (+ rare fp), kept ${kept.size}/$total")
    val got = StatsIndex.prunedReadEq(spark, dir, "user_id", probe).count()
    val full = spark.read.parquet(dir).filter(col("user_id") === probe).count()
    assert(got == full && got > 0)
    // an absent key keeps ~no files and returns an empty frame
    val (keptAbsent, _) = StatsIndex.pruneFilesEq(spark, dir, "user_id", -12345L)
    assert(keptAbsent.size <= 1, s"absent key kept ${keptAbsent.size} files")
    assert(StatsIndex.prunedReadEq(spark, dir, "user_id", -12345L).count() == 0)
  }

  test("refresh on a hive-partitioned table indexing its partition column") {
    val dir = Files.createTempDirectory("statsidx").toString + "/events"
    val ev = ViewingData.table(spark, Sf, "events")
      .withColumn("day", dayofmonth(col("ts")))
    ev.filter(col("day") <= 15).write.partitionBy("day").mode("overwrite").parquet(dir)
    StatsIndex.build(spark, dir, Seq("day", "value"))
    // a later partition arrives; refresh must resolve 'day' on the
    // NEW-files-only read (basePath) and index just those files
    ev.filter(col("day") > 15).write.partitionBy("day").mode("append").parquet(dir)
    StatsIndex.refresh(spark, dir, Seq("day", "value"))
    val manifest = spark.read.parquet(s"$dir/_graft_stats")
    assert(manifest.filter(col("day__min").isNull).count() == 0)
    val (kept, total) = StatsIndex.pruneFiles(spark, dir, "day", 20, 22)
    assert(kept.nonEmpty && kept.size < total)
    val got = StatsIndex.prunedRead(spark, dir, "day", 20, 22).count()
    val full = spark.read.parquet(dir).filter(col("day").between(20, 22)).count()
    assert(got == full && got > 0)
  }

  test("compaction rebuilds BOTH index flavors over the new layout") {
    val root = Files.createTempDirectory("statsidx").toString
    val ev = ViewingData.table(spark, Sf, "events")
    graft.sources.LakeWriter.writeHive(ev, "ts", root, "feed")
    val dir = s"$root/feed"
    StatsIndex.build(spark, dir, Seq("value"))
    StatsIndex.buildBloom(spark, dir, "user_id")
    // a crash leftover of a previous staged write must not be treated
    // as a bloom column by the rebuild
    new java.io.File(s"$dir/_graft_bloom/user_id.__staging__").mkdirs()
    graft.sources.LakeWriter.compact(spark, root, "feed", "ts")
    assert(StatsIndex.exists(spark, dir) &&
      StatsIndex.bloomColumns(spark, dir) == Seq("user_id"),
      "both indexes must survive OPTIMIZE")
    val probe = ev.select("user_id").head.getLong(0)
    val viaBloom = StatsIndex.prunedReadEq(spark, dir, "user_id", probe).count()
    val full = spark.read.parquet(dir).filter(col("user_id") === probe).count()
    assert(viaBloom == full && viaBloom > 0)
  }

  test("layout rebuild preserves custom bloom sizing") {
    val dir = Files.createTempDirectory("statsidx").toString + "/t"
    ViewingData.table(spark, Sf, "events")
      .select("event_id", "user_id", "value", "ts")
      .write.mode("overwrite").parquet(dir)
    StatsIndex.buildBloom(spark, dir, "user_id",
      expectedItemsPerFile = 1L << 22, numBits = 1L << 25)
    graft.sources.LakeWriter.zorderBy(spark, dir, "value", "user_id", nFiles = 3)
    val spec = StatsIndex.captureIndexes(spark, dir)
    assert(spec.blooms == Seq(("user_id", 1L << 22, 1L << 25)),
      s"sizing must ride through the rebuild, got ${spec.blooms}")
  }

  test("numeric column index on the double value column") {
    val dir = Files.createTempDirectory("statsidx").toString + "/events"
    ViewingData.table(spark, Sf, "events")
      .repartitionByRange(6, col("value"))
      .write.mode("overwrite").parquet(dir)
    StatsIndex.build(spark, dir, Seq("value"))
    val (kept, total) = StatsIndex.pruneFiles(spark, dir, "value", 0.0, 1.0)
    assert(kept.size < total)
    val got = StatsIndex.prunedRead(spark, dir, "value", 0.0, 1.0).count()
    val full = spark.read.parquet(dir)
      .filter(col("value").between(0.0, 1.0)).count()
    assert(got == full && got > 0)
  }
}
