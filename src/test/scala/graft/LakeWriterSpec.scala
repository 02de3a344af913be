package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.{LakeWriter, RawLoader, ViewingData}

class LakeWriterSpec extends SparkTestBase {

  test("hive layout round-trip: LakeWriter → RawLoader recovers dates") {
    val root = Files.createTempDirectory("lake").toString
    val events = ViewingData.table(spark, Sf, "events").limit(200)
    LakeWriter.writeHive(events, "ts", root, "EVENTS")

    // layout on disk is the reference's stage pattern
    val days = new java.io.File(s"$root/EVENTS").listFiles().map(_.getName)
      .filterNot(n => n.startsWith("_") || n.startsWith("."))
    assert(days.nonEmpty && days.forall(_.startsWith("yyyy=")))

    val back = RawLoader.load(spark, root, "EVENTS")
    assert(back.count() == 200)
    // recovered path date must equal the row's own event date
    val mismatches = back
      .filter(col("metadata_date") =!= to_date(col("ts"))).count()
    assert(mismatches == 0)
  }

  test("dynamic partition overwrite: re-ingesting one day replaces only that day") {
    import spark.implicits._
    val root = Files.createTempDirectory("lake3").toString
    val events = ViewingData.table(spark, Sf, "events").limit(500)
    LakeWriter.writeHive(events, "ts", root, "EV")
    val totalBefore = spark.read.parquet(s"$root/EV").count()
    val days = spark.read.parquet(s"$root/EV")
      .groupBy("yyyy", "mm", "dd").count()
      .filter(col("count") >= 2).collect() // a 1-row day would make the halved slice empty
    assert(days.length > 1, "need multiple day partitions for this test")

    // backfill day 1 with a corrected, smaller slice (the reference's
    // ingest-backfill.sql one-shot re-COPY semantics); partition
    // values come back type-inferred as ints
    val d = days.head
    val day1 = events.filter(to_date(col("ts")) === make_date(
      lit(d.get(0).toString.toInt), lit(d.get(1).toString.toInt),
      lit(d.get(2).toString.toInt)))
    val day1Count = day1.count()
    val corrected = day1.limit((day1Count / 2).toInt)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try LakeWriter.writeHive(corrected, "ts", root, "EV")
    finally spark.conf.unset("spark.sql.sources.partitionOverwriteMode")

    val after = spark.read.parquet(s"$root/EV")
    // other days untouched; day 1 replaced by the corrected slice
    assert(after.count() == totalBefore - day1Count + corrected.count(),
      "only the re-written day's partition may change")
  }

  test("compact: fragmented days collapse to one file each, content identical") {
    import spark.implicits._
    val root = Files.createTempDirectory("lake3").toString
    val events = ViewingData.table(spark, Sf, "events")
      .select("event_id", "ts", "user_id", "event_type").limit(200)
      .repartition(16) // fragment: up to 16 files per day directory
    LakeWriter.writeHive(events, "ts", root, "EV")
    def dayDirs = new java.io.File(s"$root/EV").listFiles()
      .filter(_.getName.startsWith("yyyy=")).flatMap(_.listFiles())
      .flatMap(_.listFiles()) // yyyy=/mm=/dd=
    def parquetCount(d: java.io.File) =
      d.listFiles().count(_.getName.endsWith(".parquet"))
    assert(dayDirs.exists(parquetCount(_) > 1), "precondition: fragmented")
    val before = spark.read.parquet(s"$root/EV")
      .select("event_id", "user_id", "event_type")
      .as[(Long, Long, String)].collect().sorted.toSeq

    LakeWriter.compact(spark, root, "EV", "ts")

    // tiny corpus → one file per day; dir names keep zero padding
    assert(dayDirs.nonEmpty && dayDirs.forall(parquetCount(_) == 1),
      dayDirs.map(d => s"${d.getName}:${parquetCount(d)}").mkString(","))
    assert(dayDirs.forall(_.getName.matches("dd=\\d{2}")))
    val after = spark.read.parquet(s"$root/EV")
      .select("event_id", "user_id", "event_type")
      .as[(Long, Long, String)].collect().sorted.toSeq
    assert(after == before)
  }

  test("compact publishes atomically and handles JSONL/CSV feeds") {
    import spark.implicits._
    val root = Files.createTempDirectory("lake4").toString
    val events = ViewingData.table(spark, Sf, "events")
      .select("event_id", "ts", "user_id", "event_type").limit(120)
      .repartition(8) // fragment each day
    for (fmt <- Seq("json", "csv", "orc")) {
      val feed = s"EV_$fmt"
      LakeWriter.writeHiveAs(events, "ts", root, feed, fmt)
      def readBack = (if (fmt == "csv")
          spark.read.option("header", "true").option("inferSchema", "true")
            .csv(s"$root/$feed")
        else if (fmt == "orc") spark.read.orc(s"$root/$feed")
        else spark.read.json(s"$root/$feed"))
        .select(col("event_id").cast("long"), col("user_id").cast("long"),
          col("event_type"))
        .as[(Long, Long, String)].collect().sorted.toSeq
      val before = readBack
      LakeWriter.compact(spark, root, feed, "ts", format = fmt)
      assert(readBack == before, s"$fmt content must survive compaction")
      // the swap completed: no staging or old copies left behind
      assert(!new java.io.File(LakeWriter.stagingPath(s"$root/$feed")).exists())
      assert(!new java.io.File(s"$root/$feed.__old__").exists())
    }
    // mismatched format fails fast with a clear message, not a decode error
    val err = intercept[IllegalArgumentException](
      LakeWriter.compact(spark, root, "EV_json", "ts", format = "avro"))
    assert(err.getMessage.contains("unsupported feed format"))
  }

  test("publish: swaps atomically and cleans stale crash leftovers") {
    import spark.implicits._
    val root = Files.createTempDirectory("publish").toString
    def write(path: String, v: Long): Unit =
      Seq(v).toDF("x").coalesce(1).write.mode("overwrite").parquet(path)
    val target = s"$root/t"
    write(target, 1L) // live copy
    // a previous run crashed between its two renames: stale __old__ AND
    // a stale staging dir are both lying around
    write(s"$target.__old__", 99L)
    write(LakeWriter.stagingPath(target) + "_zombie", 98L)
    // current run stages a fresh rewrite and publishes
    val staged = LakeWriter.stagingPath(target)
    write(staged, 2L)
    LakeWriter.publish(spark, staged, target)
    assert(spark.read.parquet(target).as[Long].collect().toSeq == Seq(2L))
    assert(!new java.io.File(staged).exists(), "staging must be promoted away")
    assert(!new java.io.File(s"$target.__old__").exists(),
      "previous copy must be dropped after a successful swap")
    // publishing onto a path with NO existing target also works (first write)
    val fresh = s"$root/fresh"
    write(LakeWriter.stagingPath(fresh), 7L)
    LakeWriter.publish(spark, LakeWriter.stagingPath(fresh), fresh)
    assert(spark.read.parquet(fresh).as[Long].collect().toSeq == Seq(7L))
  }

  test("JSONL and CSV hive layouts round-trip with equal content") {
    import spark.implicits._
    val root = Files.createTempDirectory("lake2").toString
    val events = ViewingData.table(spark, Sf, "events")
      .select("event_id", "ts", "user_id", "event_type").limit(100)
    LakeWriter.writeHiveAs(events, "ts", root, "EV_JSONL", "json")
    LakeWriter.writeHiveAs(events, "ts", root, "EV_CSV", "csv")

    // JSONL: one JSON object per line, schema self-describing
    val firstDay = new java.io.File(s"$root/EV_JSONL").listFiles()
      .filter(_.getName.startsWith("yyyy=")).head
    val jsonPart = firstDay.listFiles().head.listFiles().head.listFiles()
      .filter(_.getName.endsWith(".json")).head
    val firstLine = scala.io.Source.fromFile(jsonPart).getLines().next()
    assert(firstLine.startsWith("{") && firstLine.contains("\"event_id\""))

    val backJson = spark.read.json(s"$root/EV_JSONL")
      .select("event_id", "user_id", "event_type")
    val backCsv = spark.read.option("header", "true")
      .schema("event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING")
      .csv(s"$root/EV_CSV")
      .select("event_id", "user_id", "event_type")
    val expected = events.select("event_id", "user_id", "event_type")
      .as[(Long, Long, String)].collect().sorted.toSeq
    assert(backJson.as[(Long, Long, String)].collect().sorted.toSeq == expected)
    assert(backCsv.as[(Long, Long, String)].collect().sorted.toSeq == expected)
  }
}
