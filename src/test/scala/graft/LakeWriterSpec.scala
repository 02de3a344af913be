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
}
