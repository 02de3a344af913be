package graft

import org.apache.spark.sql.functions._
import graft.functions.Multimodal
import graft.functions.Multimodal.{MediaRow, MediaFeatures}

class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  private val pngMagic = Array(0x89, 0x50, 0x4e, 0x47).map(_.toByte)
  // fakeDecode reads w = 1 + b4*256 + b5, h = 1 + b6*256 + b7
  private def payload(magic: Array[Byte], w: Int, h: Int): Array[Byte] =
    magic ++ Array(((w - 1) / 256).toByte, ((w - 1) % 256).toByte,
      ((h - 1) / 256).toByte, ((h - 1) % 256).toByte) ++
      Array.fill(16)(0x42.toByte)

  test("sniffMime recognizes container magic bytes") {
    val rows = Seq(
      (1L, pngMagic ++ Array.fill(8)(0.toByte)),
      (2L, Array(0xff, 0xd8, 0x01, 0x02).map(_.toByte)),
      (3L, "RIFF1234".getBytes),
      (4L, "plainbytes".getBytes)
    ).toDF("id", "payload")
    val out = rows.select(col("id"), Multimodal.sniffMime(col("payload")).as("mime"))
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "image/png")
    assert(out(2L) == "image/jpeg")
    assert(out(3L) == "audio/wav")
    assert(out(4L) == "application/octet-stream")
  }

  test("decodeFeatures runs per-partition and reads fake header dims") {
    val media = Seq(
      MediaRow(1L, payload(pngMagic, 640, 481), "image/png"),
      MediaRow(2L, payload(pngMagic, 1280, 721), "image/png")
    ).toDS().repartition(2)
    val feats = Multimodal.decodeFeatures(media).collect().sortBy(_.id)
    assert(feats.map(_.width).toSeq == Seq(640, 1280))
    assert(feats.map(_.height).toSeq == Seq(481, 721))
    assert(feats.forall(_.n_bytes == 24))
    // checksum deterministic across runs
    val again = Multimodal.decodeFeatures(media).collect().sortBy(_.id)
    assert(feats.map(_.checksum).toSeq == again.map(_.checksum).toSeq)
  }

  test("sampleFrames keeps every stride-th fixed-size chunk") {
    val bin = Array.tabulate(100)(_.toByte)
    val df = Seq(Tuple1(bin)).toDF("payload")
      .select(Multimodal.sampleFrames(col("payload"), frameBytes = 10, stride = 2).as("frames"))
    val frames = df.collect().head.getSeq[org.apache.spark.sql.Row](0)
    assert(frames.length == 5) // 10 frames, every 2nd
    assert(frames.map(_.getLong(0)).toSeq == Seq(0L, 2L, 4L, 6L, 8L))
    assert(frames.forall(_.getAs[Array[Byte]]("frame").length == 10))
  }

  test("sampleFrames on empty and sub-frame payloads") {
    val df = Seq(
      (1L, Array.empty[Byte]),            // sequence(0,-1) trap: must be []
      (2L, Array.tabulate(3)(_.toByte))   // one partial frame
    ).toDF("id", "payload")
      .select(col("id"),
        Multimodal.sampleFrames(col("payload"), frameBytes = 10, stride = 2).as("frames"))
    val out = df.collect().map(r =>
      r.getLong(0) -> r.getSeq[org.apache.spark.sql.Row](1)).toMap
    assert(out(1L).isEmpty, s"empty payload must yield no frames, got ${out(1L)}")
    assert(out(2L).map(_.getLong(0)) == Seq(0L))
    assert(out(2L).head.getAs[Array[Byte]]("frame").length == 3)
  }
}
