package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media payloads travel as opaque
  * `binary` columns with typed metadata alongside. The Spark-side
  * mechanics — schema, magic-byte sniffing, batched per-partition
  * decode, frame sampling — are real and tested; the actual
  * image/audio decoding is STUBBED with a deterministic fake (the
  * decode libraries are not in this container). Swap `fakeDecode`
  * for a real decoder (e.g. javacv) without touching the plumbing.
  */
object Multimodal {

  /** (id, payload, meta) — the canonical multimodal row. */
  case class MediaRow(id: Long, payload: Array[Byte], mime: String)

  /** Decoded features; in production width/height/duration come from
    * the codec, here from the fake header. */
  case class MediaFeatures(
      id: Long,
      mime: String,
      n_bytes: Long,
      width: Int,
      height: Int,
      checksum: Long)

  /** Magic-byte container sniffing on the binary column — a codegen'd
    * expression, runs at scan speed. */
  def sniffMime(bin: Column): Column = {
    val head = hex(substring(bin, 1, 4))
    when(head.startsWith("89504E47"), "image/png")
      .when(head.startsWith("FFD8"), "image/jpeg")
      .when(head.startsWith("52494646"), "audio/wav") // RIFF
      .when(head.startsWith("00000018") || head.startsWith("00000020"), "video/mp4")
      .otherwise("application/octet-stream")
  }

  /** DETERMINISTIC FAKE DECODE (stub): "dimensions" are read from
    * payload bytes 5..8 the way a real decoder reads a header. In
    * production this body is the only thing that changes. */
  private def fakeDecode(payload: Array[Byte]): (Int, Int) = {
    def b(i: Int): Int = if (payload.length > i) payload(i) & 0xff else 0
    (1 + b(4) * 256 + b(5), 1 + b(6) * 256 + b(7))
  }

  /** Per-partition batched decode — the Scala analog of mapInPandas:
    * one iterator pass per partition, constant memory, no shuffle.
    * Partition count (and thus decode parallelism) is whatever the
    * upstream source provides; repartition upstream for wider decode
    * fan-out at cluster scale. */
  def decodeFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val (w, h) = fakeDecode(r.payload)
        val checksum = r.payload.foldLeft(0L)((a, x) => (a * 31 + (x & 0xff)) & 0x7fffffffL)
        MediaFeatures(r.id, r.mime, r.payload.length.toLong, w, h, checksum)
      }
    }
  }

  /** Frame sampling: split a payload into fixed-size chunks ("frames")
    * and keep every `stride`-th — pure array expression, no UDF.
    * The upper bound is clamped to >= 0 and frames past the payload end
    * are filtered, because Spark's sequence(0, -1) yields [0, -1] (two
    * bogus frames) on an empty payload instead of an empty array. */
  def sampleFrames(bin: Column, frameBytes: Int, stride: Int): Column =
    filter(
      transform(
        sequence(lit(0L), greatest(lit(0L), floor((length(bin) - 1) / frameBytes))),
        i => struct(i.as("frame_id"), substring_dyn(bin, i * frameBytes + 1, frameBytes).as("frame"))),
      f => pmod(f.getField("frame_id"), lit(stride)) === 0 &&
        f.getField("frame_id") * frameBytes < length(bin))

  private def substring_dyn(bin: Column, pos: Column, len: Int): Column =
    call_function("substring", bin, pos, lit(len))
}
