package graft.functions

import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData

/** Little-endian signed 16-bit PCM frame statistics — the kernel
  * behind [[graft.plans.PcmFramesExpr]] (`pcm_frames`). Static and
  * allocation-light so WholeStageCodegen can call it per row.
  *
  * Sample decode contract (identical in the DuckDB oracle, which
  * restates it over the ASCII payload bytes): sample i is
  * `bytes[2i] | (bytes[2i+1] << 8)` sign-extended from 16 bits; a
  * trailing odd byte is dropped (a real RIFF data chunk is
  * even-length; the synthetic payloads aren't, so the contract has to
  * say). Frames are `frameSamples` samples; the last frame keeps its
  * partial tail. Per frame: energy = Σ v² (exact in a long: even the
  * full-scale 2^15 sample leaves 2^33 headroom per 4096-sample frame)
  * and peak = max |v| (32768 for the full-scale negative — int-safe).
  */
object PcmAudio {

  /** One pass over the payload → `array<struct<energy: long, peak: int>>`
    * rows, ready for the expression's `ArrayData`. Empty / sub-2-byte
    * payloads yield an empty array (no frames), matching an oracle
    * that generates no sample rows for them. */
  def frames(bytes: Array[Byte], frameSamples: Int): GenericArrayData = {
    val nSamples = bytes.length / 2
    val nFrames = (nSamples + frameSamples - 1) / frameSamples
    val out = new Array[Any](nFrames)
    var f = 0
    while (f < nFrames) {
      val start = f * frameSamples
      val end = math.min(start + frameSamples, nSamples)
      var i = start
      var energy = 0L
      var peak = 0
      while (i < end) {
        val v = ((bytes(2 * i + 1) << 8) | (bytes(2 * i) & 0xff)).toShort.toInt
        energy += v.toLong * v
        val a = if (v < 0) -v else v
        if (a > peak) peak = a
        i += 1
      }
      out(f) = new GenericInternalRow(Array[Any](energy, peak))
      f += 1
    }
    new GenericArrayData(out)
  }
}
