package graft.functions

/** Real JPEG dimension decode: walk the segment chain to the first
  * SOF frame header (markers C0-CF minus C4/C8/CC, per ITU T.81) and
  * read the big-endian height/width that every baseline and
  * progressive JPEG carries there. Unlike the fixed-offset containers
  * (PNG/GIF/WAV) the SOF position varies with metadata segments, so
  * this is a byte-scan loop — kept as a static JVM method so both the
  * interpreted eval and the generated code of
  * [[graft.plans.JpegDimsExpr]] call the same body.
  */
object JpegDecode {

  /** `(width << 32) | height`, or -1 when the payload is not a JPEG
    * or carries no SOF segment. Packing into one long keeps the
    * native expression primitive-typed — no row allocation in the
    * per-row hot path; callers unpack with two shifts. */
  def dims(p: Array[Byte]): Long = {
    def u8(i: Int): Int = p(i) & 0xff
    def u16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    if (p.length < 4 || u8(0) != 0xff || u8(1) != 0xd8) return -1L
    var pos = 2
    while (pos + 1 < p.length) {
      if (u8(pos) != 0xff) return -1L // desynchronized: not a segment
      var marker = u8(pos + 1)
      while (marker == 0xff && pos + 2 < p.length) { // fill bytes
        pos += 1; marker = u8(pos + 1)
      }
      if (marker >= 0xc0 && marker <= 0xcf &&
          marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
        // SOFn: len(2) precision(1) height(2) width(2)
        if (pos + 8 >= p.length) return -1L
        val h = u16(pos + 5)
        val w = u16(pos + 7)
        return (w.toLong << 32) | h.toLong
      } else if (marker == 0xd9) {
        return -1L // EOI before any SOF: no frame header
      } else if (marker == 0xd8 || marker == 0x01 ||
          (marker >= 0xd0 && marker <= 0xd7)) {
        pos += 2 // standalone markers carry no length
      } else {
        if (pos + 3 >= p.length) return -1L
        val segLen = u16(pos + 2)
        if (segLen < 2) return -1L
        pos += 2 + segLen
      }
    }
    -1L
  }
}
