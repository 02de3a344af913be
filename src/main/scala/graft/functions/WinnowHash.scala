package graft.functions

/** Winnowing over a rolling polynomial hash — the O(n) scalar kernel
  * behind [[graft.plans.WinnowFpsExpr]] (`winnow_fps`). Static and
  * allocation-light so WholeStageCodegen calls it directly.
  *
  * Hash convention (shared with the `text_fingerprint` row so the
  * DuckDB oracle can restate it with `list_reduce`): over the k-gram's
  * code points, `h = (h * 31 + c) mod (2^31 - 1)`, h0 = 0, then ONE
  * final bijective mix `h · 48271 mod (2^31 - 1)` (the MINSTD
  * multiplier). The mix matters: raw base-31 folds of short ASCII
  * grams order largely by their first characters, so window MINIMA
  * systematically select space-/lowercase-prefixed grams — a biased,
  * boilerplate-heavy fingerprint sample (observed: ~2× the candidate
  * pairs of the md5 flavor on the same corpus). A multiplicative mix
  * is order-scrambling but bijective, so collision structure is
  * unchanged while min-selection becomes effectively uniform over
  * positions — and it is one `%`-multiply the oracle restates
  * verbatim. The rolling update subtracts the outgoing char's
  * `c · 31^(k-1) mod M` term — each position costs O(1) instead of
  * the O(k) refold (and instead of the md5-per-position of the
  * oracle-twin flavor). Window minima via a monotone deque: O(n)
  * total, not O(n·w).
  */
object WinnowHash {

  private val M = 2147483647L // 2^31 - 1
  private val B = 31L
  private val Mix = 48271L // MINSTD multiplier, coprime to M

  /** Distinct winnowing fingerprints of `s`, sorted ascending.
    * Empty result for strings shorter than k. Semantics match the
    * md5 flavor of [[graft.operators.Winnow.fingerprints]]: one hash
    * per k-gram position, minimum of each w-window of consecutive
    * hashes, distinct. */
  def fingerprints(s: String, k: Int, w: Int): Array[Long] = {
    val n = s.codePointCount(0, s.length)
    val m = n - k + 1
    if (m < 1) return Array.emptyLongArray
    // code points once (ASCII fast path == charAt)
    val cs = new Array[Int](n)
    var ci = 0
    var off = 0
    while (off < s.length) {
      val cp = s.codePointAt(off)
      cs(ci) = cp; ci += 1
      off += Character.charCount(cp)
    }
    // B^(k-1) mod M for the outgoing term
    var bk = 1L
    var i = 1
    while (i < k) { bk = bk * B % M; i += 1 }
    // rolling hashes per position
    val hs = new Array[Long](m)
    var h = 0L
    i = 0
    while (i < k) { h = (h * B + cs(i)) % M; i += 1 }
    hs(0) = h * Mix % M
    i = 1
    while (i < m) {
      var t = (h - cs(i - 1) * bk % M) % M
      if (t < 0) t += M
      h = (t * B + cs(i + k - 1)) % M
      hs(i) = h * Mix % M
      i += 1
    }
    // sliding window minima, monotone deque over indices; minima land
    // in a primitive scratch buffer — sort + in-place dedupe gives the
    // sorted-distinct result with zero boxing (this runs per row
    // inside the codegen'd scan)
    val wEff = math.min(w, m)
    val deque = new Array[Int](m)
    var head = 0
    var tail = 0 // [head, tail)
    val mins = new Array[Long](math.max(m - wEff + 1, 1))
    var nMin = 0
    i = 0
    while (i < m) {
      while (tail > head && hs(deque(tail - 1)) >= hs(i)) tail -= 1
      deque(tail) = i; tail += 1
      if (deque(head) <= i - wEff) head += 1
      if (i >= wEff - 1) { mins(nMin) = hs(deque(head)); nMin += 1 }
      i += 1
    }
    java.util.Arrays.sort(mins, 0, nMin)
    var nOut = 0
    i = 0
    while (i < nMin) {
      if (nOut == 0 || mins(nOut - 1) != mins(i)) { mins(nOut) = mins(i); nOut += 1 }
      i += 1
    }
    java.util.Arrays.copyOfRange(mins, 0, nOut)
  }

  /** Reference refold of one k-gram (test oracle for the rolling
    * update). */
  def gramHash(s: String, start: Int, k: Int): Long = {
    var h = 0L
    var i = 0
    var off = s.offsetByCodePoints(0, start)
    while (i < k) {
      val cp = s.codePointAt(off)
      h = (h * B + cp) % M
      off += Character.charCount(cp)
      i += 1
    }
    h * Mix % M
  }
}
