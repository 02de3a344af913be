package graft

import graft.functions.HashFunctions.rateGateHex

/** The shared 16-bit rate-gate clamp ([[graft.functions.HashFunctions
  * .rateGateHex]]) — one helper now feeds every fixed-N calibration
  * gate (F35's ppl pool, D21's query sample), so its edge behavior is
  * pinned once: never "0000" (the empty-sample-both-engines-agree-on
  * class), caps at "ffff", 4 lowercase hex chars at every rate, and
  * monotone in rate. */
class RateGateSpec extends SparkTestBase {

  test("clamp: never empty, caps at 0xffff, 4 lowercase hex, monotone") {
    assert(rateGateHex(0.0) == "0001")
    assert(rateGateHex(1e-12) == "0001") // sub-slice rate floors to one unit
    assert(rateGateHex(1.0) == "ffff")
    assert(rateGateHex(2.0) == "ffff") // over-unity rates cap, not overflow
    assert(rateGateHex(0.5) == "8000")
    val samples = (0 to 1000).map(i => rateGateHex(i / 1000.0))
    samples.foreach { h =>
      assert(h.length == 4 && h.forall(c => c.isDigit || ('a' to 'f').contains(c)), h)
      assert(h >= "0001" && h <= "ffff")
    }
    assert(samples == samples.sorted, "threshold must be monotone in rate")
  }
}
