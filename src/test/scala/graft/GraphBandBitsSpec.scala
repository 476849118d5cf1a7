package graft

import org.scalatest.funsuite.AnyFunSuite

/** r17: the graph-ANN band-width chain (LlmSim.graphBandBits) — the
  * smallest w in [8, 16] with 2^w·16 ≥ |V|. The graded contract: at
  * every driver SF (|V| ≤ 4096) the width must be EXACTLY the r16
  * fixed 8 bits, so those outputs stay bit-for-bit; past that it must
  * track log₂|V| (bounded mean occupancy) and clamp at 16. The same
  * thresholds are rendered into the DuckDB oracle as an additive CASE
  * chain — this spec pins the Scala side of that pairing.
  */
class GraphBandBitsSpec extends AnyFunSuite {
  private def bits(n: Long): Int = operators.LlmSim.graphBandBits(n)

  test("every driver-graded corpus size stays at the r16 width (8)") {
    // sf0.001 / sf0.01 = 500 vecs, sf0.1 = 2000; anything ≤ 4096
    // (the 2^8·16 threshold) must not change the graded outputs.
    for (n <- Seq(1L, 500L, 2000L, 4095L, 4096L)) assert(bits(n) == 8, s"n=$n")
  }

  test("width tracks log2 with occupancy ≤ 16 past the first threshold") {
    assert(bits(4097L) == 9)
    assert(bits(6000L) == 9)    // the 3x lockstep corpus
    assert(bits(8192L) == 9)
    assert(bits(8193L) == 10)
    assert(bits(20000L) == 11)  // tmp-sf1
    assert(bits(200000L) == 14) // tmp-sf10
    // invariant on the ramp: 2^w·16 >= n (occupancy ≤ 16) until the clamp
    for (n <- Seq(4097L, 10000L, 50000L, 123456L, 1000000L)) {
      val w = bits(n)
      assert(w == 16 || (16L << w) >= n, s"occupancy cap violated at n=$n w=$w")
    }
  }

  test("clamps at 16 bits for any corpus") {
    assert(bits(16L << 16) == 16)
    assert(bits(Long.MaxValue / 4) == 16)
  }
}
