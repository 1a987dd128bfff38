package graft

import org.scalatest.funsuite.AnyFunSuite

/** Threshold arithmetic for the bench artifact's load-quality flag —
  * pure function, no Spark session needed. */
class BenchSpec extends AnyFunSuite {

  private val quiet = Seq.fill(10)((1.0, 1.2))

  test("quiet run: tight spreads at the anchor calib are not noisy") {
    assert(!Bench.isNoisy(quiet, Bench.CalibAnchor))
  }

  test("spread rule: flags at NoisySpreadCount wide queries, not below") {
    val wide = (0.5, 0.5 * Bench.NoisySpreadRatio * 1.01)
    val below = quiet ++ Seq.fill(Bench.NoisySpreadCount - 1)(wide)
    val at = quiet ++ Seq.fill(Bench.NoisySpreadCount)(wide)
    assert(!Bench.isNoisy(below, Bench.CalibAnchor))
    assert(Bench.isNoisy(at, Bench.CalibAnchor))
  }

  test("spread ratio is strict: exactly 3x is not wide") {
    val exact = Seq.fill(Bench.NoisySpreadCount + 1)(
      (1.0, Bench.NoisySpreadRatio))
    assert(!Bench.isNoisy(exact, Bench.CalibAnchor))
  }

  test("calib rule: >25% deviation flags in BOTH directions") {
    val a = Bench.CalibAnchor
    assert(Bench.isNoisy(quiet, a * 1.26))
    assert(Bench.isNoisy(quiet, a * 0.74))
    assert(!Bench.isNoisy(quiet, a * 1.24))
    assert(!Bench.isNoisy(quiet, a * 0.76))
  }

  test("zero-lo spreads never divide: ignored by the wide count") {
    val zeros = Seq.fill(Bench.NoisySpreadCount + 1)((0.0, 1.0))
    assert(!Bench.isNoisy(zeros, Bench.CalibAnchor))
  }
}
