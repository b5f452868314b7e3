package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench variance guard: a contaminated leg (the round-8 incident:
  * 71.4 s committed vs 41.7 s for identical code one commit earlier) must
  * trip the alert; normal box variance must not. */
class BenchGuardSpec extends AnyFunSuite {

  test("synthetic slow run trips the alert (the r8 contamination shape)") {
    // 71.4 s vs 41.7 s — ratio 1.71, far outside the ±25% band
    val a = Bench.varianceAlert(71.4, 41.7)
    assert(a.isDefined)
    assert(math.abs(a.get - 71.4 / 41.7) < 1e-9)
    // symmetric: a suspiciously FAST run (e.g. crash-shrunk board) trips too
    assert(Bench.varianceAlert(41.7, 71.4).isDefined)
  }

  test("normal box variance stays quiet") {
    // the local[4] legs across r7/r8: 39.1 s vs 39.9 s
    assert(Bench.varianceAlert(39.9, 39.1).isEmpty)
    // SCALING.md's documented ±12% band is well inside the threshold
    assert(Bench.varianceAlert(44.8, 40.0).isEmpty)
    assert(Bench.varianceAlert(35.2, 40.0).isEmpty)
    // exactly at the boundary: 25% over is NOT an alert, just past it is
    assert(Bench.varianceAlert(50.0, 40.0).isEmpty)
    assert(Bench.varianceAlert(50.1, 40.0).isDefined)
  }

  test("no previous snapshot or degenerate totals never alert") {
    assert(Bench.varianceAlert(40.0, 0.0).isEmpty)
    assert(Bench.varianceAlert(40.0, -1.0).isEmpty)
  }
}
