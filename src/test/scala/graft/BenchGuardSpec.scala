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

  // --- round-10 hardening: the guard must fail LOUD, never silent ------

  private val sf = "/root/testdata/sf0.1"
  private def snapshot(sfDir: String, cpus: String) =
    s"""{"metric":"total","value":41.7,"unit":"sec","errors":[],"sf":"$sfDir","cpus":"$cpus","reps":3,"queries":{"q1_a":1.5,"q2_b":2.0,"q3_c":null}}"""

  test("parsePrev: comparable snapshot parses to the query map") {
    val r = Bench.parsePrev(Some(snapshot(sf, "32")), sf, "32")
    assert(r == Right(Map("q1_a" -> 1.5, "q2_b" -> 2.0)))
  }

  test("parsePrev: the r9 defeat scenario is now a named reason, not silence") {
    // r9: official cpus=32 run read a cpus=8 snapshot -> guard silently off
    assert(Bench.parsePrev(Some(snapshot(sf, "8")), sf, "32") == Left("cpus_mismatch"))
    assert(Bench.parsePrev(Some(snapshot("/root/testdata/sf0.01", "32")), sf, "32")
      == Left("sf_mismatch"))
    assert(Bench.parsePrev(None, sf, "32") == Left("no_previous_snapshot"))
    // a snapshot with the right config but an empty/null-only query map
    val empty = s"""{"sf":"$sf","cpus":"32","queries":{"q1_a":null}}"""
    assert(Bench.parsePrev(Some(empty), sf, "32") == Left("unparseable_snapshot"))
    val noMap = s"""{"sf":"$sf","cpus":"32","metric":"total"}"""
    assert(Bench.parsePrev(Some(noMap), sf, "32") == Left("unparseable_snapshot"))
  }

  test("official snapshot file is pinned to cpus=32 / sf0.1") {
    assert(Bench.snapshotFileName(sf, "32") == "BENCH_LOCAL.json")
    assert(Bench.snapshotFileName(sf + "/", "32") == "BENCH_LOCAL.json")
    // the exact r9 defeat: a cpus=8 run must NOT touch the official record
    assert(Bench.snapshotFileName(sf, "8") == "BENCH_LOCAL_sf0.1_cpus8.json")
    assert(Bench.snapshotFileName("/root/testdata/sf0.01", "32")
      == "BENCH_LOCAL_sf0.01_cpus32.json")
  }

  test("variance_suspects flags a synthetic per-query spike, not band noise") {
    val common = Seq(
      ("q104_inverted_index", 6.63, 0.98), // the r9 contamination shape: 6.8x
      ("q91_line_dedup", 0.82, 0.79),      // inside band
      ("q31_neardup_jaccard", 1.05, 0.97), // inside band
      ("q96_ann_hamming", 0.15, 0.38),     // 2.5x FASTER is suspect too
      ("q38_ann_pq", 3.49, 1.80)           // 1.9x: under the 2x bar, quiet
    )
    assert(Bench.varianceSuspects(common)
      == Seq("q104_inverted_index", "q96_ann_hamming"))
    // degenerate prev never divides by zero
    assert(Bench.varianceSuspects(Seq(("q", 1.0, 0.0))).isEmpty)
  }
}
