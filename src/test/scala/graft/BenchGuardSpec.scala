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

  // --- round-11 hardening: line budget, broad-mild trigger, clean baseline

  test("broad-mild contamination fires the alert even with aggregate in band") {
    // the r10 shape: many queries >2x off, aggregate ratio ~1.02 (inside
    // the ±25% band). 40 common queries, threshold = max(3, ceil(4)) = 4;
    // 6 inflated 2.2x but each tiny, so the total barely moves.
    val quiet = (1 to 34).map(i => (f"q$i%03d_quiet", 1.0, 1.0))
    val smeared = (35 to 40).map(i => (f"q$i%03d_smeared", 0.22, 0.10))
    val common = quiet ++ smeared
    val now = common.map(_._2).sum
    val before = common.map(_._3).sum
    // aggregate is inside the band — the old ratio-only guard stays quiet
    assert(Bench.varianceAlert(now, before).isEmpty)
    val prev = common.map { case (n, _, p) => n -> p }.toMap
    val results = common.map { case (n, t, _) => n -> Some(t) }
    val g = Bench.evalGuard(results, Right(prev), prevSuspect = false)
    assert(g.alertTrigger == Some("suspects"))
    assert(g.fileExtra.contains(""""variance_alert""""))
    assert(g.fileExtra.contains(""""trigger":"suspects""""))
    // broad slow-direction spread also stamps the run suspect
    assert(g.runSuspect)
    assert(g.fileExtra.contains(""""suspect":true"""))
  }

  test("a localized real regression (1-2 suspects) does not fire the broad trigger") {
    val common = Seq(
      ("q104_inverted_index", 6.63, 0.98), // one real-looking spike
      ("q91_line_dedup", 0.82, 0.79),
      ("q31_neardup_jaccard", 1.05, 0.97),
      ("q38_ann_pq", 1.85, 1.80),
      ("q39_ann_ivfpq", 3.30, 3.32),
      ("q30_dedup_exact", 0.50, 0.49),
      ("q83_bpe_train", 0.71, 0.70)
    )
    val prev = common.map { case (n, _, p) => n -> p }.toMap
    val results = common.map { case (n, t, _) => n -> Some(t) }
    val g = Bench.evalGuard(results, Right(prev), prevSuspect = false)
    // 1 suspect < threshold max(3, 1) — suspects listed but no alert
    // (aggregate 14.86 vs 9.05 = 1.64 DOES trip the ratio leg, correctly)
    assert(g.alertTrigger.exists(_.startsWith("ratio")))
    assert(!g.alertTrigger.contains("suspects"))
  }

  test("stdout line stays under the driver's 2000-char window on a 150-query board with every guard field populated") {
    // synthetic 150-query board, full-length names, broad suspect spread,
    // variance alert, errors, local4 leg — the worst case that overflowed
    // in round 10 (2,087 chars with only 128 queries)
    val names = (1 to 150).map(i => f"q$i%03d_synthetic_operator_name_$i%03d")
    val results: Seq[(String, Option[Double])] =
      names.map(n => n -> Some(1.234567891)) :+ ("q999_crashy_query" -> None)
    val prev = names.map(_ -> 0.5).toMap // every query 2.47x off -> 150 suspects
    val g = Bench.evalGuard(results, Right(prev), prevSuspect = true)
    assert(g.alertTrigger.isDefined)
    assert(g.stdoutExtra.contains(""""variance_suspects":{"n":150}"""))
    // stdout guard extra never carries the full-name sample
    assert(!g.stdoutExtra.contains("synthetic_operator_name"))
    assert(g.fileExtra.contains("synthetic_operator_name")) // file keeps it
    // the r17 cost-class subtotals ride in the same extra slot — the
    // budget must hold with them present
    val subtotals =
      ""","batch_total":163.190,"streaming_total":22.000,"streaming_n":4"""
    val line = Bench.renderStdout(185.19, results, Seq("q999_crashy_query"),
      "/root/testdata/sf0.1", "32", 3, subtotals + g.stdoutExtra,
      Some((50.28, Seq.empty)))
    assert(line.length <= 2000, s"stdout line is ${line.length} chars")
    assert(line.startsWith("""{"metric":"total","value":"""))
    assert(line.contains(""""variance_alert""""))
    assert(line.contains(""""streaming_total""""))
    assert(line.endsWith("}"))
  }

  test("renderStdout with a 128-query board needs no truncation") {
    val names = (1 to 128).map(i => f"q$i%03d_operator")
    val results: Seq[(String, Option[Double])] = names.map(n => n -> Some(0.294))
    val line = Bench.renderStdout(37.6, results, Seq.empty,
      "/root/testdata/sf0.1", "32", 3, "", Some((50.28, Seq.empty)))
    assert(line.length <= Bench.stdoutBudget)
    assert(!line.contains("queries_omitted"))
    // all 128 short keys present
    assert((1 to 128).forall(i => line.contains(f""""q$i%03d":""")))
  }

  test("renderStdout survives a mass-failure board: headline inside budget") {
    // every query errored — the errors array alone would be ~4,700 chars
    val names = (1 to 144).map(i => f"q$i%03d_synthetic_operator_name_$i%03d")
    val results: Seq[(String, Option[Double])] = names.map(n => n -> None)
    val line = Bench.renderStdout(0.0, results, names,
      "/root/testdata/sf0.1", "32", 3, "", None)
    assert(line.length <= Bench.stdoutBudget, s"line is ${line.length} chars")
    assert(line.startsWith("""{"metric":"total","value":"""))
    // the error population is still reported, as a count at minimum
    assert(line.contains("errors"))
    assert(line.contains("144") || line.contains("more"))
  }

  test("uniform cross-box shift rebases the clean baseline; contention does not") {
    val names = (1 to 171).map(i => f"q$i%03d_op")
    val prev = names.map(_ -> 0.5).toMap
    // hardware-class shift: EVERY query uniformly 1.16x — no individual
    // suspect, no alert, but outside the ±12% clean band. Must be
    // accepted as clean-for-this-box with the rebase annotation (the r17
    // box sat at a flat 1.16x and could never re-enter the old VM's band)
    val uniform: Seq[(String, Option[Double])] = names.map(n => n -> Some(0.58))
    val gU = Bench.evalGuard(uniform, Right(prev), prevSuspect = false)
    assert(gU.cleanEligible, "uniform shift must re-seed the clean baseline")
    assert(gU.alertTrigger.isEmpty)
    assert(gU.fileExtra.contains(""""rebase""""))
    assert(gU.fileExtra.contains("uniform_cross_box_shift"))
    // the symmetric FAST direction (moved to a quicker box) rebases too
    val fast: Seq[(String, Option[Double])] = names.map(n => n -> Some(0.43))
    val gF = Bench.evalGuard(fast, Right(prev), prevSuspect = false)
    assert(gF.cleanEligible && gF.fileExtra.contains(""""rebase""""))
    // contention shape: same aggregate ratio but concentrated — a handful
    // of queries 3x while the rest sit at baseline. Suspects > max, so NO
    // rebase and NOT clean
    val nHot = 14
    val hot: Seq[(String, Option[Double])] = names.zipWithIndex.map { case (n, i) =>
      n -> Some(if (i < nHot) 1.5 else 0.5)
    }
    val gC = Bench.evalGuard(hot, Right(prev), prevSuspect = false)
    assert(!gC.cleanEligible, "a concentrated smear must not rebase")
    assert(!gC.fileExtra.contains(""""rebase""""))
    // a uniform shift big enough to fire the ratio alert stays manual
    val big: Seq[(String, Option[Double])] = names.map(n => n -> Some(0.65))
    val gB = Bench.evalGuard(big, Right(prev), prevSuspect = false)
    assert(!gB.cleanEligible && gB.alertTrigger.isDefined)
  }

  test("clean-baseline file naming mirrors the official pinning") {
    assert(Bench.cleanFileName(sf, "32") == "BENCH_CLEAN.json")
    assert(Bench.cleanFileName(sf, "8") == "BENCH_CLEAN_sf0.1_cpus8.json")
    assert(Bench.cleanFileName("/root/testdata/sf0.01", "32")
      == "BENCH_CLEAN_sf0.01_cpus32.json")
  }

  test("suspect stamp round-trips: a stamped snapshot is detected, a clean one is not") {
    assert(Bench.isSuspectSnapshot("""{"value":109.4,"suspect":true,"queries":{}}"""))
    assert(!Bench.isSuspectSnapshot(snapshot(sf, "32")))
    // a comparison against a suspect baseline is annotated, not trusted
    val results = Seq("q1_a" -> Some(1.5), "q2_b" -> Some(2.0))
    val prev = Map("q1_a" -> 1.5, "q2_b" -> 2.0)
    val g = Bench.evalGuard(results, Right(prev), prevSuspect = true)
    assert(g.fileExtra.contains(""""baseline_suspect":true"""))
    assert(g.stdoutExtra.contains(""""baseline_suspect":true"""))
    // identical timings vs baseline: no alert, run is clean
    assert(g.alertTrigger.isEmpty)
    assert(!g.runSuspect)
  }

  test("a clean faster run vs a contaminated baseline alerts but is NOT stamped suspect") {
    // the r10->r11 scenario: baseline 109 s contaminated, clean run ~50 s.
    // Most queries look 2x+ FASTER -> deflated suspects, ratio ~0.46.
    val names = (1 to 20).map(i => f"q$i%03d_op")
    val results: Seq[(String, Option[Double])] = names.map(n => n -> Some(0.5))
    val prev = names.map(_ -> 1.1).toMap
    val g = Bench.evalGuard(results, Right(prev), prevSuspect = true)
    assert(g.alertTrigger.isDefined) // loud, as it should be
    // but deflation is never evidence THIS run is contended: no suspect
    // stamp (baseline_suspect is annotated, which must not look like one)
    assert(!g.runSuspect)
    assert(!Bench.isSuspectSnapshot(g.fileExtra))
    assert(g.fileExtra.contains(""""baseline_suspect":true"""))
  }

  // --- round-12 hardening: the clean-refresh eligibility is STRICTER than
  // the alert thresholds ---------------------------------------------------

  test("the r11 clean-refresh hole: ratio 1.17 with 8 suspects is NOT clean-eligible") {
    // the exact round-11 incident shape: 143 common queries, aggregate
    // ratio ~1.166 (inside the ±25% alert band), 8 queries inflated >2x
    // (under the broad threshold of 15) — no alert fired, yet the run
    // refreshed BENCH_CLEAN.json with ~17%-inflated numbers. The clean
    // refresh must now refuse this run while the snapshot still writes.
    val inflated = (1 to 8).map(i => (f"q9$i%02d_inflated_op", 0.70, 0.30))
    val quiet = (1 to 135).map(i => (f"q$i%03d_quiet_op", 0.40, 0.355))
    val common = quiet ++ inflated
    val now = common.map(_._2).sum
    val before = common.map(_._3).sum
    val ratio = now / before
    assert(ratio > 1 + Bench.cleanBand && ratio < 1 + Bench.varianceBand,
      f"fixture must sit between the bands, got $ratio%.3f")
    val prev = common.map { case (n, _, p) => n -> p }.toMap
    val results = common.map { case (n, t, _) => n -> Some(t) }
    val g = Bench.evalGuard(results, Right(prev), prevSuspect = false)
    // neither alert trigger fires (the hole) ...
    assert(g.alertTrigger.isEmpty)
    assert(!g.runSuspect)
    // ... but the clean baseline is NOT refreshed (the fix)
    assert(!g.cleanEligible)
  }

  test("a genuinely quiet run IS clean-eligible; mild localized spikes stay eligible") {
    val quiet = (1 to 140).map(i => (f"q$i%03d_op", 0.36, 0.355))
    val prevQ = quiet.map { case (n, _, p) => n -> p }.toMap
    val resQ = quiet.map { case (n, t, _) => n -> Some(t) }
    val gQ = Bench.evalGuard(resQ, Right(prevQ), prevSuspect = false)
    assert(gQ.cleanEligible && !gQ.runSuspect)
    // up to cleanSuspectMax (3) inflated queries with aggregate in the
    // ±12% band: a real localized regression must still be measurable as
    // the new baseline, or the guard would pin CLEAN forever
    val spiky = quiet.take(137) ++ Seq(
      ("q900_spike_a", 0.90, 0.30), ("q901_spike_b", 0.80, 0.30),
      ("q902_spike_c", 0.70, 0.30))
    val prevS = spiky.map { case (n, _, p) => n -> p }.toMap
    val resS = spiky.map { case (n, t, _) => n -> Some(t) }
    val gS = Bench.evalGuard(resS, Right(prevS), prevSuspect = false)
    assert(gS.cleanEligible)
    // one more inflated query tips it over
    val over = quiet.take(136) ++ Seq(
      ("q900_spike_a", 0.90, 0.30), ("q901_spike_b", 0.80, 0.30),
      ("q902_spike_c", 0.70, 0.30), ("q903_spike_d", 0.70, 0.30))
    val gO = Bench.evalGuard(
      over.map { case (n, t, _) => n -> Some(t) },
      Right(over.map { case (n, _, p) => n -> p }.toMap), prevSuspect = false)
    assert(!gO.cleanEligible)
  }

  test("bootstrap: no comparable snapshot still seeds the clean baseline") {
    val g = Bench.evalGuard(Seq("q1_a" -> Some(1.0)), Left("no_previous_snapshot"),
      prevSuspect = false)
    assert(g.cleanEligible)
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

  test("retry-until-clean: first clean-eligible draw becomes the official record") {
    // the r12 scenario: contended first draw, clean second — official
    // record must be the clean one, accepted as "clean"
    assert(Bench.selectDraw(Seq((109.45, false), (51.70, true))) == (1, "clean"))
    // a clean FIRST draw short-circuits (no later draw considered)
    assert(Bench.selectDraw(Seq((51.42, true))) == (0, "clean"))
    // every draw contaminated: fall back to the min-total draw (contention
    // only inflates, so min-total is least-contaminated), slug says so
    assert(Bench.selectDraw(Seq((109.45, false), (98.2, false), (103.0, false)))
      == (1, "min_total_fallback"))
  }

  test("fallback draws are stamped record:false on EVERY output line (r15 task 5)") {
    // the r15 failure: the end-of-round stdout (snapshotted verbatim as
    // BENCH_r15.json) carried accepted:"min_total_fallback" but nothing
    // machine-readable saying "not a record" — the contaminated number
    // shipped as the round's record. The draws object now carries an
    // explicit record flag, same string on stdout and in BENCH_LOCAL.json.
    assert(Bench.drawsJson(3, "min_total_fallback")
      == ""","draws":{"n":3,"accepted":"min_total_fallback","record":false}""")
    assert(Bench.drawsJson(1, "clean")
      == ""","draws":{"n":1,"accepted":"clean","record":true}""")
  }

  test("record diff catches the q116-class round-over-round move (r17 task 3)") {
    // q116 r16→r17: 2.59 → 3.94 s (+52%, +1.35 s) passed the 2× in-session
    // suspect scan; the committed-record band (>40% AND >0.5 s) must flag it
    val rec = Map("q116_image_neardup" -> 2.59, "q38_pq" -> 3.46, "q48b_x" -> 1.68)
    val now = Seq(
      "q116_image_neardup" -> Some(3.94), // regression: must flag
      "q38_pq" -> Some(2.34),             // improvement past 1/1.4, >0.5 s: flag
      "q48b_x" -> Some(1.30),             // -23%, inside the band: quiet
      "q_new" -> Some(9.0),               // not in the record: quiet
      "q_err" -> None)                    // errored: quiet
    val susp = Bench.recordSuspects(now, rec)
    assert(susp.map(_._1) == Seq("q116_image_neardup", "q38_pq"), susp.toString)
  }

  test("record diff ignores small-absolute and in-band moves") {
    // 2× on a 0.2 s query is noise (below the 0.5 s floor); 1.3× on a big
    // query is inside the 40% band
    val rec = Map("tiny" -> 0.2, "big" -> 10.0)
    assert(Bench.recordSuspects(
      Seq("tiny" -> Some(0.45), "big" -> Some(13.0)), rec).isEmpty)
    // but a 1.5× move on the big query fires
    assert(Bench.recordSuspects(Seq("big" -> Some(15.0)), rec).map(_._1) == Seq("big"))
    // and symmetric in the fast direction (1/1.5 with >0.5 s delta)
    assert(Bench.recordSuspects(Seq("big" -> Some(6.0)), rec).map(_._1) == Seq("big"))
  }
}
