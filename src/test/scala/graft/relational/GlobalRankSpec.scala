package graft.relational

import graft.{SparkEntry, SparkSuite}
import org.apache.spark.sql.functions._

/** q120's execution-shape and allocation invariants: exact global
  * ranks with no corpus-wide single-partition window, and the
  * SQL-standard ntile fill rule. */
class GlobalRankSpec extends SparkSuite {

  test("ranks are a permutation of 1..N and deciles partition by the fill rule") {
    val out = SparkEntry.queries("q120_global_rank")(spark, sfDir)
    val rows = out.collect()
    val n = rows.length
    assert(n > 0)
    val ranks = rows.map(_.getLong(2)).sorted
    assert(ranks.head === 1L && ranks.last === n.toLong &&
      ranks.distinct.length === n, "global_rank must be a permutation of 1..N")
    // SQL-standard ntile: first N % 10 tiles carry one extra row
    val sizes = rows.groupBy(_.getLong(3)).map { case (t, rs) => t -> rs.length }
    val (big, small) = (n / 10 + 1, n / 10)
    val nBig = n % 10
    (1 to math.min(10, n)).foreach { t =>
      val expected = if (t <= nBig) big else small
      if (expected > 0)
        assert(sizes.getOrElse(t.toLong, 0) === expected,
          s"tile $t: expected $expected rows")
    }
  }

  test("no corpus-wide single-partition window: range shuffle + P-row offsets") {
    val out = SparkEntry.queries("q120_global_rank")(spark, sfDir)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("rangepartitioning"),
      s"global order must come from a range shuffle:\n$plan")
    // the in-range ranking window must be partitioned (by pid), never a
    // corpus-wide Window with an empty partition spec
    val rankWindows = "Window \\[row_number".r.findAllIn(plan).toList
    assert(rankWindows.nonEmpty && plan.contains("windowspecdefinition(pid"),
      s"row_number must run per range partition:\n$plan")
  }

  test("offsets consumer REUSES the range exchange; documents scanned once") {
    // ADVICE r15: the single-scan cost claim rested on an unasserted
    // ReusedExchange — if reuse breaks, the range sampler re-derives
    // boundaries for a second scan and correctness of the pid offsets
    // becomes implicit. Pin it like ImageNeardupSpec does.
    val out = SparkEntry.queries("q120_global_rank")(spark, sfDir)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // AQE prints a reused stage's subtree verbatim (same ids), so count
    // PHYSICAL exchanges by distinct plan_id, and detect reuse as a
    // ShuffleQueryStage id appearing under two parents
    val dataRangeIds = "Exchange rangepartitioning\\(n_chars[^\\n]*plan_id=(\\d+)".r
      .findAllMatchIn(plan).map(_.group(1)).toList
    val stageIds = "ShuffleQueryStage (\\d+)".r.findAllMatchIn(plan).map(_.group(1)).toList
    val reused = plan.contains("ReusedExchange") ||
      stageIds.distinct.length < stageIds.length
    assert(dataRangeIds.nonEmpty && dataRangeIds.distinct.length == 1 && reused,
      s"both consumers must share ONE physical range exchange " +
        s"(dataRangeIds=$dataRangeIds reused=$reused):\n$plan")
  }
}
