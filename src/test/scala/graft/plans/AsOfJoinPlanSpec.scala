package graft.plans

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The custom whole-operator as-of join: bit-equal to the composed
  * join+window form, the promised merge plan shape, and the semantic
  * edges (backward inclusive bound, tie-break, no-match drop, nulls). */
class AsOfJoinPlanSpec extends SparkSuite {

  private def ts(min: Int) = Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")

  test("q13b equals the composed q13 row for row on the fixture") {
    val a = graft.queries.RelationalQueries.asofPurchaseError(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    val b = graft.queries.RelationalQueries.asofMergeOperator(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(a.nonEmpty)
    assert(b === a)
  }

  test("plan shape: AsOfJoinExec present, no join pair-stream, no window") {
    val p = graft.queries.RelationalQueries.asofMergeOperator(spark, sfDir)
      .queryExecution.executedPlan.toString
    // AsOfJoinExec prints as "AsOfJoin" (SparkPlan nodeName strips Exec)
    assert(p.contains("AsOfJoin"), s"custom exec not planned in:\n$p")
    // the whole point: no pair-materializing join and no rn=1 window
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
      s"a generic join appeared next to the merge operator in:\n$p")
    assert(!p.contains("Window"), s"window reappeared in:\n$p")
  }

  test("semantics: inclusive backward bound, max-(time,tie) pick, no-match dropped, nulls never match") {
    import spark.implicits._
    val left = Seq(
      (1L, ts(10), 100L),  // matches right@10 (inclusive) — and the MAX tie at that ts
      (1L, ts(5), 101L),   // matches right@4
      (2L, ts(8), 102L),   // no earlier right for key 2 -> dropped
      (3L, ts(9), 103L)    // key absent on right -> dropped
    ).toDF("k", "t", "lid")
    val right = Seq(
      (1L, ts(4), 200L),
      (1L, ts(10), 201L), // equal ts as left@10...
      (1L, ts(10), 205L), // ...tie-break picks the larger rid
      (1L, ts(12), 202L), // after every left -> never picked
      (2L, ts(9), 203L)   // after left@8 -> no match for key 2
    ).toDF("rk", "rt", "rid")
    val got = AsOfJoinOps.asof(left, right, "k", "rk", "t", "rt", "rid")
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(got === Seq((100L, 205L), (101L, 200L)))

    // null keys/times on either side never match and never crash the merge
    val leftN = Seq((Some(1L), Some(ts(10)), 100L), (None, Some(ts(10)), 101L),
      (Some(1L), None, 102L)).toDF("k", "t", "lid")
    val rightN = Seq((Some(1L), Some(ts(4)), 200L), (None, Some(ts(1)), 201L),
      (Some(1L), None, 202L)).toDF("rk", "rt", "rid")
    val gotN = AsOfJoinOps.asof(leftN, rightN, "k", "rk", "t", "rt", "rid")
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(gotN === Seq((100L, 200L)))
  }

  test("outer mode keeps unmatched and null-key left rows with a null right side") {
    import spark.implicits._
    val left = Seq((1L, ts(10), 100L), (2L, ts(8), 102L), (3L, ts(9), 103L))
      .toDF("k", "t", "lid")
    val right = Seq((1L, ts(4), 200L), (2L, ts(9), 203L)).toDF("rk", "rt", "rid")
    val got = AsOfJoinOps.asof(left, right, "k", "rk", "t", "rt", "rid", outer = true)
      .select("lid", "rid").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toSeq.sortBy(_._1)
    assert(got === Seq((100L, Some(200L)), (102L, None), (103L, None)))
    // a null-key left row survives outer mode too (matches the LEFT JOIN oracle)
    val leftN = Seq((Some(1L), ts(10), 100L), (None, ts(5), 101L)).toDF("k", "t", "lid")
    val gotN = AsOfJoinOps.asof(leftN, right, "k", "rk", "t", "rt", "rid", outer = true)
      .select("lid", "rid").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toSeq.sortBy(_._1)
    assert(gotN === Seq((100L, Some(200L)), (101L, None)))
  }

  test("mismatched key/time types fail at build time, not with wrong results") {
    import spark.implicits._
    // Int vs Long keys hash to different partitions for equal values —
    // a silent empty result without this guard
    val l = Seq((1, ts(1), 1L)).toDF("k", "t", "lid")
    val r = Seq((1L, ts(1), 2L)).toDF("rk", "rt", "rid")
    val err = intercept[IllegalArgumentException] {
      AsOfJoinOps.asof(l, r, "k", "rk", "t", "rt", "rid")
    }
    assert(err.getMessage.contains("key types differ"))
    val l2 = Seq((1L, 5L, 1L)).toDF("k", "t", "lid") // bigint time vs timestamp
    val r2 = Seq((1L, ts(1), 2L)).toDF("rk", "rt", "rid")
    val err2 = intercept[IllegalArgumentException] {
      AsOfJoinOps.asof(l2, r2, "k", "rk", "t", "rt", "rid")
    }
    assert(err2.getMessage.contains("time types differ"))
  }

  test("signed-zero double keys match: -0.0 and 0.0 are one key under SQL equality") {
    import spark.implicits._
    // Double.compareTo orders -0.0 < 0.0; without normalization a -0.0
    // left key silently never matches a 0.0 right key (ADVICE r8)
    val l = Seq((-0.0d, ts(10), 100L), (0.0d, ts(11), 101L)).toDF("k", "t", "lid")
    val r = Seq((0.0d, ts(4), 200L), (-0.0d, ts(5), 201L)).toDF("rk", "rt", "rid")
    val got = AsOfJoinOps.asof(l, r, "k", "rk", "t", "rt", "rid")
      .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSeq.sorted
    assert(got === Seq((100L, 201L), (101L, 201L)))
  }

  test("overlapping column names fail loudly before planning") {
    import spark.implicits._
    val l = Seq((1L, ts(1), 1L)).toDF("k", "t", "id")
    val r = Seq((1L, ts(1), 2L)).toDF("rk", "rt", "id") // 'id' collides
    val err = intercept[IllegalArgumentException] {
      AsOfJoinOps.asof(l, r, "k", "rk", "t", "rt", "id")
    }
    assert(err.getMessage.contains("disjoint"))
  }
}
