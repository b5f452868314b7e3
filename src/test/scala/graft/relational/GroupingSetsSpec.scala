package graft.relational

import graft.{SparkEntry, SparkSuite}
import graft.core.Tables

/** q149's contract: the four grains are mutually consistent — every
  * coarser grain is the exact fold of the finest — and grouping_id
  * distinguishes rolled-up keys from genuine NULLs. */
class GroupingSetsSpec extends SparkSuite {

  private lazy val rows = SparkEntry.queries("q149_grouping_sets")(spark, sfDir)
    .collect().map(r => (Option(r.getString(0)), Option(r.getString(1)),
      r.getInt(2), r.getLong(3), r.getDouble(4)))

  test("grain counts fold exactly into every coarser grain") {
    val fine = rows.filter(_._3 == 0)
    val byFlag = rows.filter(_._3 == 1)
    val byStatus = rows.filter(_._3 == 2)
    val grand = rows.filter(_._3 == 3)
    assert(grand.length == 1 && grand.head._1.isEmpty && grand.head._2.isEmpty)
    assert(fine.map(_._4).sum == grand.head._4, "fine counts sum to grand total")
    byFlag.foreach { case (f, s, _, n, _) =>
      assert(s.isEmpty)
      assert(fine.filter(_._1 == f).map(_._4).sum == n, s"flag $f fold")
    }
    byStatus.foreach { case (f, s, _, n, _) =>
      assert(f.isEmpty)
      assert(fine.filter(_._2 == s).map(_._4).sum == n, s"status $s fold")
    }
  }

  test("gid encodes which keys are rolled up, and totals match the table") {
    rows.foreach { case (f, s, gid, _, _) =>
      assert((gid & 2) == 0 ^ f.isEmpty, s"gid $gid vs flag $f")
      assert((gid & 1) == 0 ^ s.isEmpty, s"gid $gid vs status $s")
    }
    val total = Tables.lineitem(spark, sfDir).count()
    assert(rows.filter(_._3 == 3).head._4 == total)
  }
}
