package graft.olap

import graft.{SparkEntry, SparkSuite}
import graft.core.Tables
import org.apache.spark.sql.functions._

/** q148's contract: the densified grid is complete and hourly-contiguous,
  * gaps are exactly the 0-count cells, and the forward fill carries the
  * last OBSERVED total (never inventing data before the first point). */
class GapFillSpec extends SparkSuite {

  private lazy val rows = SparkEntry.queries("q148_gap_fill")(spark, sfDir)
    .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
      if (r.isNullAt(3)) None else Some(r.getDouble(3)), r.getBoolean(4)))

  test("the grid is the full hour range for every type") {
    val types = Tables.events(spark, sfDir).select(col("event_type"))
      .distinct().count()
    val hours = rows.map(_._2)
    val expectedHours = ((hours.max - hours.min) / 3600000000L + 1) * types
    assert(rows.length == expectedHours, s"${rows.length} vs $expectedHours grid cells")
    rows.groupBy(_._1).foreach { case (t, rs) =>
      val hs = rs.map(_._2).sorted
      hs.sliding(2).foreach {
        case Array(a, b) => assert(b - a == 3600000000L, s"$t grid not contiguous")
        case _ =>
      }
    }
  }

  test("gaps are exactly the empty cells; fill carries the last observation") {
    rows.foreach { case (t, _, n, total, isGap) =>
      assert(isGap == (n == 0), s"$t is_gap must mirror n_events == 0")
      if (!isGap) assert(total.nonEmpty, s"$t observed cell must carry its total")
    }
    rows.groupBy(_._1).foreach { case (t, rs) =>
      var lastSeen: Option[Double] = None
      rs.sortBy(_._2).foreach { case (_, h, n, total, isGap) =>
        if (!isGap) lastSeen = total
        assert(total == lastSeen, s"$t@$h forward fill diverged: $total vs $lastSeen")
      }
    }
  }
}
