package graft.text

import graft.{SparkEntry, SparkSuite}
import graft.core.Tables
import org.apache.spark.sql.functions._

/** q154's contract: the distributed per-signal ranks are true global
  * ranks (a permutation of 1..n), the ensemble sum is their exact sum,
  * and the output is the global top-200 by rank sum. */
class QualityEnsembleSpec extends SparkSuite {

  private lazy val rows = SparkEntry.queries("q154_quality_ensemble")(spark, sfDir)
    .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getLong(5)))

  private lazy val corpusN = Tables.documents(spark, sfDir)
    .filter(length(col("text")) > 0).count()

  test("ranks are bounded global ranks and the sum column is exact") {
    assert(rows.nonEmpty && rows.length <= 200)
    rows.foreach { case (_, r1, r2, r3, r4, s) =>
      Seq(r1, r2, r3, r4).foreach(r => assert(r >= 1 && r <= corpusN))
      assert(s == r1 + r2 + r3 + r4)
    }
    val sums = rows.map(_._6)
    assert(sums.sorted.toSeq == sums.toSeq, "output ordered by rank_sum")
  }

  test("the winner beats a driver-side recount on every signal's average") {
    // the best ensemble doc must have a strictly better mean rank than the
    // corpus average mean rank ((n+1)/2 per signal) — a sanity floor that
    // catches inverted rank directions
    val best = rows.head._6 / 4.0
    assert(best < (corpusN + 1) / 2.0, s"winner mean rank $best not above average")
  }

  test("each rank column is collision-free across the output") {
    Seq[((Long, Long, Long, Long, Long, Long)) => Long](
      _._2, _._3, _._4, _._5).foreach { f =>
      val rs = rows.map(f)
      assert(rs.distinct.length == rs.length, "duplicate global rank in a signal")
    }
  }
}
