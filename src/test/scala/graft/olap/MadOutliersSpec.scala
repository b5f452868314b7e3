package graft.olap

import graft.{SparkEntry, SparkSuite}
import graft.core.Tables
import org.apache.spark.sql.functions._

/** q146's contract: med/MAD match a driver-side exact computation and the
  * fence census counts exactly the values beyond 3·1.4826·MAD. */
class MadOutliersSpec extends SparkSuite {

  test("median, MAD and outlier census match the brute force") {
    val vals = Tables.events(spark, sfDir)
      .select(col("event_type"), col("value")).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).map { case (t, vs) => t -> vs.map(_._2).sorted.toIndexedSeq }
    def median(s: IndexedSeq[Double]): Double = {
      val n = s.length
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
    }
    val rows = SparkEntry.queries("q146_mad_outliers")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4)))
    assert(rows.map(_._1).toSet == vals.keySet)
    rows.foreach { case (t, n, medR, madR, outliers) =>
      val s = vals(t)
      val med = median(s)
      val mad = median(s.map(v => math.abs(v - med)).sorted)
      assert(n == s.length)
      assert(math.abs(medR - med) < 1e-6, s"$t median $medR vs $med")
      assert(math.abs(madR - mad) < 1e-6, s"$t MAD $madR vs $mad")
      val expected = s.count(v => math.abs(v - med) > 4.4478 * mad).toLong
      assert(outliers == expected, s"$t outliers $outliers vs $expected")
    }
  }
}
