package graft.olap

import graft.{SparkEntry, SparkSuite}
import graft.core.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** q139's contract: the bucketed distributed CDF equals the naive global
  * prefix-sum KS derivation exactly, in integer arithmetic. */
class KsDriftSpec extends SparkSuite {

  test("bucketed KS equals the naive global-window derivation") {
    val fast = SparkEntry.queries("q139_ks_drift")(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    val e = Tables.events(spark, sfDir)
      .select(col("value"), (col("event_id") % 2 === 0).as("is_a"))
    val Array(n1, n2) = e.agg(
      sum(when(col("is_a"), 1L).otherwise(0L)),
      sum(when(!col("is_a"), 1L).otherwise(0L)))
      .head().toSeq.map(_.asInstanceOf[Long]).toArray
    // the naive single-partition window the operator exists to avoid
    val w = Window.orderBy(col("value"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val slow = e.groupBy(col("value")).agg(
      sum(when(col("is_a"), 1L).otherwise(0L)).as("a_n"),
      sum(when(!col("is_a"), 1L).otherwise(0L)).as("b_n"))
      .withColumn("a_cum", sum(col("a_n")).over(w))
      .withColumn("b_cum", sum(col("b_n")).over(w))
      // decimal, mirroring the operator's overflow-proof arithmetic
      .withColumn("diff", abs(col("a_cum").cast("decimal(38,0)") * n2 -
        col("b_cum").cast("decimal(38,0)") * n1))
      .orderBy(desc("diff"), asc("value")).limit(1)
      .select(lit(n1).as("n1"), lit(n2).as("n2"),
        col("diff").cast("long").as("ks_num"),
        col("value").as("at_value"),
        expr(s"diff * 10000 div ${n1 * n2}").as("ks_bp"))
      .collect().map(_.toSeq).toSeq
    assert(fast == slow, s"KS diverged: $fast vs $slow")
  }

  test("the statistic is a valid normalized distance") {
    val r = SparkEntry.queries("q139_ks_drift")(spark, sfDir).head()
    val (n1, n2, bp) = (r.getLong(0), r.getLong(1), r.getLong(4))
    val num = r.getLong(2)
    assert(n1 > 0 && n2 > 0)
    assert(num >= 0 && num <= n1 * n2, "numerator bounded by n1*n2")
    assert(bp >= 0 && bp <= 10000, "D in [0,1] as basis points")
  }
}
