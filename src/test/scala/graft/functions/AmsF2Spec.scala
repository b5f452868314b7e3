package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.core.Tables

/** AmsF2Agg's contract: partitioning-independent sketch state
  * (element-wise merge), a loud geometry mismatch, SQL parity, and the
  * estimate landing within the pinned band on the spec corpus. */
class AmsF2Spec extends SparkSuite {

  private def users = Tables.events(spark, sfDir).select(col("user_id"))

  test("estimate is partitioning-independent and lands within the band") {
    def est(parts: Int): Long = users.repartition(parts)
      .agg(AmsF2Agg.amsF2(col("user_id"), 512)).head().getLong(0)
    val (e1, e7) = (est(1), est(7))
    assert(e1 === e7, "merge is not element-wise associative")
    val exact = users.groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .agg(sum(col("n") * col("n"))).head().getLong(0)
    assert(e1 >= (exact * 0.75).toLong && e1 <= (exact * 1.25).toLong,
      s"estimate $e1 outside ±25% of $exact")
  }

  test("geometry mismatch on deserialize fails loudly") {
    val agg512 = AmsF2Agg(
      org.apache.spark.sql.catalyst.expressions.Literal(1L), 512)
    val agg64 = AmsF2Agg(
      org.apache.spark.sql.catalyst.expressions.Literal(1L), 64)
    val bytes = agg64.serialize(agg64.createAggregationBuffer())
    val e = intercept[IllegalArgumentException](agg512.deserialize(bytes))
    assert(e.getMessage.contains("geometry mismatch"))
  }

  test("SQL registration parity: graft_ams_f2") {
    users.createOrReplaceTempView("ams_users")
    val viaSql = spark.sql(
      "SELECT graft_ams_f2(user_id, 512) FROM ams_users").head().getLong(0)
    val viaColumn = users.agg(AmsF2Agg.amsF2(col("user_id"), 512))
      .head().getLong(0)
    assert(viaSql === viaColumn)
  }
}
