package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.core.Caching._
import graft.core.Tables

/** CountMinAgg's contract: never an underestimate for ANY key (the
  * one-sided guarantee, checked exhaustively over the corpus
  * vocabulary), partitioning-independent sketch bytes (element-wise
  * merge), geometry round-trip, and SQL-registered parity. */
class CountMinSpec extends SparkSuite {

  private def toks = Tables.documents(spark, sfDir)
    .select(explode(expr("filter(split(text, ' '), x -> x != '')")).as("token"))

  test("estimates never undercount, for every key in the vocabulary") {
    val sketch = toks.agg(
      CountMinAgg.countMin(col("token"), 4, 2048).as("sk")).planCache()
    val exact = toks.groupBy(col("token")).agg(count(lit(1)).as("n"))
    val checked = exact.crossJoin(broadcast(sketch))
      .withColumn("est", CountMinEstimateExpr.cmEstimate(col("sk"), col("token")))
    assert(checked.filter(col("est") < col("n")).count() === 0,
      "a count-min estimate undercounted")
    // the sf0.001 synthetic corpus draws from a ~31-word vocabulary —
    // exhaustive over it; larger SFs widen it and the gate re-checks
    assert(exact.count() > 20, "vocabulary too small for a meaningful check")
  }

  test("sketch bytes are partitioning-independent (element-wise merge)") {
    def bytes(parts: Int): Seq[Byte] = toks.repartition(parts)
      .agg(CountMinAgg.countMin(col("token"), 4, 256).as("sk"))
      .head().getAs[Array[Byte]]("sk").toSeq
    assert(bytes(1) === bytes(7))
  }

  test("geometry mismatch on deserialize fails loudly") {
    val sk = toks.agg(CountMinAgg.countMin(col("token"), 4, 256).as("sk"))
      .head().getAs[Array[Byte]]("sk")
    val agg = CountMinAgg(
      org.apache.spark.sql.catalyst.expressions.Literal("x"), 4, 512)
    val e = intercept[IllegalArgumentException](agg.deserialize(sk))
    assert(e.getMessage.contains("geometry mismatch"))
  }

  test("SQL registration parity: graft_count_min / graft_cm_estimate") {
    toks.createOrReplaceTempView("cm_toks")
    val viaSql = spark.sql(
      """SELECT graft_cm_estimate(graft_count_min(token, 4, 256), 'the')
        |FROM cm_toks""".stripMargin).head().getLong(0)
    val viaColumn = {
      val sk = toks.agg(CountMinAgg.countMin(col("token"), 4, 256).as("sk"))
      sk.select(CountMinEstimateExpr.cmEstimate(col("sk"), lit("the")))
        .head().getLong(0)
    }
    assert(viaSql === viaColumn)
    val exact = toks.filter(col("token") === "the").count()
    assert(viaSql >= exact)
  }
}
