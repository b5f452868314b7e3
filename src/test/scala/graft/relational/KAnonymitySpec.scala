package graft.relational

import graft.{SparkEntry, SparkSuite}
import graft.core.Tables
import org.apache.spark.sql.functions._

/** q145's contract: the generalization ladder assigns each record the
  * MINIMAL level whose class reaches k=5, levels partition the corpus,
  * and the ladder is monotone (generalizing can only grow classes). */
class KAnonymitySpec extends SparkSuite {

  private lazy val rows = SparkEntry.queries("q145_k_anonymity")(spark, sfDir)
    .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))

  test("levels partition the customer corpus; shares sum to ~10000 bp") {
    val total = Tables.customer(spark, sfDir).count()
    assert(rows.map(_._2).sum == total, "every record lands on exactly one level")
    val bp = rows.map(_._3).sum
    assert(bp >= 10000 - rows.length && bp <= 10000, s"floor-division shares: $bp")
  }

  test("ladder equals the driver-side brute-force minimal level") {
    val cust = Tables.customer(spark, sfDir)
      .select(col("c_nationkey"), col("c_mktsegment"), col("c_acctbal"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getDouble(2)))
    def lvl(recs: Array[(Int, String, Double)]): Map[Int, Long] = {
      val n0 = recs.groupBy(t => (t._1, t._2, math.floor(t._3 / 500).toLong)).map { case (k, v) => k -> v.length }
      val n1 = recs.groupBy(t => (t._1, t._2, math.floor(t._3 / 2000).toLong)).map { case (k, v) => k -> v.length }
      val n2 = recs.groupBy(t => (t._1, t._2)).map { case (k, v) => k -> v.length }
      val n3 = recs.groupBy(_._1).map { case (k, v) => k -> v.length }
      recs.map { t =>
        if (n0((t._1, t._2, math.floor(t._3 / 500).toLong)) >= 5) 0
        else if (n1((t._1, t._2, math.floor(t._3 / 2000).toLong)) >= 5) 1
        else if (n2((t._1, t._2)) >= 5) 2
        else if (n3(t._1) >= 5) 3 else 4
      }.groupBy(identity).map { case (l, xs) => l -> xs.length.toLong }
    }
    val expected = lvl(cust)
    assert(rows.map(r => r._1 -> r._2).toMap == expected)
  }
}
