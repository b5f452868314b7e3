package graft.olap

import graft.{SparkEntry, SparkSuite}
import graft.core.Tables
import org.apache.spark.sql.functions._

/** q144's contract: the bucketed prefix-max skyline is EXACTLY the
  * dominance-based Pareto frontier (the naive quadratic definition the
  * operator exists to avoid at corpus scale). */
class SkylineSpec extends SparkSuite {

  test("skyline equals the brute-force dominance frontier per flag") {
    val pts = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"), col("l_extendedprice"))
      .agg(max(col("l_discount")).as("d"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    val expected = pts.groupBy(_._1).toSeq.flatMap { case (flag, ps) =>
      ps.filter { case (_, p, d) =>
        !ps.exists { case (_, p2, d2) =>
          p2 >= p && d2 >= d && (p2 > p || d2 > d) }
      }.map { case (_, p, d) => (flag, p, d) }.toSeq
    }.toSet
    val got = SparkEntry.queries("q144_skyline")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSet
    assert(got == expected,
      s"frontier diverged: extra=${got -- expected}, missing=${expected -- got}")
    assert(got.nonEmpty)
  }

  test("frontier is strictly monotone: descending price implies ascending discount") {
    SparkEntry.queries("q144_skyline")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
      .groupBy(_._1).foreach { case (flag, rows) =>
        val byPriceDesc = rows.sortBy(-_._2)
        byPriceDesc.sliding(2).foreach {
          case Array((_, p1, d1), (_, p2, d2)) =>
            assert(p1 > p2 && d2 > d1, s"$flag frontier not strictly monotone")
          case _ =>
        }
      }
  }
}
