package graft.relational

import graft.{SparkEntry, SparkSuite}
import org.apache.spark.sql.functions._

/** q122's fixed-point invariants — what the row-level oracle can't
  * state: the 0.15 floor, dangling-node behavior, and mass bounds
  * under integer truncation. */
class PagerankSpec extends SparkSuite {

  test("every rank is >= the 0.15 floor; isolated parts sit exactly on it") {
    val out = SparkEntry.queries("q122_pagerank")(spark, sfDir).cache()
    try {
      assert(out.filter(col("r") < 150000L).count() === 0)
      // parts that never co-occur (single-line orders only) receive no
      // contributions: after iteration 1 they sit at the floor and stay
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
        .select(col("l_orderkey"), col("l_partkey"))
      val paired = li.as("a").join(li.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") =!= col("b.l_partkey"))
        .select(col("a.l_partkey").as("node")).distinct()
      val isolated = out.join(paired, Seq("node"), "left_anti")
      assert(isolated.filter(col("r") =!= 150000L).count() === 0,
        "a dangling node drifted off the 0.15 floor")
    } finally out.unpersist()
  }

  test("total mass never exceeds N (integer truncation only loses mass)") {
    val out = SparkEntry.queries("q122_pagerank")(spark, sfDir)
    val agg = out.agg(sum("r").cast("long"), count(lit(1))).head
    val (mass, n) = (agg.getLong(0), agg.getLong(1))
    assert(mass <= n * 1000000L, s"mass $mass exceeds ${n}e6")
    assert(mass >= n * 150000L)
  }
}
