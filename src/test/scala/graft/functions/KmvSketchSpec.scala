package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** KMV distinct sketch: exactness below k, estimator error in the
  * estimation regime, merge/partitioning invariance, and the pair
  * (set-algebra) read path. */
class KmvSketchSpec extends SparkSuite {
  import KmvPairExpr.kmvPair
  import KmvSketchAgg.kmvSketch

  private def pairRow(dfA: Seq[Long], dfB: Seq[Long], k: Int): (Double, Double, Double, Double, Double) = {
    import spark.implicits._
    val df = dfA.map(("a", _)) ++ dfB.map(("b", _))
    val sk = df.toDF("g", "v")
      .groupBy(col("g")).agg(kmvSketch(xxhash64(col("v")), k).as("sk"))
    val r = sk.filter(col("g") === "a").as("x")
      .crossJoin(sk.filter(col("g") === "b").as("y"))
      .select(kmvPair(col("x.sk"), col("y.sk")).as("e"))
      .select("e.est_a", "e.est_b", "e.est_union", "e.est_jaccard", "e.est_intersection")
      .collect()(0)
    (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
  }

  test("below k every estimate is exact (sketch IS the distinct set)") {
    val a = (1L to 80L).toSeq
    val b = (41L to 120L).toSeq // |A|=80, |B|=80, inter=40, union=120
    val (ea, eb, eu, ej, ei) = pairRow(a, b, k = 256)
    assert(ea === 80.0 && eb === 80.0 && eu === 120.0)
    assert(math.abs(ej - 40.0 / 120.0) < 1e-12)
    assert(math.abs(ei - 40.0) < 1e-9)
  }

  test("estimation regime: cardinality within ~4 std errors, repeated values ignored") {
    import spark.implicits._
    val k = 256
    val n = 20000
    // each value appears 3 times — distinct semantics must dedup
    val vals = (1L to n.toLong).flatMap(v => Seq(v, v, v))
    val sk = vals.toDF("v").agg(kmvSketch(xxhash64(col("v")), k).as("sk"))
    val est = sk.crossJoin(sk.withColumnRenamed("sk", "sk2"))
      .select(kmvPair(col("sk"), col("sk2")).as("e")).select("e.est_a").collect()(0).getDouble(0)
    val rsd = 1.0 / math.sqrt(k - 1) // Beyer et al. 2007
    assert(math.abs(est - n) / n < 4 * rsd, s"est $est vs $n")
  }

  test("merge is partitioning-invariant: 1 vs 13 partitions, same sketch bytes") {
    import spark.implicits._
    val vals = (1L to 5000L).toSeq
    def sketchBytes(parts: Int): Seq[Byte] =
      vals.toDF("v").repartition(parts)
        .agg(kmvSketch(xxhash64(col("v")), 128)).collect()(0).getAs[Array[Byte]](0).toSeq
    assert(sketchBytes(1) === sketchBytes(13))
  }

  test("jaccard/intersection estimates track planted overlap") {
    val n = 8000
    val a = (1L to n.toLong).toSeq
    val b = (n / 2L + 1L to n / 2L + n.toLong).toSeq // J = 1/3, inter = n/2
    val (_, _, _, ej, ei) = pairRow(a, b, k = 1024)
    assert(math.abs(ej - 1.0 / 3.0) < 0.05, s"jaccard $ej")
    assert(math.abs(ei - n / 2.0) / (n / 2.0) < 0.2, s"intersection $ei")
  }

  test("disjoint sets estimate ~zero intersection") {
    val a = (1L to 5000L).toSeq
    val b = (100001L to 105000L).toSeq
    val (_, _, _, ej, ei) = pairRow(a, b, k = 512)
    assert(ej < 0.02 && ei < 200.0, s"j=$ej inter=$ei")
  }

  test("SQL registration: graft_kmv + graft_kmv_pair compose in SQL text") {
    import spark.implicits._
    (1L to 1000L).map(v => (if (v % 2 == 0) "even" else "odd", v)).toDF("g", "v")
      .createOrReplaceTempView("kmv_t")
    val rows = spark.sql(
      """SELECT a.g, b.g, graft_kmv_pair(a.sk, b.sk).est_jaccard AS j
        |FROM (SELECT g, graft_kmv(xxhash64(v), 64) AS sk FROM kmv_t GROUP BY g) a
        |JOIN (SELECT g, graft_kmv(xxhash64(v), 64) AS sk FROM kmv_t GROUP BY g) b
        |ON a.g < b.g""".stripMargin).collect()
    assert(rows.length === 1)
    assert(rows(0).getDouble(2) === 0.0) // evens and odds are disjoint
  }

  test("plan shape: imperative-buffer agg runs partial before the exchange") {
    import spark.implicits._
    val df = (1L to 1000L).map(v => (v % 7, v)).toDF("g", "v")
      .groupBy(col("g")).agg(kmvSketch(xxhash64(col("v")), 64).as("sk"))
    val plan = df.queryExecution.executedPlan.toString
    // ObjectHashAggregate twice (partial + final) around one shuffle: map
    // tasks reduce to <=k longs per group BEFORE the exchange — the
    // mergeable-summaries contract the 100 TB story depends on
    assert("ObjectHashAggregate".r.findAllIn(plan).length >= 2, plan.take(800))
    assert(plan.contains("Exchange hashpartitioning"), plan.take(800))
  }

  test("loud failure: mismatched k sketches refuse to pair") {
    import spark.implicits._
    val df = (1L to 100L).toDF("v")
    val s1 = df.agg(kmvSketch(xxhash64(col("v")), 64).as("a"))
    val s2 = df.agg(kmvSketch(xxhash64(col("v")), 128).as("b"))
    val ex = intercept[Exception] {
      s1.crossJoin(s2).select(kmvPair(col("a"), col("b"))).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("different k")))
  }
}
