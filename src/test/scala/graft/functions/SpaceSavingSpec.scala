package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The Space-Saving TypedImperativeAggregate: frequency guarantee,
  * merge correctness across partitionings, serialization round trip
  * (exercised implicitly by every multi-partition run), and the q88
  * sketch-then-confirm contract against the exact q59 path. */
class SpaceSavingSpec extends SparkSuite {

  import SpaceSavingAgg.spaceSaving

  private def sketchTokens(data: Seq[String], capacity: Int, parts: Int): Seq[(String, Long)] = {
    import spark.implicits._
    data.toDF("t").repartition(parts)
      .agg(spaceSaving(col("t"), capacity).as("s"))
      .select(explode(col("s")).as("c"))
      .select(col("c.token"), col("c.est"))
      .as[(String, Long)].collect().toSeq
  }

  test("any item with frequency > n/capacity survives the sketch") {
    // 3 heavy items (200 each) in a sea of 600 singletons; capacity 16
    // → bound n/cap = 1200/16 = 75 << 200
    val data = Seq.fill(200)("alpha") ++ Seq.fill(200)("beta") ++
      Seq.fill(200)("gamma") ++ (0 until 600).map(i => s"rare_$i")
    for (parts <- Seq(1, 4, 13)) {
      val kept = sketchTokens(scala.util.Random.shuffle(data), 16, parts).map(_._1).toSet
      assert(Set("alpha", "beta", "gamma").subsetOf(kept), s"parts=$parts")
    }
  }

  test("estimates overestimate by at most the eviction bound and never undercount") {
    val data = Seq.fill(50)("x") ++ Seq.fill(30)("y") ++ (0 until 40).map(i => s"z_$i")
    val est = sketchTokens(data, 8, 3).toMap
    // Space-Saving never undercounts a surviving key
    assert(est.getOrElse("x", 0L) >= 50L)
    assert(est.getOrElse("y", 0L) >= 30L)
    // total count is conserved-or-reduced by truncation, never inflated
    // beyond n (each increment adds exactly 1 to one counter)
    assert(est.values.sum <= data.size)
  }

  test("capacity bounds the buffer at any partitioning") {
    val data = (0 until 5000).map(i => s"t_${i % 700}")
    for (parts <- Seq(1, 7, 32)) {
      assert(sketchTokens(data, 64, parts).size <= 64, s"parts=$parts")
    }
  }

  test("q88 sketch-then-confirm equals the exact q59 top-20 at any partitioning") {
    import spark.implicits._
    val exact = graft.queries.TextQueries.heavyHitters(spark, sfDir)
      .as[(String, Long)].collect().toSeq
    val sketched = graft.queries.TextQueries.heavyHittersSketch(spark, sfDir)
      .as[(String, Long)].collect().toSeq
    assert(sketched === exact)
  }

  test("sql registration: graft_space_saving resolves through the extension") {
    import spark.implicits._
    val got = Seq("a", "a", "b").toDF("t")
      .selectExpr("graft_space_saving(t, 4) AS s")
      .select(explode(col("s.token")).as("tok"))
    // array-of-struct field projection: 2 distinct tokens survive
    assert(got.count() === 2)
  }
}
