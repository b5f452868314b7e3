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

  test("estimates overestimate by at most n/capacity and never undercount") {
    val data = Seq.fill(50)("x") ++ Seq.fill(30)("y") ++ (0 until 40).map(i => s"z_$i")
    val bound = data.size / 8 // ε·n with ε = 1/capacity, preserved by compensated merge
    for (parts <- Seq(1, 3, 7)) {
      val est = sketchTokens(data, 8, parts).toMap
      // Space-Saving never undercounts a surviving key (compensation only adds)
      assert(est.getOrElse("x", 0L) >= 50L, s"parts=$parts")
      assert(est.getOrElse("y", 0L) >= 30L, s"parts=$parts")
      // ... and the compensated merge keeps the single-sketch error bound
      assert(est("x") <= 50L + bound, s"parts=$parts")
      assert(est("y") <= 30L + bound, s"parts=$parts")
    }
  }

  test("heavy items survive adversarial merge trees (compensated merge)") {
    // A wide vocabulary of mid-weight fillers spread across many
    // partitions is the case where the un-compensated merge degrades
    // toward ~2n/capacity: each side's evictions are forgotten at merge.
    // The min-count offset keeps the heavy key's estimate dominant.
    val heavy = Seq.fill(200)("HEAVY")
    val filler = (0 until 16).flatMap(p => (0 until 50).map(i => s"f_${p}_$i"))
    val data = scala.util.Random.shuffle(heavy ++ filler)
    // n = 1000, capacity 8 → bound 125 < 200: HEAVY must survive any tree
    for (parts <- Seq(2, 8, 16)) {
      val kept = sketchTokens(data, 8, parts).map(_._1).toSet
      assert(kept.contains("HEAVY"), s"parts=$parts")
    }
  }

  test("non-castable input type is rejected at analysis time") {
    import spark.implicits._
    val df = Seq(Seq(1, 2), Seq(3)).toDF("arr")
    val e = intercept[Exception] {
      df.agg(spaceSaving(col("arr"), 4)).collect()
    }
    assert(e.getMessage.toLowerCase.contains("type") || e.getMessage.contains("arr"))
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
