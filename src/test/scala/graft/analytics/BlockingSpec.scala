package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSuite

class BlockingSpec extends SparkSuite {

  test("small blocks keep their key verbatim — pair set identical to plain blocking") {
    import spark.implicits._
    val df = (0L until 200L).map(i => (i, s"block_${i % 50}")).toDF("id", "block")
    val salted = Blocking.saltOversized(df, "block", "id", maxBlock = 10)
    // 50 blocks × 4 rows, all under the cap
    assert(salted.filter(col("salted_block") =!= col("block")).count() === 0L)
  }

  test("adversarial boilerplate block: candidate pairs bounded, not quadratic") {
    import spark.implicits._
    val m = 1000
    val maxBlock = 50
    // one hot block of 1000 docs (all share the blocking key) + normal tail
    val df = ((0L until m.toLong).map(i => (i, "BOILERPLATE")) ++
      (2000L until 2100L).map(i => (i, s"block_$i"))).toDF("id", "block")
    val salted = Blocking.saltOversized(df, "block", "id", maxBlock).cache()

    // hash salting: every sub-block is O(maxBlock) — allow binomial spread
    val subSizes = salted.filter(col("block") === "BOILERPLATE")
      .groupBy("salted_block").count().as[(String, Long)].collect()
    assert(subSizes.length === math.ceil(m.toDouble / maxBlock).toInt)
    assert(subSizes.map(_._2).max <= 3L * maxBlock,
      s"hot sub-block too large: ${subSizes.map(_._2).max}")

    // pair count collapses from O(m²) to O(m·maxBlock)
    val a = salted.select(col("salted_block"), col("id").as("id1"))
    val b = salted.select(col("salted_block"), col("id").as("id2"))
    val nPairs = a.join(b, Seq("salted_block")).filter(col("id1") < col("id2")).count()
    val allPairs = m.toLong * (m - 1) / 2 // 499_500 without the guard
    assert(nPairs < allPairs / 5, s"$nPairs pairs — salting did not bound the block")
    assert(nPairs > 0L)

    // deterministic: independent of input partitioning
    val again = Blocking.saltOversized(df.repartition(13), "block", "id", maxBlock)
    assert(again.orderBy("id").select("id", "salted_block").collect().toSeq ===
      salted.orderBy("id").select("id", "salted_block").collect().toSeq)
    salted.unpersist()
  }

  test("selfPairs: complete — exactly the naive within-block pair set, hot blocks included") {
    import spark.implicits._
    // hot block of 300 (3× the cap), a mid block of 60, tail of singletons
    val df = ((0L until 300L).map(i => (i, "HOT", i * 2)) ++
      (1000L until 1060L).map(i => (i, "MID", i * 2)) ++
      (5000L until 5050L).map(i => (i, s"b_$i", i * 2))).toDF("id", "block", "payload")
    val got = Blocking.selfPairs(df, "block", "id", maxBlock = 100)
      .select(col("_1.id").as("id1"), col("_1.payload").as("p1"),
        col("_2.id").as("id2"), col("_2.payload").as("p2"))
      .as[(Long, Long, Long, Long)].collect().toSet
    val naive = df.as("a").join(df.as("b"),
        col("a.block") === col("b.block") && col("a.id") < col("b.id"))
      .select(col("a.id"), col("a.payload"), col("b.id"), col("b.payload"))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(naive.size === 300 * 299 / 2 + 60 * 59 / 2)
    assert(got === naive) // lossless AND no duplicates, ids canonical, payloads attached to the right side
  }

  test("selfPairs: task sizes bounded — no sub-block pair task beyond ~maxBlock²") {
    import spark.implicits._
    val m = 1000
    val maxBlock = 50
    val df = (0L until m.toLong).map(i => (i, "HOT")).toDF("id", "block")
    val s = math.ceil(m.toDouble / maxBlock).toInt
    // count rows per task the same way selfPairs keys them: every task's
    // candidate pair count must stay near maxBlock² (binomial spread allowed)
    val g = pmod(hash(col("id")), lit(s))
    val perSub = df.withColumn("g", g).groupBy("g").count()
      .as[(Int, Long)].collect().map(_._2)
    assert(perSub.max <= 3L * maxBlock, s"degenerate sub-block: ${perSub.max}")
    val nPairs = Blocking.selfPairs(df, "block", "id", maxBlock).count()
    assert(nPairs === m.toLong * (m - 1) / 2) // complete even at 20 sub-blocks
  }

  test("selfPairs: deterministic under input repartitioning") {
    import spark.implicits._
    val df = (0L until 500L).map(i => (i, s"blk_${i % 3}")).toDF("id", "block")
    val one = Blocking.selfPairs(df, "block", "id", maxBlock = 40)
      .select(col("_1.id"), col("_2.id")).as[(Long, Long)].collect().sorted.toSeq
    val two = Blocking.selfPairs(df.repartition(17), "block", "id", maxBlock = 40)
      .select(col("_1.id"), col("_2.id")).as[(Long, Long)].collect().sorted.toSeq
    assert(one === two)
  }

  test("oversizedBlocks reports exactly the blocks over the cap") {
    import spark.implicits._
    val df = ((0L until 30L).map(i => (i, "hot")) ++ Seq((100L, "cold"))).toDF("id", "block")
    val over = Blocking.oversizedBlocks(df, "block", maxBlock = 10)
      .as[(String, Long)].collect()
    assert(over.toSeq === Seq(("hot", 30L)))
  }
}
