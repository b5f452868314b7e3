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

  test("oversizedBlocks reports exactly the blocks over the cap") {
    import spark.implicits._
    val df = ((0L until 30L).map(i => (i, "hot")) ++ Seq((100L, "cold"))).toDF("id", "block")
    val over = Blocking.oversizedBlocks(df, "block", maxBlock = 10)
      .as[(String, Long)].collect()
    assert(over.toSeq === Seq(("hot", 30L)))
  }
}
