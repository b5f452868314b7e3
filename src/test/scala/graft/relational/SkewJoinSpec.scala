package graft.relational

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Runtime skew evidence: the two mechanisms a 100 TB join relies on
  * when a key goes hot.
  *
  *   1. AQE skew-join split — the engine leaves Spark's adaptive
  *      execution on everywhere, so a shuffle join whose one partition
  *      dwarfs the rest is re-planned at runtime into parallel splits
  *      (SortMergeJoin(skew=true)). This spec proves the config surface
  *      the library ships actually triggers it on a pathological key,
  *      so a future session-config change that silently disables AQE or
  *      skew handling turns the suite red.
  *   2. Deterministic pre-salting (Blocking.saltOversized) for the
  *      dedup/LSH block joins, spec'd separately — AQE can split a
  *      skewed SHUFFLE, but a semantic all-pairs block must be bounded
  *      before the pair join is even planned.
  */
class SkewJoinSpec extends SparkSuite {

  test("AQE splits a pathologically skewed sort-merge join at runtime") {
    import spark.implicits._
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor"
    ).map(k => k -> conf.getOption(k)).toMap
    try {
      // force a shuffle join and lower the skew thresholds to unit-test
      // scale (defaults target 256 MB partitions)
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      // one hot key carrying 50k fat rows vs 1k uniform singletons; the
      // dim side covers every key exactly once
      val left = spark.range(51000).select(
        when(col("id") < 50000, lit(7L)).otherwise(col("id") - 50000).as("k"),
        concat(lit("x"), lpad(col("id").cast("string"), 64, "0")).as("payload"))
      val right = (0L until 1000L).map(i => (i, s"dim_$i")).toDF("k", "name")
      val joined = left.join(right, "k")
      // Execute THIS frame (count() would plan a separate query and
      // leave joined's adaptive plan unfinalized), then read the
      // re-planned final physical plan.
      assert(joined.collect().length === 51000) // 50k hot matches + 1k uniform
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not mark the hot partition skewed:\n$plan")
    } finally {
      saved.foreach {
        case (k, Some(v)) => conf.set(k, v)
        case (k, None)    => conf.unset(k)
      }
    }
  }
}
