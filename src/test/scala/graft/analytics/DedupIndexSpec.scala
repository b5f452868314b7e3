package graft.analytics

import graft.{SparkEntry, SparkSuite}

/** q134's persisted-index contract: the day-N+1 decision joins read the
  * bucketed index tables PRE-PARTITIONED — only the batch side shuffles
  * (index bytes never move) — and the output equals q101's in-query
  * derivation bit-for-bit. */
class DedupIndexSpec extends SparkSuite {

  // count data-moving shuffles only — BroadcastExchange would match a
  // bare "Exchange" and at test scale AQE broadcasts everything
  private def exchanges(plan: String): Int =
    "Exchange (hash|range)partitioning".r
      .findAllIn(plan.split("== Initial Plan ==").head).length

  test("bucketed index joins: fewer exchanges than the in-query path, bucketing used") {
    // force shuffle joins: at sf0.001 AQE broadcasts the tiny index on
    // both paths, which never exercises bucketing — the 100 TB regime
    // (index >> broadcast threshold) is shuffle joins, where the catalog
    // bucket spec must hand the index side over pre-partitioned
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try {
      val fromIndex = SparkEntry.queries("q134_dedup_index_table")(spark, sfDir)
      fromIndex.collect() // finalize AQE before reading the plan
      val p134 = fromIndex.queryExecution.executedPlan.toString
      val q101 = SparkEntry.queries("q101_incremental_dedup")(spark, sfDir)
      q101.collect()
      val p101 = q101.queryExecution.executedPlan.toString
      // the bucket spec must actually engage: the index scans arrive
      // pre-partitioned, eliminating both index-side exchanges
      assert(exchanges(p134) < exchanges(p101),
        s"bucketed index did not reduce exchanges: q134=${exchanges(p134)} " +
          s"q101=${exchanges(p101)}\n$p134")
      val formatted = fromIndex.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(formatted.contains("Bucketed: true"),
        s"index scan not served from buckets:\n${formatted.take(3000)}")
    } finally spark.conf.set(key, prev)
  }

  test("index-path decisions equal the in-query path (q101) bit-for-bit") {
    val fromIndex = SparkEntry.queries("q134_dedup_index_table")(spark, sfDir)
      .collect().toSeq
    val inQuery = SparkEntry.queries("q101_incremental_dedup")(spark, sfDir)
      .collect().toSeq
    assert(fromIndex === inQuery)
  }
}
