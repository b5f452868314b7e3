package graft.relational

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Spark's InjectRuntimeFilter: for a shuffle join with a selective build
  * side, the optimizer plants a bloom filter built from the dim side's
  * join keys into the fact side's scan — at 100 TB this is the difference
  * between shuffling every fact row and shuffling only rows that can
  * match. The thresholds here are lowered because the test tables are
  * tiny; on a real cluster the defaults (10 MB creation side, 10 GB scan
  * side) gate it to exactly the joins that profit. */
class BloomFilterJoinSpec extends SparkSuite {

  private def withConfs(confs: (String, String)*)(body: => Unit): Unit = {
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try { confs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("selective dim join injects a bloom filter on the fact side, result unchanged") {
    val li = graft.core.Tables.lineitem(spark, sfDir)
    val ord = graft.core.Tables.orders(spark, sfDir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    def joined = li.join(ord, col("l_orderkey") === col("o_orderkey"))

    val baseline = joined.count()

    withConfs(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // fact side must look "big enough to be worth filtering"
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      // force a shuffle join: broadcast joins don't need a runtime filter
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain") || plan.contains("bloom_filter"),
        s"expected an injected bloom filter in:\n$plan")
      assert(joined.count() === baseline, "filter must be purely reductive")
    }
  }
}
