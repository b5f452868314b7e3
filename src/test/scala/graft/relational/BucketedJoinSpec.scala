package graft.relational

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** 100 TB design evidence: pre-bucketing both fact tables on the join key
  * makes the fact⋈fact join shuffle-FREE — the physical plan must contain
  * no ShuffleExchange between the scans and the SortMergeJoin. This is
  * the co-location strategy the engine would use for the
  * lineitem⋈orders join at scale (SURVEY §4). */
class BucketedJoinSpec extends SparkSuite {

  test("bucketed tables join without a shuffle") {
    val db = "graft_bucket_test"
    spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
    spark.sql(s"CREATE DATABASE $db")
    try {
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .select("l_orderkey", "l_quantity", "l_extendedprice")
        .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable(s"$db.lineitem_b")
      spark.read.parquet(s"$sfDir/orders.parquet")
        .select("o_orderkey", "o_orderpriority")
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable(s"$db.orders_b")

      // force sort-merge (a broadcast join would trivially have no shuffle
      // and prove nothing about bucketing)
      val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val joined = spark.table(s"$db.lineitem_b")
          .join(spark.table(s"$db.orders_b"), col("l_orderkey") === col("o_orderkey"))
          .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
        val rows = joined.orderBy("o_orderpriority").collect().toSeq

        // AQE finalizes the plan only after execution
        val plan = joined.queryExecution.executedPlan.toString
        val idx = plan.indexOf("SortMergeJoin")
        assert(idx >= 0, s"expected a SortMergeJoin, got:\n$plan")
        // in the tree print the join's inputs follow the join line; the
        // only exchange in the whole plan is the groupBy's, which sits
        // ABOVE the join — so below the join line there must be none
        val joinSection = plan.substring(idx)
        assert(!joinSection.contains("Exchange"),
          s"join inputs should be shuffle-free, got:\n$joinSection")

        // and the result matches the plain (shuffled) join
        val plain = spark.read.parquet(s"$sfDir/lineitem.parquet")
          .join(spark.read.parquet(s"$sfDir/orders.parquet"),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
        assert(rows === plain.orderBy("o_orderpriority").collect().toSeq)
      } finally {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      }
    } finally {
      spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
    }
  }
}
