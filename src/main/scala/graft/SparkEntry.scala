package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 registers here as a named
  * query; SQL-expressible ones also carry a DuckDB oracle with IDENTICAL
  * output column names/types, a total ORDER BY with a unique tie-breaker,
  * and floats made order-insensitive (DECIMAL aggregation) on both sides.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Slice 0 (SURVEY §7.2): brute-force cosine top-5, first 3 vectors as
    * queries — the reference's core retrieval op (app.py:261-271). */
  def entry(spark: SparkSession): DataFrame =
    VectorQueries.topkCosine(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    VectorQueries.all ++ RelationalQueries.all ++ RagQueries.all ++
      AgentQueries.all ++ PipelineQueries.all ++ TextQueries.all ++ StreamQueries.all ++
      SourceQueries.all ++ OlapQueries.all ++ CurationQueries.all

  /** Queries that run the real streaming harness (RocksDB state store +
    * micro-batch bring-up — a fixed cost class no batch query pays); Bench
    * subtotals these separately. */
  def streamingQueries: Set[String] = StreamQueries.streamingHarness

  def oracleSql: Map[String, String] =
    VectorQueries.oracles ++ RelationalQueries.oracles ++ RagQueries.oracles ++
      AgentQueries.oracles ++ PipelineQueries.oracles ++ TextQueries.oracles ++
      StreamQueries.oracles ++ SourceQueries.oracles ++ OlapQueries.oracles ++
      CurationQueries.oracles
}
