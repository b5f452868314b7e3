package graft.vector

import graft.SparkSuite
import graft.queries.PipelineQueries

/** q35c's persisted-IVF contract: the probe join dynamically prunes the
  * cell-partitioned index scan, and results equal the in-query path. */
class AnnIndexSpec extends SparkSuite {

  test("probe join plants dynamic partition pruning on the cell lake scan") {
    val df = PipelineQueries.annIvfFromIndex(spark, sfDir)
    val formatted = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // the index-side scan must carry a runtime (dynamic) partition filter
    // on cell — without it every cell's files are read per query batch
    assert(formatted.toLowerCase.contains("dynamicpruning"), formatted.take(3000))
  }

  test("index-path results equal the in-query path (q35) bit-for-bit") {
    val fromIndex = PipelineQueries.annIvfFromIndex(spark, sfDir).collect().toSeq
    val inQuery = PipelineQueries.annIvf(spark, sfDir).collect().toSeq
    assert(fromIndex === inQuery)
  }
}
