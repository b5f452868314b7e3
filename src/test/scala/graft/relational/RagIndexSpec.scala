package graft.relational

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.queries.RagQueries

/** q111's index-artifact contract: the query-term filter reaches the
  * parquet scan of the postings lake, and the scores equal q81's. */
class RagIndexSpec extends SparkSuite {

  test("query-term IN filter is pushed into the postings parquet scan") {
    val df = RagQueries.bm25FromIndex(spark, sfDir)
    val formatted = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // the postings scan must carry a pushed In(term, ...) — without it a
    // billion-row postings lake would be read wholesale per query batch
    val pushed = formatted.linesIterator.filter(_.contains("PushedFilters")).mkString("\n")
    assert(pushed.contains("In(term") || pushed.contains("EqualTo(term"), formatted.take(2000))
  }

  test("index-path scores equal the corpus-scan path (q81) bit-for-bit") {
    val fromIndex = RagQueries.bm25FromIndex(spark, sfDir).collect().toSeq
    val fromCorpus = RagQueries.bm25(spark, sfDir).collect().toSeq
    assert(fromIndex === fromCorpus)
  }
}
