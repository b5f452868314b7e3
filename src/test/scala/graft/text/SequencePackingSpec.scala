package graft.text

import graft.{SparkEntry, SparkSuite}
import org.apache.spark.sql.functions._

/** q115's packing invariants — the properties the row-level oracle
  * can't state: exact sequence fill, complete coverage, no overlaps. */
class SequencePackingSpec extends SparkSuite {

  test("every training sequence except the last is exactly full") {
    val out = SparkEntry.queries("q115_sequence_packing")(spark, sfDir).cache()
    val fills = out.groupBy("seq_id")
      .agg(sum(col("tok_end") - col("tok_start")).as("fill"))
    val maxSeq = fills.agg(max("seq_id")).head.getLong(0)
    val short = fills.filter(col("seq_id") < maxSeq && col("fill") =!= 256L).count()
    assert(short === 0, "a non-final sequence is not exactly 256 tokens")
    val lastFill = fills.filter(col("seq_id") === maxSeq).head.getLong(1)
    assert(lastFill >= 1 && lastFill <= 256)
  }

  test("per doc: spans tile [0, n) in order with no gaps or overlaps") {
    val out = SparkEntry.queries("q115_sequence_packing")(spark, sfDir)
    // within a doc, ordered by seq_id, each span must start where the
    // previous ended, the first at 0 — and the total must be the doc's
    // token count
    val bad = out.withColumn("prev_end",
        lag(col("tok_end"), 1).over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("doc_id").orderBy("seq_id")))
      .filter(coalesce(col("prev_end"), lit(0L)) =!= col("tok_start"))
      .count()
    assert(bad === 0, "a doc's spans do not tile contiguously")
    val totals = out.groupBy("doc_id")
      .agg(sum(col("tok_end") - col("tok_start")).as("covered"),
        max("tok_end").as("n"))
      .filter(col("covered") =!= col("n")).count()
    assert(totals === 0, "a doc's spans do not cover its token count")
  }
}
