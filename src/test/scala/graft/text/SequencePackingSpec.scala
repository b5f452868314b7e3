package graft.text

import graft.{SparkEntry, SparkSuite}
import org.apache.spark.sql.functions._

/** q115's packing invariants — the properties the row-level oracle
  * can't state: exact sequence fill, complete coverage, no overlaps. */
class SequencePackingSpec extends SparkSuite {

  test("every training sequence except the last is exactly full") {
    val out = SparkEntry.queries("q115_sequence_packing")(spark, sfDir).cache()
    try {
      val fills = out.groupBy("seq_id")
        .agg(sum(col("tok_end") - col("tok_start")).as("fill"))
      val maxSeq = fills.agg(max("seq_id")).head.getLong(0)
      val short = fills.filter(col("seq_id") < maxSeq && col("fill") =!= 256L).count()
      assert(short === 0, "a non-final sequence is not exactly 256 tokens")
      val lastFill = fills.filter(col("seq_id") === maxSeq).head.getLong(1)
      assert(lastFill >= 1 && lastFill <= 256)
    } finally out.unpersist() // shared session — don't poison later plan asserts
  }

  test("single tokenizing scan via ReusedExchange — no session-pinned cache") {
    val out = SparkEntry.queries("q115_sequence_packing")(spark, sfDir)
    // materialize through the Dataset's OWN QueryExecution (count()
    // would plan a separate aggregate) so AQE finalizes stage reuse
    out.collect()
    val full = out.queryExecution.executedPlan.toString
    // the AQE dump appends the pre-reuse "== Initial Plan ==" — only
    // the final plan reflects what actually executed
    val plan = full.split("== Initial Plan ==").head
    // the bucket shuffle is consumed by BOTH the bucket-offsets branch
    // and the window/join branch: the second consumer must reuse the
    // exchange, not rescan + retokenize documents, and must not pin a
    // block-manager cache for the life of the session
    val scans = "documents\\.parquet".r.findAllIn(plan).size
    assert(plan.contains("ReusedExchange"),
      s"expected ReusedExchange over the bucket shuffle, got:\n$plan")
    assert(scans == 1,
      s"expected ONE tokenizing scan of documents, saw $scans:\n$plan")
    assert(!plan.contains("InMemoryTableScan"),
      "q115 must not pin a session-lifetime cache")
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
