package graft.sources

import graft.{SparkEntry, SparkSuite}
import graft.core.Tables
import org.apache.spark.sql.functions._

/** q153's contract: the footer-only census equals the full-scan truth
  * and the staged lake honors the one-file-per-bucket layout. */
class FooterStatsSpec extends SparkSuite {

  test("footer census equals the full-scan per-bucket truth") {
    val footers = SparkEntry.queries("q153_footer_stats")(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    val scan = Tables.events(spark, sfDir)
      .groupBy((col("user_id") % 16).as("bucket"))
      .agg(lit(1L).as("n_files"), count(lit(1)).as("n_rows"),
        (min(col("value")) + 0.0).as("min_value"),
        (max(col("value")) + 0.0).as("max_value"))
      .orderBy(col("bucket"))
      .collect().map(_.toSeq).toSeq
    assert(footers.nonEmpty && footers == scan,
      s"footer census diverged from the scan (${footers.size}/${scan.size})")
  }

  test("the layout invariant holds: every bucket is exactly one file") {
    val rows = SparkEntry.queries("q153_footer_stats")(spark, sfDir).collect()
    assert(rows.forall(_.getLong(1) == 1L), "repartition(bucket) must yield 1 file per bucket")
    val expected = Tables.events(spark, sfDir)
      .select((col("user_id") % 16).as("b")).distinct()
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(rows.map(_.getLong(0)).sorted.toSeq == expected, "one census row per present bucket")
  }
}
