package graft.olap

import graft.{SparkEntry, SparkSuite}
import graft.core.Tables
import org.apache.spark.sql.functions._

/** q142's contract: merge(agg(base), agg(delta)) equals agg(all) exactly,
  * and the serve plan reads base state from the persisted MV artifact —
  * exactly ONE scan of the events table (the delta), never a base rescan. */
class IncrementalMvSpec extends SparkSuite {

  test("the incremental merge equals the full recompute bit-exactly") {
    val merged = SparkEntry.queries("q142_incremental_mv")(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    val full = Tables.events(spark, sfDir)
      .groupBy(col("event_type"),
        unix_micros(date_trunc("hour", col("ts"))).as("hour_us"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"),
        min(col("value")).as("min_value"), max(col("value")).as("max_value"))
      .orderBy(col("event_type"), col("hour_us"))
      .collect().map(_.toSeq).toSeq
    assert(merged.nonEmpty && merged == full,
      s"incremental MV diverged from full recompute (${merged.size}/${full.size} rows)")
  }

  test("the serve plan scans events exactly once (the delta side only)") {
    val plan = SparkEntry.queries("q142_incremental_mv")(spark, sfDir)
      .queryExecution.executedPlan.toString
    val eventScans = plan.linesIterator.count(l =>
      l.contains("FileScan") && l.contains("events.parquet"))
    assert(eventScans == 1, s"expected 1 events scan (delta), got $eventScans")
    val mvScans = plan.linesIterator.count(l =>
      l.contains("FileScan") && l.contains("blobs_mvbase_"))
    assert(mvScans == 1, s"expected 1 persisted-MV scan, got $mvScans")
  }

  test("groups present only in base or only in delta survive the outer merge") {
    // every (type, hour) of the full recompute appears in the merge — the
    // full_outer join cannot drop one-sided groups
    val mergedKeys = SparkEntry.queries("q142_incremental_mv")(spark, sfDir)
      .select(col("event_type"), col("hour_us")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val fullKeys = Tables.events(spark, sfDir)
      .select(col("event_type"),
        unix_micros(date_trunc("hour", col("ts"))).as("hour_us"))
      .distinct().collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(mergedKeys == fullKeys)
  }
}
