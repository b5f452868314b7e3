package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** S2 — windowed aggregations with watermarks (SURVEY §2.7).
  *
  * Each transform takes a DataFrame with (ts TIMESTAMP, user_id, event_type,
  * value) and works IDENTICALLY on a batch DataFrame (watermark is a no-op)
  * and a streaming one (`readStream`/MemoryStream) — the batch≡stream
  * differential is asserted in StreamingSpec, and the batch form is
  * oracle-checked by the driver (q50-q52).
  *
  * The reference has no event-time processing (its only "window" is the
  * last-10-messages slice, app.py:110-120); these are the engine extensions
  * SURVEY §2.7 mandates on the `events` table.
  */
object EventStreams {

  private def decimal2(c: Column): Column = c.cast("decimal(18,2)")

  /** Tumbling 1-hour windows, 30-minute watermark for late-data drop. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(decimal2(col("value"))).cast("double").as("total_value"))
      .select(unix_micros(col("window.start")).as("window_start_us"),
        col("event_type"), col("n_events"), col("total_value"))

  /** Sliding 1-hour windows every 30 minutes (each event in 2 windows). */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(unix_micros(col("window.start")).as("window_start_us"),
        col("event_type"), col("n_events"))

  /** Stream-stream interval join: each purchase matched to the same
    * user's views in the preceding 10 minutes. Both sides carry
    * watermarks and the join condition bounds event time in BOTH
    * directions, so streaming state is evictable (Spark rejects an
    * unbounded stream-stream join outright). Batch: the watermarks are
    * no-ops and this is a plain equi+range join shuffled on user_id —
    * never a cross join. */
  def viewToPurchase(views: DataFrame, purchases: DataFrame): DataFrame = {
    val v = views.withWatermark("ts", "30 minutes")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"))
    val p = purchases.withWatermark("ts", "30 minutes")
      .select(col("user_id"), col("event_id").as("p_id"), col("ts").as("p_ts"))
    p.join(v,
      col("user_id") === col("v_user") &&
        col("v_ts") <= col("p_ts") &&
        col("v_ts") > col("p_ts") - expr("INTERVAL 10 MINUTES"))
      .select(col("p_id"), col("user_id"), col("p_ts"), col("v_ts"))
  }

  /** S2 outer form — purchases LEFT OUTER joined to preceding views on
    * the same 10-minute interval: every purchase survives, unmatched
    * ones with a null v_ts. In streaming this exercises a semantics the
    * inner join does not — an unmatched purchase's null row can only be
    * EMITTED once the watermark proves no matching view can still
    * arrive, so correctness depends on watermark-driven state eviction,
    * not just state lookup. State stays bounded by the same 30-minute
    * watermark + 10-minute condition window as the inner form. */
  def viewToPurchaseOuter(views: DataFrame, purchases: DataFrame): DataFrame = {
    val v = views.withWatermark("ts", "30 minutes")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"))
    val p = purchases.withWatermark("ts", "30 minutes")
      .select(col("user_id"), col("event_id").as("p_id"), col("ts").as("p_ts"))
    p.join(v,
      col("user_id") === col("v_user") &&
        col("v_ts") <= col("p_ts") &&
        col("v_ts") > col("p_ts") - expr("INTERVAL 10 MINUTES"),
      "left_outer")
      .select(col("p_id"), col("user_id"), col("p_ts"), col("v_ts"))
  }

  /** S5 — exactly-once recovery over an at-least-once delivery stream:
    * re-deliveries of the same event_id arriving within the watermark
    * are dropped, keeping the FIRST arrival. Streaming state is one
    * entry per event_id, evicted once the watermark passes its event
    * time — bounded regardless of stream length (the reason this is
    * `dropDuplicatesWithinWatermark`, not an unbounded `dropDuplicates`,
    * at 100 TB/day rates). The batch-deterministic equivalent (first
    * delivery = min ts per id) is the oracle-checked q56 aggregate;
    * stream≡batch is asserted in StreamingSpec. */
  def exactlyOnce(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  /** S6 — stream-static enrichment: the event stream joined to a static
    * dimension (broadcast — no stream state at all; Spark re-plans the
    * static side per micro-batch, so a dim refresh is picked up without
    * restarting the query), then windowed per segment. The canonical
    * "enrich the firehose with reference data" shape: at 100 TB/day the
    * dim stays KB-sized and broadcast while only the stream shuffles
    * into its windowed aggregation. */
  def enrichedTumbling(events: DataFrame, dims: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .join(broadcast(dims.select(col("c_custkey"), col("c_mktsegment"))),
        col("user_id") === col("c_custkey"))
      .groupBy(window(col("ts"), "1 hour"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n_events"),
        sum(decimal2(col("value"))).cast("double").as("total_value"))
      .select(unix_micros(col("window.start")).as("window_start_us"),
        col("c_mktsegment"), col("n_events"), col("total_value"))

  /** Per-user session windows with a 5-minute inactivity gap (S3). */
  def sessionCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(session_window(col("ts"), "5 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(decimal2(col("value"))).cast("double").as("total_value"))
      .select(unix_micros(col("session_window.start")).as("session_start_us"),
        unix_micros(col("session_window.end")).as("session_end_us"),
        col("user_id"), col("n_events"), col("total_value"))

  /** Windowed DISTINCT-user counting via the KMV sketch (S2 × §2.8).
    * Structured Streaming rejects `count(DISTINCT x)` in an aggregation
    * outright (and holding exact distinct sets as window state is
    * unbounded); the mergeable sketch IS the streamable form — ≤ k
    * longs of state per (window, type) group, identical batch/stream.
    * With k above the group cardinality the sketch is the exact
    * distinct set and the estimate is exact — q108 runs that regime so
    * the whole path (codegen hash → imperative-buffer partial agg →
    * merge → estimate read) sits under the DuckDB count(DISTINCT)
    * oracle; the estimation regime is spec'd in KmvSketchSpec. */
  def windowedDistinct(events: DataFrame, k: Int = 4096): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(graft.functions.KmvSketchAgg.kmvSketch(xxhash64(col("user_id")), k).as("sk"))
      .select(unix_micros(col("window.start")).as("window_start_us"),
        col("event_type"),
        graft.functions.KmvEstimateExpr.kmvEstimate(col("sk"))
          .cast("long").as("distinct_users"))
}
