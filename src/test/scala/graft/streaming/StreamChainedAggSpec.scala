package graft.streaming

import graft.{SparkEntry, SparkSuite}
import graft.queries.StreamQueries
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** q125's contract: TWO stateful aggregations chained in one streaming
  * query (SPARK-40925) must (a) reproduce the batch two-level rollup
  * exactly for every hour the final watermark closes, and (b) actually
  * run as two stateful operators holding RocksDB state — not get
  * collapsed or planned as a single aggregation. */
class StreamChainedAggSpec extends SparkSuite {

  test("chained windowed aggs (RocksDB) equal the batch two-level rollup") {
    val streamed = SparkEntry.queries("q125_stream_chained_agg")(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    // independent batch derivation: two plain GROUP BYs + closed-hour cut
    val evUs = graft.core.Tables.events(spark, sfDir)
      .select(unix_micros(col("ts")).as("us"), col("event_type"))
    val wm = evUs.agg(max(col("us"))).head().getLong(0)
    val cells = evUs
      .groupBy(expr("(us div 900000000) * 900000000").as("cell_us"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val batch = cells
      .groupBy(expr("(cell_us div 3600000000) * 3600000000").as("hour_us"))
      .agg(count(lit(1)).as("n_cells"), sum(col("n")).as("n_events"))
      .filter(col("hour_us") + 3600000000L <= wm)
      .orderBy(col("hour_us"))
      .collect().map(_.toSeq).toSeq
    assert(streamed.nonEmpty, "closed hours must exist at sf0.001")
    assert(streamed == batch,
      s"stream and batch answers must be identical (sizes ${streamed.size}/${batch.size})")
  }

  test("the plan holds TWO stateful aggregation operators on RocksDB") {
    val tsed = StreamQueries.eventsFileStream(spark, sfDir)
    val cells = tsed.withWatermark("ts", "0 seconds")
      .groupBy(window(col("ts"), "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val hours = cells
      .groupBy(window(col("window"), "1 hour"))
      .agg(count(lit(1)).as("n_cells"), sum(col("n")).as("n_events"))
    val q = StreamQueries.withRocksDb(spark) {
      val q = hours.writeStream.format("memory")
        .queryName(s"chain_probe_${System.nanoTime()}")
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      q
    }
    assert(q.recentProgress.nonEmpty,
      "no retained progress entries — cannot assert on state operators")
    val stateOps = q.recentProgress.toSeq.flatMap(_.stateOperators)
    // foldLeft, not .max: an empty seq must fail the assert above with a
    // clear message, never an opaque UnsupportedOperationException here
    val perBatchMax = q.recentProgress.toSeq
      .map(_.stateOperators.length).foldLeft(0)(math.max)
    assert(perBatchMax == 2,
      s"expected 2 chained stateful operators in one query, got $perBatchMax")
    assert(stateOps.forall(_.operatorName.contains("stateStoreSave")),
      s"both levels should be streaming aggregations, got ${stateOps.map(_.operatorName).distinct}")
    assert(stateOps.map(_.numRowsUpdated).sum > 0, "aggregation state must be written")
    val metricKeys = stateOps.flatMap(_.customMetrics.keySet.toArray.map(_.toString))
    assert(metricKeys.exists(_.toLowerCase.contains("rocksdb")),
      s"expected RocksDB custom metrics, got ${metricKeys.distinct.sorted.take(10)}")
  }
}
