package graft.streaming

import graft.{SparkEntry, SparkSuite}
import graft.queries.StreamQueries
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** q123's stream≡batch contract (VERDICT r15 task 7): the purchase-
  * attribution interval join, run as a REAL stream-stream join over the
  * staged events file source on the RocksDB provider, must reproduce the
  * batch q55 answer exactly — and the streaming query must actually be
  * stateful symmetric-hash on RocksDB, not a degenerate batch plan. */
class StreamIntervalJoinSpec extends SparkSuite {

  test("streaming interval join (RocksDB) equals batch q55 exactly") {
    val streamed = SparkEntry.queries("q123_stream_interval_join")(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    val batch = SparkEntry.queries("q55_interval_join")(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(streamed.nonEmpty, "the join must emit pairs at sf0.001")
    assert(streamed == batch,
      s"stream and batch answers must be identical:\nstream=$streamed\nbatch=$batch")
  }

  test("the streaming run is a symmetric-hash join holding RocksDB state") {
    val tsed = StreamQueries.eventsFileStream(spark, sfDir)
    val joined = EventStreams.viewToPurchase(
      tsed.filter(col("event_type") === "view"),
      tsed.filter(col("event_type") === "purchase"))
    val q = StreamQueries.withRocksDb(spark) {
      val q = joined.writeStream.format("memory")
        .queryName(s"ssj_probe_${System.nanoTime()}")
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      q
    }
    val progresses = q.recentProgress.toSeq
    val stateOps = progresses.flatMap(_.stateOperators)
    assert(stateOps.nonEmpty, "a stream-stream join must report state operators")
    assert(stateOps.exists(_.operatorName.contains("symmetricHashJoin")),
      s"expected symmetricHashJoin, got ${stateOps.map(_.operatorName).distinct}")
    // both sides buffered rows into the join state at some point
    assert(stateOps.map(_.numRowsUpdated).sum > 0, "join state must be written")
    // RocksDB provider evidence: the state operator reports RocksDB
    // custom metrics (absent on the HDFS-backed provider)
    val metricKeys = stateOps.flatMap(_.customMetrics.keySet.toArray.map(_.toString))
    assert(metricKeys.exists(_.toLowerCase.contains("rocksdb")),
      s"expected RocksDB custom metrics, got ${metricKeys.distinct.sorted.take(10)}")
  }
}
