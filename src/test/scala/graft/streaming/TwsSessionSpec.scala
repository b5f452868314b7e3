package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSuite
import graft.streaming.Sessionize.Ev

/** The Spark 4.x arbitrary-state path (transformWithState + RocksDB
  * state store): SessionizeTws must reproduce Sessionize's S3/S4
  * semantics — running state, reset events, event-time TTL — batch by
  * batch over the same stream. */
class TwsSessionSpec extends SparkSuite {

  private def ts(minutes: Int): Timestamp = new Timestamp(1704067200000L + minutes * 60000L)

  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Run `SessionizeTws.updates` on a RocksDB-provider stream, feeding
    * the given micro-batches, returning the memory-sink rows. The
    * provider conf is query-scoped state-store machinery: set for the
    * start, restored after, so sibling suites keep the default. */
  private def runTws(name: String)(batches: Seq[Ev]*): Seq[(Long, Long, Double, Boolean)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", RocksDb)
    try {
      val mem = MemoryStream[Ev]
      val q = SessionizeTws.updates(mem.toDS().withWatermark("ts", "0 seconds"))
        .writeStream.format("memory").queryName(name).outputMode(OutputMode.Update).start()
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      q.stop()
      spark.table(name).as[(Long, Long, Double, Boolean)].collect().toSeq
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None    => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("transformWithState: running state, reset event, event-time TTL close") {
    val out = runTws("tws")(
      Seq(Ev(ts(0), 1L, "purchase", 10.0), Ev(ts(1), 1L, "purchase", 5.0)),
      Seq(Ev(ts(2), 1L, "reset", 0.0), Ev(ts(3), 1L, "purchase", 7.0)),
      // watermark jumps past user 1's lastTs + TTL → their timer fires
      Seq(Ev(ts(60), 2L, "signup", 1.0)))

    // batch 1: the running aggregate reached (2, 15.0)
    assert(out.contains((1L, 2L, 15.0, false)))
    // batch 2: reset wiped it; only the post-reset purchase remains
    assert(out.contains((1L, 1L, 7.0, false)))
    // batch 3: TTL close for user 1 with the post-reset state, exactly once
    assert(out.filter(r => r._1 == 1L && r._4) === Seq((1L, 1L, 7.0, true)))
    // a closed key's state is gone: nothing further emitted for user 1
    assert(out.count(_._1 == 1L) === 3)
  }

  test("transformWithState ≡ flatMapGroupsWithState on the same stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val batches = Seq(
      Seq(Ev(ts(0), 1L, "error", 2.0), Ev(ts(1), 2L, "purchase", 3.0)),
      Seq(Ev(ts(4), 1L, "reset", 0.0), Ev(ts(5), 2L, "purchase", 4.0)),
      Seq(Ev(ts(90), 3L, "signup", 1.0))) // advances watermark → TTL fires

    val tws = runTws("tws_parity")(batches: _*)

    val mem = MemoryStream[Ev]
    val q = Sessionize.updates(mem.toDS().withWatermark("ts", "0 seconds"))
      .writeStream.format("memory").queryName("fmgws_parity")
      .outputMode(OutputMode.Update).start()
    batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    q.stop()
    val fmgws = spark.table("fmgws_parity")
      .as[(Long, Long, Double, Boolean)].collect().toSeq

    // identical multisets of updates — same aggregates, same resets, same
    // TTL closes — from the two state APIs
    assert(tws.sorted === fmgws.sorted)
  }
}
