package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSuite
import graft.streaming.Sessionize.Ev

/** Pins the transformWithState timer-expiry boundary the q113 oracle
  * encodes: an event-time timer registered at timestamp T fires as soon
  * as the watermark reaches T (non-strict, `timer <= watermark`), not
  * only once the watermark passes it. If a Spark upgrade flips this to
  * strict comparison, q113's DuckDB oracle (closed iff
  * last_ms + TTL <= max_ms) silently diverges — this spec fails first. */
class TwsTimerBoundarySpec extends SparkSuite {

  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  test("event-time timer fires when watermark EQUALS the timer timestamp") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val t0 = 1704067200000L
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", RocksDb)
    try {
      val mem = MemoryStream[Ev]
      val q = SessionizeTws.updates(mem.toDS().withWatermark("ts", "0 seconds"))
        .writeStream.format("memory").queryName("tws_boundary")
        .outputMode(OutputMode.Update).start()
      // user 1's timer is armed at t0 + TtlMs
      mem.addData(Ev(new Timestamp(t0), 1L, "purchase", 1.0))
      q.processAllAvailable()
      // the watermark lands EXACTLY on the timer — the close must fire
      mem.addData(Ev(new Timestamp(t0 + Sessionize.TtlMs), 2L, "click", 1.0))
      q.processAllAvailable()
      q.stop()
      val closed = spark.table("tws_boundary").as[(Long, Long, Double, Boolean)]
        .collect().filter(r => r._1 == 1L && r._4)
      assert(closed.toSeq === Seq((1L, 1L, 1.0, true)))
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None    => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
