package graft.streaming

import graft.{SparkEntry, SparkSuite}
import graft.core.Tables
import org.apache.spark.sql.functions._

/** q128's contract: the streaming LEFT OUTER interval join emits every
  * matched pair plus a null row for exactly those unmatched purchases the
  * final watermark closed — where the global watermark is the MIN of the
  * two branch watermarks (each withWatermark node tracks its own branch's
  * max event time), and eviction is strictly below it. This spec pins
  * that closure rule against an independent batch derivation, the way
  * TwsTimerBoundarySpec pins q113's timer boundary. */
class StreamOuterJoinSpec extends SparkSuite {

  private def msCol(c: String) = (unix_micros(col(c)) / 1000).cast("long")

  test("streamed outer join equals the batch emitted-set replay (min-branch watermark, strict <)") {
    val streamed = SparkEntry.queries("q128_stream_outer_join")(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    val ev = Tables.events(spark, sfDir)
    val v = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_id"), col("ts").as("p_ts"))
    val wMs = math.min(
      v.agg(max(msCol("v_ts"))).head().getLong(0),
      p.agg(max(msCol("p_ts"))).head().getLong(0)) - 30L * 60 * 1000
    val cond = col("user_id") === col("v_user") &&
      col("v_ts") <= col("p_ts") &&
      col("v_ts") > col("p_ts") - expr("INTERVAL 10 MINUTES")
    val pairs = p.join(v, cond).select(col("p_id"), col("p_ts"), col("v_ts"))
    val nulls = p.join(v, cond, "left_anti")
      .filter(msCol("p_ts") < wMs)
      .select(col("p_id"), col("p_ts"), lit(null).cast("timestamp").as("v_ts"))
    val batch = pairs.unionAll(nulls)
      .groupBy(unix_micros(date_trunc("hour", col("p_ts"))).as("hour_us"))
      .agg(count(col("v_ts")).as("n_pairs"),
        count(when(col("v_ts").isNull, lit(1))).as("n_null"),
        countDistinct(col("p_id")).as("n_purchases"))
      .orderBy(col("hour_us"))
      .collect().map(_.toSeq).toSeq
    assert(streamed.nonEmpty && streamed == batch,
      s"stream and batch emitted sets must match (sizes ${streamed.size}/${batch.size})")
    // the rule must actually bite both ways at this SF: some null rows
    // emitted, and some unmatched purchases left unclosed in the tail
    val nNull = streamed.map(_(2).asInstanceOf[Long]).sum
    val unclosed = p.join(v, cond, "left_anti").filter(msCol("p_ts") >= wMs).count()
    assert(nNull > 0, "watermark must close some unmatched purchases at sf0.001")
    assert(unclosed > 0,
      "the unclosed tail must be non-empty for the boundary pin to mean anything")
  }
}
