package graft.olap

import graft.{SparkEntry, SparkSuite}
import graft.core.Tables
import org.apache.spark.sql.functions._

/** q143's contract: the window carry-forward equals a per-purchase
  * brute-force scan of the user's history (last qualifying touch in the
  * 24 h lookback, never the purchase itself). */
class AttributionSpec extends SparkSuite {

  private val touches = Set("view", "click", "signup")

  test("window attribution equals the brute-force per-purchase scan") {
    val events = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_type"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getDouble(4)))
    val byUser = events.groupBy(_._2)
    val expected = events.filter(_._4 == "purchase").map { case (eid, uid, us, _, v) =>
      val history = byUser(uid)
        .filter(e => (e._3, e._1) != ((us, eid)) &&
          (e._3 < us || (e._3 == us && e._1 < eid)))
        .filter(e => touches(e._4))
      val lastTouch = if (history.isEmpty) None
        else Some(history.maxBy(e => (e._3, e._1)))
      val channel = lastTouch match {
        case Some(t) if us - t._3 <= 86400000000L => t._4
        case _ => "direct"
      }
      (channel, v)
    }
    val expectedAgg = expected.groupBy(_._1).map { case (c, vs) =>
      val total = vs.map(v => BigDecimal(v._2).setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum
      (c, (vs.length.toLong, total.toDouble))
    }
    val got = SparkEntry.queries("q143_attribution")(spark, sfDir)
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getDouble(2)))).toMap
    assert(got.keySet == expectedAgg.keySet, s"channels ${got.keySet} vs ${expectedAgg.keySet}")
    expectedAgg.foreach { case (c, (n, total)) =>
      assert(got(c)._1 == n, s"$c count: ${got(c)._1} vs $n")
      assert(math.abs(got(c)._2 - total) < 1e-6, s"$c total: ${got(c)._2} vs $total")
    }
  }

  test("purchases never self-attribute and every purchase is counted once") {
    val nPurchases = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase").count()
    val rows = SparkEntry.queries("q143_attribution")(spark, sfDir).collect()
    assert(rows.map(_.getLong(1)).sum == nPurchases, "attribution partitions purchases")
    assert(!rows.exists(_.getString(0) == "purchase"), "a purchase is never a channel")
  }
}
