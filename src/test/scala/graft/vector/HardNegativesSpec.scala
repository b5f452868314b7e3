package graft.vector

import graft.{SparkEntry, SparkSuite}
import graft.core.Tables
import org.apache.spark.sql.functions._

/** q138's contract: negatives are cross-label, ranked by true cosine; the
  * positive is the nearest same-label neighbor; the whole reduction rides
  * one (anchor, class) window (WindowGroupLimit below the shuffle). */
class HardNegativesSpec extends SparkSuite {

  private lazy val rows = SparkEntry.queries("q138_hard_negatives")(spark, sfDir)
    .collect()
  private lazy val labels = Tables.embeddings(spark, sfDir)
    .select(col("vec_id"), col("label")).collect()
    .map(r => r.getLong(0) -> r.getInt(1)).toMap

  test("every mined negative is cross-label, every positive same-label") {
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val anchor = r.getLong(0)
      assert(r.getInt(2) == labels(r.getLong(1)), "neg_label column is the candidate's label")
      assert(labels(r.getLong(1)) != labels(anchor), s"negative shares anchor $anchor's label")
      assert(labels(r.getLong(5)) == labels(anchor), s"positive must share anchor $anchor's label")
    }
  }

  test("ranks are 1..5 per anchor with non-increasing cosine; margin is exact") {
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val byRank = rs.sortBy(_.getInt(4))
      assert(byRank.map(_.getInt(4)).toSeq == (1 to byRank.length))
      assert(byRank.length == 5)
      val cosines = byRank.map(_.getDouble(3)).toSeq
      assert(cosines == cosines.sorted.reverse, "neg_cos must be non-increasing in rank")
    }
    rows.foreach { r =>
      val expect = BigDecimal(r.getDouble(3) - r.getDouble(6))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getDouble(7) - expect) < 1e-9, "margin = neg_cos - pos_cos")
    }
  }

  test("the positive is the true nearest same-label neighbor (brute force)") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      .as[(Long, Int, Seq[Double])].collect()
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.lazyZip(b).map(_ * _).sum
      val na = math.sqrt(a.map(x => x * x).sum); val nb = math.sqrt(b.map(x => x * x).sum)
      if (na == 0 || nb == 0) 0.0 else dot / (na * nb)
    }
    val byId = emb.map(e => e._1 -> e).toMap
    rows.groupBy(_.getLong(0)).foreach { case (anchor, rs) =>
      val (_, albl, av) = byId(anchor)
      val bestPos = emb.filter(e => e._1 != anchor && e._2 == albl)
        .map(e => (-cos(av, e._3), e._1)).min._2
      assert(rs.head.getLong(5) == bestPos, s"anchor $anchor nearest positive")
    }
  }

  test("plan: group limit is pushed below the single ranking shuffle") {
    val plan = SparkEntry.queries("q138_hard_negatives")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), "rank<=k must compile to WindowGroupLimit")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      "anchors must broadcast — the candidate side is never shuffled for scoring")
  }
}
