package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite

class ZOrderExprSpec extends SparkSuite {
  import ZOrderExpr.zOrderKey

  /** Reference interleave: bit-by-bit, no magic masks. */
  private def naive(x: Int, y: Int): Long =
    (0 until 31).foldLeft(0L) { (acc, i) =>
      acc | (((x.toLong >> i) & 1L) << (2 * i)) | (((y.toLong >> i) & 1L) << (2 * i + 1))
    }

  test("mask-spread interleave matches the naive bit loop") {
    val cases = Seq((0, 0), (1, 0), (0, 1), (1, 1), (5, 3), (0x7fffffff, 0),
      (0, 0x7fffffff), (0x7fffffff, 0x7fffffff), (12345, 67890), (1 << 30, 1 << 30))
    cases.foreach { case (x, y) =>
      assert((ZOrderExpr.interleave(x) | (ZOrderExpr.interleave(y) << 1)) === naive(x, y),
        s"($x, $y)")
    }
    // property sweep over a deterministic grid
    for (x <- 0 to 1000 by 37; y <- 0 to 1000 by 41)
      assert((ZOrderExpr.interleave(x) | (ZOrderExpr.interleave(y) << 1)) === naive(x, y))
  }

  test("key is always non-negative and orders locality-preservingly") {
    // 31+31 bits land in bits 0..61: top bits clear, no sign surprises
    val m = ZOrderExpr.interleave(0x7fffffff) | (ZOrderExpr.interleave(0x7fffffff) << 1)
    assert(m > 0 && (m >> 62) === 0)
    // points in the same small box sort near each other: the max key gap
    // inside a 4x4 cell is bounded while far cells differ in high bits
    assert(naive(3, 3) < naive(4, 0)) // cell (0,0) precedes cell (1,0) at the 4-grid level
  }

  test("Column and SQL forms agree with the eval form; codegen runs") {
    import spark.implicits._
    val df = Seq((3, 5), (0, 0), (1024, 7)).toDF("x", "y")
    val viaCol = df.select(zOrderKey(col("x"), col("y"))).as[Long].collect().toSeq
    df.createOrReplaceTempView("zt")
    val viaSql = spark.sql("SELECT graft_zorder(x, y) FROM zt").as[Long].collect().toSeq
    val expected = Seq(naive(3, 5), naive(0, 0), naive(1024, 7))
    assert(viaCol === expected)
    assert(viaSql === expected)
  }

  test("negative input fails loudly in both eval and codegen paths") {
    import spark.implicits._
    val df = Seq((-1, 5)).toDF("x", "y")
    val ex = intercept[Exception] {
      df.select(zOrderKey(col("x"), col("y"))).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(ex).exists(_.getMessage != null) &&
      causes(ex).exists(c => c.getMessage != null && c.getMessage.contains("negative input")))
  }

  test("type check rejects non-INT arguments") {
    import spark.implicits._
    val df = Seq(("a", 1L)).toDF("s", "l")
    val ex = intercept[Exception] {
      df.select(zOrderKey(col("s"), col("l"))).collect()
    }
    assert(ex.getMessage.contains("graft_zorder") || ex.getMessage.contains("INT"))
  }
}
