package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Bit-parity of the r20 literal-codebook kernels with the r19 join
  * forms they replaced: PqNearestExpr ≡ broadcast-join + min_by(code,
  * struct(d2, code)), PqNearestCellExpr ≡ crossJoin + max_by(cent_id,
  * struct(cdot, -cent_id)) — same argmin/argmax, same ranking
  * arithmetic (cn2 − 2·dot, left-to-right folds), same tie-breaks. */
class PqNearestExprSpec extends SparkSuite {

  private def rngVec(r: scala.util.Random, d: Int): Seq[Double] =
    Seq.fill(d)(r.nextDouble() * 2 - 1)

  test("nearest code ≡ join + min_by(code, struct(d2, code)) on random data") {
    import spark.implicits._
    val r = new scala.util.Random(42)
    val M = 4; val K = 8; val dsub = 3
    val cb: Seq[(Int, Int, Seq[Double])] =
      for (m <- 0 until M; k <- 0 until K) yield (m, k, rngVec(r, dsub))
    val sub = (for (id <- 0 until 200; m <- 0 until M)
      yield (id.toLong, m, rngVec(r, dsub))).toDF("id", "m", "sv")
    // the r19 join form, verbatim
    val cbDf = cb.toDF("m", "code", "cv")
      .withColumn("cn2", expr("aggregate(cv, 0D, (acc, x) -> acc + x * x)"))
    val joined = sub.join(broadcast(cbDf), Seq("m"))
      .withColumn("d2", col("cn2") - lit(2.0d) *
        graft.functions.DotProductExpr.dotNative(col("sv"), col("cv")))
      .groupBy(col("id"), col("m"))
      .agg(expr("min_by(code, struct(d2, code))").as("code"))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getInt(2)).toMap
    val literal = sub.select(col("id"), col("m"),
        PqNearestExpr.nearest(col("m"), col("sv"), cb).as("code"))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getInt(2)).toMap
    assert(literal === joined)
  }

  test("exact-tie between two codes breaks toward the LOWER code") {
    import spark.implicits._
    // two identical centroids → identical d2 → min_by picks code 1 < 7
    val cb = Seq((0, 7, Seq(1.0, 2.0)), (0, 1, Seq(1.0, 2.0)))
    val sub = Seq((0L, 0, Seq(0.5, 0.5))).toDF("id", "m", "sv")
    val got = sub.select(PqNearestExpr.nearest(col("m"), col("sv"), cb))
      .collect()(0).getInt(0)
    assert(got === 1)
  }

  test("nearest cell ≡ crossJoin + max_by(cent_id, struct(cdot, -cent_id))") {
    import spark.implicits._
    val r = new scala.util.Random(7)
    val d = 5
    val cents: Seq[(Long, Seq[Double])] =
      (0 until 16).map(i => (i * 100L, rngVec(r, d)))
    val vecs = (0 until 300).map(i => (i.toLong, rngVec(r, d))).toDF("vec_id", "v")
    val centDf = cents.toDF("cent_id", "cv")
    val joined = vecs.crossJoin(broadcast(centDf))
      .withColumn("cdot",
        graft.functions.DotProductExpr.dotNative(col("v"), col("cv")))
      .groupBy(col("vec_id"))
      .agg(expr("max_by(cent_id, struct(cdot, -cent_id))").as("cell"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val literal = vecs.select(col("vec_id"),
        PqNearestCellExpr.nearestCell(col("v"), cents).as("cell"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(literal === joined)
  }

  test("cell tie (duplicate centroid) breaks toward the LOWER cent_id") {
    import spark.implicits._
    val cents = Seq((9L, Seq(1.0, 0.0)), (3L, Seq(1.0, 0.0)))
    val vecs = Seq((0L, Seq(1.0, 0.0))).toDF("vec_id", "v")
    val got = vecs.select(PqNearestCellExpr.nearestCell(col("v"), cents))
      .collect()(0).getLong(0)
    assert(got === 3L)
  }

  test("cosine nearest cell ≡ crossJoin + max_by over safeCosine (un-normalized)") {
    import spark.implicits._
    val r = new scala.util.Random(11)
    val d = 6
    def norm(v: Seq[Double]): Double =
      math.sqrt(v.foldLeft(0.0)((acc, x) => acc + x * x))
    val cents: Seq[(Long, Seq[Double], Double)] =
      (0 until 12).map { i => val v = rngVec(r, d); (i * 10L, v, norm(v)) }
    val vecs = (0 until 250).map { i =>
      val v = rngVec(r, d); (i.toLong, v, norm(v))
    }.toDF("vec_id", "v", "n")
    val centDf = cents.toDF("cent_id", "cv", "cn")
    val joined = vecs.crossJoin(broadcast(centDf))
      .withColumn("ccos", VectorFns.safeCosine(
        graft.functions.DotProductExpr.dotNative(col("v"), col("cv")),
        col("n"), col("cn")))
      .groupBy(col("vec_id"))
      .agg(expr("max_by(cent_id, struct(ccos, -cent_id))").as("cell"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val literal = vecs.select(col("vec_id"),
        CosineNearestCellExpr.nearestCellCosine(col("v"), col("n"), cents).as("cell"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(literal === joined)
  }

  test("NaN inputs order like min_by/max_by struct ordering (NaN largest)") {
    import spark.implicits._
    // NaN sv → every d2 NaN → min_by falls to the code tie-break (lowest);
    // the kernel's Double.compare scan must agree
    val cb = Seq((0, 5, Seq(1.0)), (0, 2, Seq(2.0)))
    val sub = Seq((0L, 0, Seq(Double.NaN))).toDF("id", "m", "sv")
    val got = sub.select(PqNearestExpr.nearest(col("m"), col("sv"), cb))
      .collect()(0).getInt(0)
    assert(got === 2)
    // NaN v → every cdot NaN → max_by falls to -cent_id (lowest id wins)
    val vecs = Seq((0L, Seq(Double.NaN))).toDF("vec_id", "v")
    val cell = vecs.select(PqNearestCellExpr.nearestCell(col("v"),
        Seq((9L, Seq(1.0)), (4L, Seq(2.0)))))
      .collect()(0).getLong(0)
    assert(cell === 4L)
  }
}
