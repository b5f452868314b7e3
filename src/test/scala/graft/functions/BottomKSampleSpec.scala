package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** BottomKSampleAgg's contracts: the sketch is a deterministic function
  * of the data (identical bytes under any partitioning / merge order),
  * below k it is exact, and past k its sample quantiles obey the DKW
  * rank bound the q165 witness commits to. */
class BottomKSampleSpec extends SparkSuite {

  import BottomKSampleAgg.bkSample
  import BkSampleQuantileExpr.bkQuantile

  private def sketchOf(nParts: Int, n: Int, k: Int): Array[Byte] = {
    import spark.implicits._
    (0 until n).map(_.toLong).toDF("id").repartition(nParts)
      .agg(bkSample(xxhash64(col("id")), col("id").cast("double"), k).as("sk"))
      .head().getAs[Array[Byte]]("sk")
  }

  test("merge-order independence: 1-partition and 32-partition sketches are bit-equal") {
    assert(java.util.Arrays.equals(sketchOf(1, 5000, 256), sketchOf(32, 5000, 256)))
  }

  test("below k the sample is the group and quantiles are exact") {
    import spark.implicits._
    val vals = Seq(3.0, 1.0, 9.0, 7.0, 5.0)
    val out = vals.toDF("v").withColumn("id", monotonically_increasing_id())
      .agg(bkSample(xxhash64(col("id")), col("v"), 64).as("sk"))
      .select(bkQuantile(col("sk"), 0.5).as("p50"),
        bkQuantile(col("sk"), 0.2).as("p20"),
        bkQuantile(col("sk"), 1.0).as("p100"))
      .head()
    assert(out.getDouble(0) === 5.0) // ceil(0.5*5)=3rd of 1,3,5,7,9
    assert(out.getDouble(1) === 1.0)
    assert(out.getDouble(2) === 9.0)
  }

  test("past k the sample quantile's exact rank is within 2.5/sqrt(k)") {
    import spark.implicits._
    val n = 20000
    val k = 256
    val eps = 2.5 / math.sqrt(k.toDouble)
    val df = (0 until n).map(_.toLong).toDF("id")
      .select(col("id"), (col("id") % 1000).cast("double").as("v"))
    val est = df.agg(bkSample(xxhash64(col("id")), col("v"), k).as("sk"))
      .select(bkQuantile(col("sk"), 0.25).as("e25"),
        bkQuantile(col("sk"), 0.5).as("e50"),
        bkQuantile(col("sk"), 0.95).as("e95")).head()
    for ((p, e) <- Seq(0.25 -> est.getDouble(0), 0.5 -> est.getDouble(1),
        0.95 -> est.getDouble(2))) {
      val lt = df.filter(col("v") < e).count().toDouble / n
      val le = df.filter(col("v") <= e).count().toDouble / n
      assert(lt < p + eps && le >= p - eps,
        s"p=$p est=$e ranks [$lt, $le] outside ±$eps")
    }
  }

  test("the SQL surface registers through extensions") {
    import spark.implicits._
    (0 until 100).map(_.toLong).toDF("id").createOrReplaceTempView("bks_t")
    val r = spark.sql(
      """SELECT graft_bksample_quantile(
        |  graft_bksample(xxhash64(id), CAST(id AS DOUBLE), 64), 0.5D) AS p50
        |FROM bks_t""".stripMargin).head()
    // 100 rows > k=64: a genuine sample, but the median of 0..99 under a
    // uniform draw stays within the DKW band around 49.5
    assert(math.abs(r.getDouble(0) - 49.5) <= 2.5 / math.sqrt(64.0) * 100 + 1)
  }
}
