package graft.vector

import org.apache.spark.ml.feature.BucketedRandomProjectionLSH
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.functions.VectorFns

/** SURVEY §7.2 step 8: cross-check MLlib's approxSimilarityJoin against
  * the exact cosine similarity join (O23) on sf0.001.
  *
  * Cosine ↔ Euclidean bridge: on L2-normalized vectors,
  * ||a−b||² = 2−2·cos(a,b), so cos ≥ 0.35 ⇔ dist ≤ sqrt(1.3).
  * The LSH join is probabilistic (it may miss pairs); with a fixed seed
  * and 8 hash tables we assert (a) every reported pair is truly within
  * the threshold — no false positives, MLlib filters exactly — and
  * (b) recall against the exact join is substantial. */
class MllibCrossCheckSpec extends SparkSuite {

  test("approxSimilarityJoin agrees with the exact cosine join") {
    import spark.implicits._
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), VectorFns.asDouble(col("embedding")).as("v"))
      .withColumn("n", VectorFns.normL2(col("v")))
      .withColumn("vn", expr("transform(v, x -> x / n)"))

    // exact pairs at cos >= 0.35 (all-pairs is fine at 500 rows in a test)
    val a = emb.select(col("vec_id").as("id1"), col("vn").as("v1"))
    val b = emb.select(col("vec_id").as("id2"), col("vn").as("v2"))
    val exact = a.crossJoin(b).filter(col("id1") < col("id2"))
      .withColumn("cos", VectorFns.dot(col("v1"), col("v2")))
      .filter(col("cos") >= 0.35)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty, "test corpus should contain at least one pair above threshold")

    val toVec = udf((xs: Seq[Double]) => Vectors.dense(xs.toArray))
    val ml = emb.select(col("vec_id"), toVec(col("vn")).as("features"))
    val lsh = new BucketedRandomProjectionLSH()
      .setBucketLength(0.5).setNumHashTables(8).setSeed(42)
      .setInputCol("features").setOutputCol("hashes")
    val model = lsh.fit(ml)
    val thresh = math.sqrt(2.0 - 2.0 * 0.35)
    val approx = model.approxSimilarityJoin(ml, ml, thresh, "dist")
      .select(col("datasetA.vec_id").as("id1"), col("datasetB.vec_id").as("id2"))
      .filter(col("id1") < col("id2"))
      .as[(Long, Long)].collect().toSet

    // no false positives: every approx pair is in the exact set
    assert(approx.subsetOf(exact),
      s"approx join reported pairs outside the true threshold: ${approx.diff(exact).take(3)}")
    // substantial recall with 8 tables on 64-d data
    val recall = approx.size.toDouble / exact.size
    assert(recall >= 0.5, s"recall $recall (${approx.size}/${exact.size})")
  }
}
