package graft

import org.apache.spark.sql.functions._

import graft.analytics.Clusters
import graft.functions.{DotProductExpr, VectorFns}
import graft.vector.{Mmr, TopK}

/** Regressions for the dirty-data/review fixes: zero-norm vectors under
  * ANSI mode, empty documents, negative-similarity MMR, graft_dot misuse,
  * and empty pair lists. */
class RobustnessSpec extends SparkSuite {

  test("zero-norm embedding scores cosine 0 instead of ANSI DIVIDE_BY_ZERO") {
    import spark.implicits._
    val queries = Seq((0L, Seq(1.0f, 0.0f))).toDF("query_id", "qvec")
    val cands = Seq(
      (1L, Seq(1.0f, 0.0f)),
      (2L, Seq(0.0f, 0.0f))) // zero vector — must not crash the job
      .toDF("vec_id", "cvec")
    val rows = TopK.topKCosine(queries, cands, k = 2)
      .orderBy("rank").collect()
    assert(rows.length === 2)
    assert(rows(1).getLong(1) === 2L && rows(1).getDouble(2) === 0.0)
  }

  test("MMR gives anti-correlated candidates their negative-redundancy bonus") {
    // selected = s; A anti-correlated with s must beat the slightly more
    // relevant B that is mildly similar to s (the clamped-at-zero bug
    // would pick B)
    val s = (1L, 1.0, Array(1.0, 0.0))
    val a = (2L, 0.50, Array(-0.9, 0.43589))  // sim(a,s) < 0
    val b = (3L, 0.52, Array(0.05, 0.99875))  // sim(b,s) ≈ 0.05
    val picked = Mmr.select(Seq(s, a, b), k = 2, lambda = 0.5).map(_._1)
    assert(picked === Seq(1L, 2L))
  }

  test("empty document text yields zero chunks/pages without crashing") {
    import spark.implicits._
    // drive the same expression shape as q02_chunk_stride on an empty doc
    val df = Seq((1L, "abc"), (2L, "")).toDF("doc_id", "text")
      .filter(length(col("text")) > 0)
      .withColumn("len", length(col("text")))
      .select(col("doc_id"),
        posexplode(sequence(lit(0), col("len") - 1, lit(2))).as(Seq("i", "s")))
    assert(df.count() === 2) // only doc 1's starts; no exception
  }

  test("graft_dot: int arrays auto-cast, wrong arity and non-arrays rejected") {
    DotProductExpr.registerSql(spark)
    val v = spark.sql("SELECT graft_dot(array(1, 2), array(3, 4)) AS d")
      .collect().head.getDouble(0)
    assert(v === 11.0)
    val arity = intercept[Exception](spark.sql("SELECT graft_dot(array(1.0D))"))
    assert(arity.getMessage.contains("2 arguments"))
    val typed = intercept[Exception](
      spark.sql("SELECT graft_dot('x', 'y')").collect())
    assert(typed.getMessage.toLowerCase.contains("graft_dot") ||
      typed.getMessage.toLowerCase.contains("array"))
  }

  test("connectedComponents on an empty pair list returns empty, no NPE") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("id1", "id2")
    assert(Clusters.connectedComponents(empty).count() === 0)
  }

  test("VectorFns.cosine column form is zero-safe too") {
    import spark.implicits._
    val df = Seq((Seq(0.0, 0.0), Seq(1.0, 2.0))).toDF("a", "b")
    val v = df.select(VectorFns.cosine(col("a"), col("b"))).collect().head.getDouble(0)
    assert(v === 0.0)
  }

  test("int8 quantization of the all-zero vector: codes 0, zero error, no NaN") {
    import spark.implicits._
    val emb = Seq(
      (1L, 7, Seq(0.0f, 0.0f, 0.0f, 0.0f)),
      (2L, 7, Seq(0.5f, -0.25f, 0.0f, 0.125f)))
      .toDF("vec_id", "label", "embedding")
    val rows = graft.queries.VectorQueries.quantize(emb)
      .orderBy("vec_id").collect()
    val zero = rows(0)
    assert(zero.getDouble(2) === 0.0 && zero.getDouble(3) === 0.0 && zero.getDouble(4) === 0.0,
      s"zero vector must quantize to zero error, got $zero")
    assert(!rows.exists(r => r.getDouble(3).isNaN || r.getDouble(4).isNaN))
  }
}
