package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite

class DotProductExprSpec extends SparkSuite {

  test("native dot equals HOF dot bit-for-bit on real embeddings") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), VectorFns.asDouble(col("embedding")).as("v"))
    val a = emb.filter(col("vec_id") < 10).select(col("vec_id").as("ida"), col("v").as("va"))
    val b = emb.filter(col("vec_id") >= 10 && col("vec_id") < 20)
      .select(col("vec_id").as("idb"), col("v").as("vb"))
    val both = a.crossJoin(b)
      .select(
        VectorFns.dot(col("va"), col("vb")).as("native"),
        VectorFns.dotHof(col("va"), col("vb")).as("hof"))
      .collect()
    assert(both.length === 100)
    both.foreach(r => assert(r.getDouble(0) === r.getDouble(1)))
  }

  test("null array yields null, empty arrays yield 0") {
    import spark.implicits._
    val df = Seq(
      (Some(Seq(1.0, 2.0)), Some(Seq(3.0, 4.0))),
      (None, Some(Seq(1.0))),
      (Some(Seq.empty[Double]), Some(Seq.empty[Double])))
      .toDF("a", "b")
    val out = df.select(VectorFns.dot(col("a"), col("b"))).collect()
    assert(out(0).getDouble(0) === 11.0)
    assert(out(1).isNullAt(0))
    assert(out(2).getDouble(0) === 0.0)
  }

  test("graft_dot is callable from SQL after registration") {
    DotProductExpr.registerSql(spark)
    val v = spark.sql(
      "SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .collect().head.getDouble(0)
    assert(v === 11.0)
  }

  test("spark.sql.extensions=graft.functions.GraftExtensions injects graft_dot at session build") {
    // newSession() rebuilds session state from the injected extensions but
    // does NOT inherit registerSql's session-scoped temp functions — so
    // graft_dot resolving here proves the declarative injection path, not
    // a leak from the registerSql test above
    val s2 = spark.newSession()
    val v = s2.sql("SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .collect().head.getDouble(0)
    assert(v === 11.0)
    // auto-cast path for non-double numeric arrays
    val w = s2.sql("SELECT graft_dot(array(1, 2), array(3, 4)) AS d")
      .collect().head.getDouble(0)
    assert(w === 11.0)
  }

  test("interpreted eval matches codegen (non-codegen path via filter on literal)") {
    val e = DotProductExpr.dotNative(
      array(lit(1.5), lit(2.0)), array(lit(2.0), lit(0.5)))
    import spark.implicits._
    val v = Seq(1).toDF("x").select(e.as("d")).collect().head.getDouble(0)
    assert(v === 4.0)
  }
}
