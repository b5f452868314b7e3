package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite

class BigramCodesExprSpec extends SparkSuite {
  import BigramCodesExpr.bigramCodes

  private def codesOf(s: String): Seq[Int] = {
    import spark.implicits._
    Seq(s).toDF("t").select(bigramCodes(col("t"))).collect()(0)
      .getSeq[Int](0)
  }

  test("matches the char-split HOF form on ASCII text") {
    import spark.implicits._
    val texts = Seq("abc def", "x", "", "the quick brown fox", "a b")
    val df = texts.toDF("t")
    val viaExpr = df.select(bigramCodes(col("t")).as("c")).collect().map(_.getSeq[Int](0))
    val viaHof = df.select(expr(
      """zip_with(slice(transform(filter(split(t, ''), x -> x != ''), c -> ascii(c)), 1, greatest(length(t) - 1, 0)),
        |         slice(transform(filter(split(t, ''), x -> x != ''), c -> ascii(c)), 2, greatest(length(t) - 1, 0)),
        |         (a, b) -> a * 256 + b)""".stripMargin).as("c"))
      .collect().map(_.getSeq[Int](0))
    viaExpr.zip(viaHof).foreach { case (a, b) => assert(a === b) }
  }

  test("edge cases: empty, single char, null") {
    import spark.implicits._
    assert(codesOf("") === Seq.empty)
    assert(codesOf("q") === Seq.empty)
    assert(codesOf("ab") === Seq('a'.toInt * 256 + 'b'.toInt))
    val withNull = Seq(Some("ab"), None).toDF("t")
      .select(bigramCodes(col("t"))).collect()
    assert(withNull(1).isNullAt(0))
  }

  test("SQL surface: graft_bigram_codes registered by GraftExtensions") {
    val r = spark.sql("SELECT graft_bigram_codes('abc') AS c").collect()(0).getSeq[Int](0)
    assert(r === Seq('a'.toInt * 256 + 'b'.toInt, 'b'.toInt * 256 + 'c'.toInt))
  }

  test("interpreted path (nullSafeEval) agrees with codegen") {
    val e = BigramCodesExpr(org.apache.spark.sql.catalyst.expressions.Literal("hello"))
    val interpreted = e.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toIntArray().toSeq
    assert(interpreted === codesOf("hello"))
  }
}
