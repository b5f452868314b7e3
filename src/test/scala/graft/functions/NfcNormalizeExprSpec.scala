package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** All Unicode literals are \\u escapes so the source encodes EXACTLY
  * the decomposed/precomposed forms under test (an editor or formatter
  * could silently normalize literal characters). */
class NfcNormalizeExprSpec extends SparkSuite {
  import NfcNormalizeExpr.nfc

  private def nfcOf(s: String): String = {
    import spark.implicits._
    Seq(s).toDF("t").select(nfc(col("t"))).collect()(0).getString(0)
  }

  test("composes decomposed sequences; precomposed and ASCII are identity") {
    assert(nfcOf("cafe\u0301") === "caf\u00e9") // e + combining acute composes
    assert(nfcOf("caf\u00e9") === "caf\u00e9")
    assert(nfcOf("plain ascii") === "plain ascii")
    assert(nfcOf("") === "")
    // Hangul: conjoining jamo compose to a syllable block
    assert(nfcOf("\u1100\u1161") === "\uac00")
  }

  test("null propagates; non-string argument fails analysis") {
    import spark.implicits._
    val withNull = Seq(Some("a"), None).toDF("t").select(nfc(col("t"))).collect()
    assert(withNull(1).isNullAt(0))
    val err = intercept[Exception] {
      Seq(1).toDF("n").select(nfc(col("n"))).collect()
    }
    assert(err.getMessage.toLowerCase.contains("string"))
  }

  test("SQL surface: graft_nfc registered by GraftExtensions") {
    val r = spark.sql("SELECT graft_nfc('cafe\u0301') AS n")
      .collect()(0).getString(0)
    assert(r === "caf\u00e9")
  }

  test("CollapseNfcRule: nested graft_nfc collapses to one in the optimized plan") {
    // a file-backed scan keeps the expression non-foldable (a literal
    // input constant-folds the whole projection away — also correct, but
    // not what this asserts)
    val docs = graft.core.Tables.documents(spark, sfDir)
    val df = docs.select(nfc(nfc(nfc(col("text")))).as("n"), col("doc_id"))
    val optimized = df.queryExecution.optimizedPlan.toString
    val n = "nfcnormalize".r.findAllIn(optimized.toLowerCase).length
    // the rule (injected by GraftExtensions) must leave exactly one
    assert(n === 1, s"nested NFC not collapsed (found $n) in:\n$optimized")
    val single = docs.select(nfc(col("text")).as("n"), col("doc_id"))
    assert(df.orderBy("doc_id").collect().map(_.getString(0)).toSeq ===
      single.orderBy("doc_id").collect().map(_.getString(0)).toSeq)
  }

  test("interpreted path (nullSafeEval) agrees with codegen") {
    val e = NfcNormalizeExpr(
      org.apache.spark.sql.catalyst.expressions.Literal("cafe\u0301 ko \u1100\u1161"))
    val interpreted = e.eval(null).toString
    assert(interpreted === nfcOf("cafe\u0301 ko \u1100\u1161"))
  }
}
