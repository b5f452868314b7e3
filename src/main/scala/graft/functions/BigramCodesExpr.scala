package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `byte_bigram_codes(STRING) → ARRAY<INT>`: adjacent-byte bigram codes
  * `(b[i] << 8) | b[i+1]` over the string's UTF-8 bytes — the feature
  * extractor for the q58 char-LM fluency model, as a native codegen
  * Expression (SURVEY §7.3 tier b: "custom Expression for perf only —
  * measure first").
  *
  * Measured first: the SQL-only forms are pathological here. Per-position
  * `substring(text, i, 2)` is O(n²) PER DOC (UTF8String.substring walks
  * from byte 0 to locate char i on every call) — 60.8 s warm at the
  * 16×-docs rung; `split(text, '')` + zip_with is O(n) but allocates
  * ~1 000 single-char UTF8Strings per doc — 19.5 s. This expression is
  * one `getBytes` + a primitive int loop into an UnsafeArrayData: 2.2 s.
  *
  * Semantics are BYTE bigrams: identical to character bigrams on ASCII
  * corpora (spec-guarded for the fixtures; the DuckDB oracle's
  * `ord(c)·256 + ord(c')` matches exactly there), and well-defined —
  * byte-level next-symbol statistics — on any UTF-8 input.
  */
case class BigramCodesExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_bigram_codes requires a STRING argument, got ${t.sql}")
  }

  override def nullSafeEval(s: Any): Any = {
    val b = s.asInstanceOf[UTF8String].getBytes
    val n = math.max(b.length - 1, 0)
    val out = new Array[Int](n)
    var i = 0
    while (i < n) { out(i) = ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff); i += 1 }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val b = ctx.freshName("bts")
      val n = ctx.freshName("n")
      val arr = ctx.freshName("arr")
      val i = ctx.freshName("i")
      s"""
         |byte[] $b = $x.getBytes();
         |int $n = java.lang.Math.max($b.length - 1, 0);
         |int[] $arr = new int[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $arr[$i] = (($b[$i] & 0xFF) << 8) | ($b[$i + 1] & 0xFF);
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($arr);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): BigramCodesExpr =
    copy(child = newChild)
}

object BigramCodesExpr {
  /** Column form over a STRING column. */
  def bigramCodes(s: Column): Column =
    Bridge.column(BigramCodesExpr(Bridge.expression(s)))

  /** SQL builder shared with [[GraftExtensions]]. */
  private[functions] val sqlBuilder: Seq[Expression] => Expression = exprs => {
    if (exprs.length != 1)
      throw new IllegalArgumentException(
        s"graft_bigram_codes takes exactly 1 argument, got ${exprs.length}")
    BigramCodesExpr(exprs.head)
  }
}
