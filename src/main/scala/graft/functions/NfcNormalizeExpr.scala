package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_nfc(STRING) → STRING`: Unicode NFC canonical composition — the
  * normalization step every web-scale text pipeline runs before hashing
  * or deduplicating (the same logical text arrives composed from one
  * site and decomposed from another; unnormalized, `café` ≠ `café` and
  * every dedup family silently splits the group).
  *
  * Spark has no normalization builtin, so this is the §7.3 tier-b path:
  * a native codegen `UnaryExpression` wrapping the JDK's
  * `java.text.Normalizer` (ICU-grade, correct over the full BMP +
  * astral planes), staying inside whole-stage codegen — the alternative
  * Scala UDF pays the encoder round trip per row. The common case
  * (already-NFC ASCII corpora) is handled by `Normalizer.isNormalized`'s
  * quick check before any allocation.
  *
  * Cross-engine: DuckDB ships `nfc_normalize`, so queries over this
  * expression stay under the bit-exact oracle gate — both engines
  * implement the same Unicode canonical composition.
  */
case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_nfc requires a STRING argument, got ${t.sql}")
  }

  override def nullSafeEval(s: Any): Any = {
    val str = s.asInstanceOf[UTF8String].toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val str = ctx.freshName("str")
      s"""
         |java.lang.String $str = $x.toString();
         |if (java.text.Normalizer.isNormalized($str, java.text.Normalizer.Form.NFC)) {
         |  ${ev.value} = $x;
         |} else {
         |  ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |    java.text.Normalizer.normalize($str, java.text.Normalizer.Form.NFC));
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NfcNormalizeExpr =
    copy(child = newChild)
}

/** `Rule[LogicalPlan]` tier of the extension ladder: NFC is idempotent
  * (Unicode guarantees NFC(NFC(x)) = NFC(x)), so nested applications —
  * which arise naturally when composed pipeline stages each normalize
  * defensively — collapse to one. Injected by GraftExtensions via
  * injectOptimizerRule; the spec asserts the optimized plan carries a
  * single NfcNormalizeExpr and that results are unchanged. */
object CollapseNfcRule extends org.apache.spark.sql.catalyst.rules.Rule[
    org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {
  override def apply(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    plan.transformAllExpressions {
      case NfcNormalizeExpr(inner @ NfcNormalizeExpr(_)) => inner
    }
}

object NfcNormalizeExpr {
  /** Column form over a STRING column. */
  def nfc(s: Column): Column =
    Bridge.column(NfcNormalizeExpr(Bridge.expression(s)))

  /** SQL builder shared with [[GraftExtensions]]. */
  private[functions] val sqlBuilder: Seq[Expression] => Expression = exprs => {
    if (exprs.length != 1)
      throw new IllegalArgumentException(
        s"graft_nfc takes exactly 1 argument, got ${exprs.length}")
    NfcNormalizeExpr(exprs.head)
  }
}
