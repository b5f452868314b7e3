package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression for the similarity hot path (SURVEY §2.8 /
  * §7.3: "custom codegen Expression for perf only — measure first").
  *
  * `dot(ARRAY<DOUBLE>, ARRAY<DOUBLE>) → DOUBLE` as a tight primitive loop
  * over ArrayData. The higher-order-function form
  * (`aggregate(zip_with(a,b,*),0d,+)`) stays in whole-stage codegen too,
  * but materializes the zipped intermediate array per pair and walks it
  * twice; in an n×m similarity join that allocation dominates. This
  * expression generates `acc += a.getDouble(i) * b.getDouble(i)` directly —
  * no intermediate array, no lambda dispatch — and falls back to an
  * identical interpreted loop when codegen is off.
  *
  * Summation order is left-to-right exactly like the HOF form and the
  * DuckDB oracle, so results stay bit-identical across all three paths.
  */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  // reject non-double arrays at analysis time instead of ClassCastException
  // (or silent codegen garbage) at execution — SQL users reach this via
  // graft_dot, whose builder also auto-casts numeric arrays (below)
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_dot requires two ARRAY<DOUBLE> arguments, got ${l.sql} and ${r.sql}")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $x.getDouble($i) * $y.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductExpr =
    copy(left = newLeft, right = newRight)
}

object DotProductExpr {
  /** Column form: dotNative(a, b) over ARRAY<DOUBLE> columns. */
  def dotNative(a: Column, b: Column): Column =
    Bridge.column(DotProductExpr(Bridge.expression(a), Bridge.expression(b)))

  /** SQL builder: enforces arity and auto-casts numeric arrays to
    * ARRAY<DOUBLE> so `graft_dot(array(1, 2), array(3, 4))` works.
    * Shared by [[registerSql]] and [[GraftExtensions]]. */
  private[functions] val sqlBuilder: Seq[Expression] => Expression = exprs => {
    if (exprs.length != 2)
      throw new IllegalArgumentException(
        s"graft_dot takes exactly 2 arguments, got ${exprs.length}")
    def coerce(e: Expression): Expression = e.dataType match {
      case ArrayType(DoubleType, _) => e
      case ArrayType(_, cn) => Cast(e, ArrayType(DoubleType, cn))
      case _ => e // let checkInputDataTypes report it
    }
    DotProductExpr(coerce(exprs(0)), coerce(exprs(1)))
  }

  /** Make `graft_dot(a, b)` callable from SQL strings on this session. */
  def registerSql(spark: org.apache.spark.sql.SparkSession): Unit =
    Bridge.registerFunction(spark, "graft_dot", sqlBuilder)
}
