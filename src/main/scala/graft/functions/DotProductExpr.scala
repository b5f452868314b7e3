package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType}

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

  // callers are internal (VectorFns routes ARRAY<DOUBLE> only), so no
  // ExpectsInputTypes coercion machinery is needed
  override def dataType: DataType = DoubleType

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

  /** Make `graft_dot(a, b)` callable from SQL strings on this session. */
  def registerSql(spark: org.apache.spark.sql.SparkSession): Unit =
    Bridge.registerFunction(spark, "graft_dot",
      (exprs: Seq[Expression]) => DotProductExpr(exprs(0), exprs(1)))
}
