package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** `z_order_key(INT x, INT y) → BIGINT`: the Morton / Z-order interleave of
  * two non-negative ints — x's bits at even positions, y's at odd — the
  * multi-dimensional clustering key Delta's `OPTIMIZE ZORDER BY` and
  * Iceberg's `rewrite_data_files(strategy => 'sort', sort_order => zorder)`
  * sort on (public docs for both; the technique is Morton 1966). Sorting a
  * 100 TB fact table by this key before writing makes every file's min/max
  * footer range TIGHT on BOTH dimensions at once, so a two-dimensional
  * point/box predicate prunes files on whichever column it constrains —
  * where a linear sort only ever prunes on its leading column. q105 puts
  * the whole layout loop (key → sort → per-file ranges → box-pruning
  * stats) under the DuckDB oracle.
  *
  * 31 bits per input → the key occupies bits 0..61 and is always
  * non-negative, so BIGINT comparisons and right-shift bucketing behave
  * identically in Spark and DuckDB (no sign-bit edge). Negative inputs
  * fail loudly — a layout key over negative ids is a modeling bug, and
  * silently masking would scatter them across the keyspace.
  *
  * Codegen: the classic O(log w) mask-spread (Bit Twiddling Hacks,
  * public domain), branch-free inside whole-stage codegen.
  */
case class ZOrderExpr(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (IntegerType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_zorder requires (INT, INT) arguments, got (${l.sql}, ${r.sql})")
    }

  override def nullSafeEval(xa: Any, ya: Any): Any = {
    val x = xa.asInstanceOf[Int]
    val y = ya.asInstanceOf[Int]
    if (x < 0 || y < 0)
      throw new IllegalArgumentException(s"graft_zorder: negative input ($x, $y)")
    ZOrderExpr.interleave(x) | (ZOrderExpr.interleave(y) << 1)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val cls = ZOrderExpr.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"""
         |if ($x < 0 || $y < 0) {
         |  throw new IllegalArgumentException(
         |    "graft_zorder: negative input (" + $x + ", " + $y + ")");
         |}
         |${ev.value} = $cls.interleave($x) | ($cls.interleave($y) << 1);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrderExpr =
    copy(left = newLeft, right = newRight)
}

object ZOrderExpr {

  /** Spread the low 31 bits of `v` to even bit positions 0,2,…,60. */
  def interleave(v: Int): Long = {
    var x = v.toLong & 0x7fffffffL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** Column form over two non-negative INT columns. */
  def zOrderKey(x: Column, y: Column): Column =
    Bridge.column(ZOrderExpr(Bridge.expression(x), Bridge.expression(y)))

  /** SQL builder shared with [[GraftExtensions]]. */
  private[functions] val sqlBuilder: Seq[Expression] => Expression = exprs => {
    if (exprs.length != 2)
      throw new IllegalArgumentException(
        s"graft_zorder takes exactly 2 arguments, got ${exprs.length}")
    ZOrderExpr(exprs.head, exprs(1))
  }
}
