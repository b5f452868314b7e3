package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftbridge.Bridge

/** The whole-operator tier of the custom-operator ladder (SURVEY §7.3
  * tier c): a dedicated AS-OF JOIN — logical node, planner strategy, and
  * merge-based physical operator — registered via SparkSessionExtensions.
  *
  * WHY a custom operator when q13 already composes as-of from built-ins:
  * the composed plan (equi-join on key + time-range predicate +
  * row_number window) MATERIALIZES every (left row, earlier right row)
  * pair before the window discards all but one — O(L·R) rows per key
  * through the join, then a second sort for the window. This operator is
  * the classic streaming merge: both sides arrive hash-partitioned on
  * the key and sorted by (key, time) — requirements Catalyst's
  * EnsureRequirements enforces with ordinary exchanges/sorts — and one
  * forward pass per partition emits each left row with the LAST right
  * row at-or-before its time: O(L+R), no pair blow-up, no second sort.
  * At 100 TB the pair stream is the difference between a job that runs
  * and one that doesn't (a user with E errors and P purchases produces
  * E·P intermediate rows composed, max(E,P) here).
  *
  * Semantics (pandas merge_asof backward): for each left row, the right
  * row with the greatest (time, tieBreak) such that right.key = left.key
  * and right.time <= left.time. Inner mode drops unmatched left rows;
  * outer mode (merge_asof's default) keeps them with a null right side.
  * Null keys/times never match. Bit-exactness vs the composed forms is
  * oracle-checked (q13b shares q13's DuckDB oracle; q13c has the LEFT
  * JOIN twin) and spec-pinned.
  */
case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    rightTieBreak: Expression,
    outer: Boolean) extends BinaryNode {

  // left-outer keeps unmatched left rows with a null right side, so the
  // right attributes must surface nullable (pandas merge_asof's default)
  override def output: Seq[Attribute] =
    if (outer) left.output ++ right.output.map(_.withNullability(true))
    else left.output ++ right.output

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    rightTieBreak: Expression,
    outer: Boolean) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    if (outer) left.output ++ right.output.map(_.withNullability(true))
    else left.output ++ right.output

  // both sides hash-partitioned on the key (EnsureRequirements inserts
  // compatible exchanges) ...
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  // ... and sorted so one forward pass per partition suffices; the right
  // tie-break sorts ascending so the LAST row advanced past at equal
  // times is the max-tie row (matching the composed form's
  // `ORDER BY time DESC, tie DESC ... rn = 1` pick)
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending),
      SortOrder(rightTieBreak, Ascending)))

  override def outputPartitioning = left.outputPartitioning

  // the merge emits ≤1 row per left row, in left-scan order — the
  // (key, time) sort is preserved, so declare it and spare downstream
  // windows/sorts on the same columns a redundant re-sort
  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  // Comparator chosen ONCE from the static type, not per row — the merge
  // compares twice per right-row advance, so a per-compare pattern match
  // is pure loop overhead. Float/Double go through primitive compare with
  // an equality short-circuit: primitive == treats -0.0 == 0.0 (SQL
  // semantics — the composed q13 join and the shuffle writer agree),
  // while NaN == NaN falls through to Double.compare, which orders NaN
  // consistently (SQL's NaN = NaN is also true: compare yields 0 there).
  private def cmpFor(dt: org.apache.spark.sql.types.DataType): (Any, Any) => Int = {
    import org.apache.spark.sql.types.{DoubleType, FloatType}
    dt match {
      case DoubleType => (a, b) => {
        val x = a.asInstanceOf[Double]; val y = b.asInstanceOf[Double]
        if (x == y) 0 else java.lang.Double.compare(x, y)
      }
      case FloatType => (a, b) => {
        val x = a.asInstanceOf[Float]; val y = b.asInstanceOf[Float]
        if (x == y) 0 else java.lang.Float.compare(x, y)
      }
      case _ => (a, b) => a.asInstanceOf[Comparable[Any]].compareTo(b)
    }
  }

  protected override def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lk = BindReferences.bindReference(leftKey, lOut)
    val lt = BindReferences.bindReference(leftTime, lOut)
    val rk = BindReferences.bindReference(rightKey, rOut)
    val rt = BindReferences.bindReference(rightTime, rOut)
    val outAttrs = output
    val isOuter = outer
    val keyCmp = cmpFor(leftKey.dataType)
    val timeCmp = cmpFor(leftTime.dataType)
    // the projection's INPUT schema must declare the right side nullable
    // in outer mode, or generated code skips null checks on the all-null
    // row and reads zeros (caught by AsOfJoinPlanSpec's outer test)
    val rOutIn = if (isOuter) rOut.map(_.withNullability(true)) else rOut
    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val result = UnsafeProjection.create(outAttrs, lOut ++ rOutIn)
      val joined = new JoinedRow
      val nullRight: InternalRow =
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(rOut.length)
      // single-row lookahead; every advanced right row is copied because
      // Spark row iterators reuse the underlying object
      var rHead: InternalRow = if (rIt.hasNext) rIt.next().copy() else null
      def advanceRight(): Unit =
        rHead = if (rIt.hasNext) rIt.next().copy() else null
      var lastKey: Any = null
      var lastMatch: InternalRow = null
      lIt.flatMap { l =>
        val k = lk.eval(l)
        val t = lt.eval(l)
        if (k == null || t == null) {
          if (isOuter) Iterator.single(result(joined(l, nullRight)))
          else Iterator.empty
        } else {
          var scanning = true
          while (scanning && rHead != null) {
            val rkv = rk.eval(rHead)
            val rtv = rt.eval(rHead)
            if (rkv == null || rtv == null) advanceRight()
            else {
              val c = keyCmp(rkv, k)
              if (c < 0) { lastKey = null; lastMatch = null; advanceRight() }
              else if (c == 0 && timeCmp(rtv, t) <= 0) {
                lastKey = rkv; lastMatch = rHead; advanceRight()
              } else scanning = false
            }
          }
          if (lastMatch != null && lastKey != null && keyCmp(lastKey, k) == 0)
            Iterator.single(result(joined(l, lastMatch)))
          else if (isOuter) Iterator.single(result(joined(l, nullRight)))
          else Iterator.empty
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy mapping the logical node to the merge exec —
  * injected by [[graft.functions.GraftExtensions]]. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt, tie, outer) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tie, outer) :: Nil
    case _ => Nil
  }
}

object AsOfJoinOps {
  /** DataFrame surface: as-of join `left` to `right` (inner, backward).
    * Column names must be disjoint between the two frames — alias before
    * joining (loud failure otherwise; a silent exprId collision would
    * mis-resolve downstream selects). */
  def asof(left: DataFrame, right: DataFrame,
           leftKey: String, rightKey: String,
           leftTime: String, rightTime: String,
           rightTieBreak: String,
           outer: Boolean = false): DataFrame = {
    // the declarative path is GraftExtensions (injectPlannerStrategy);
    // for sessions built without it, attach the strategy imperatively —
    // experimental.extraStrategies is the public live-session hook.
    // Synchronized: this mutates session-global state from a query
    // builder, and two threads' read-modify-write could otherwise
    // interleave (a duplicate entry is harmless to planning — the
    // strategy matches the same node — but unbounded growth is not)
    val session = left.sparkSession
    session.experimental.synchronized {
      if (!session.experimental.extraStrategies.contains(AsOfJoinStrategy))
        session.experimental.extraStrategies =
          session.experimental.extraStrategies :+ AsOfJoinStrategy
    }
    val lp = Bridge.analyzedPlan(left)
    val rp = Bridge.analyzedPlan(right)
    val overlap = lp.output.map(_.name).toSet.intersect(rp.output.map(_.name).toSet)
    require(overlap.isEmpty,
      s"asof: column names must be disjoint, both sides have: ${overlap.mkString(", ")}")
    require(lp.output.map(_.exprId).toSet.intersect(rp.output.map(_.exprId).toSet).isEmpty,
      "asof: the two sides share attribute lineage — alias one side's columns first")
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        sys.error(s"asof: no column '$n' in [${p.output.map(_.name).mkString(", ")}]"))
    val (lkA, rkA) = (attr(lp, leftKey), attr(rp, rightKey))
    val (ltA, rtA) = (attr(lp, leftTime), attr(rp, rightTime))
    // a normal join would insert implicit casts at analysis; this node
    // hash-partitions each side by its own key type (Int and Long hash
    // differently — equal values would land in different partitions and
    // silently never match) and the merge compares raw boxed values, so
    // mismatched types must be an analysis-time error, not wrong results
    require(lkA.dataType == rkA.dataType,
      s"asof: key types differ — $leftKey: ${lkA.dataType.sql} vs $rightKey: ${rkA.dataType.sql}; cast one side first")
    require(ltA.dataType == rtA.dataType,
      s"asof: time types differ — $leftTime: ${ltA.dataType.sql} vs $rightTime: ${rtA.dataType.sql}; cast one side first")
    def comparable(dt: org.apache.spark.sql.types.DataType): Boolean = {
      import org.apache.spark.sql.types._
      dt match {
        case LongType | IntegerType | ShortType | ByteType | DoubleType |
             FloatType | StringType | TimestampType | TimestampNTZType |
             DateType | BooleanType => true
        case _: DecimalType => true
        case _ => false
      }
    }
    require(comparable(lkA.dataType),
      s"asof: key type ${lkA.dataType.sql} is not an orderable scalar type")
    require(comparable(ltA.dataType),
      s"asof: time type ${ltA.dataType.sql} is not an orderable scalar type")
    Bridge.ofRows(left.sparkSession,
      AsOfJoin(lp, rp, lkA, rkA, ltA, rtA, attr(rp, rightTieBreak), outer))
  }
}
