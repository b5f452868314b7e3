package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Nearest-PQ-code assignment against a DRIVER-RESIDENT codebook — the
  * per-row argmin of the Lloyd/encode hot loop, as one native expression
  * (r20, guide §1.2 "the distributed algorithm" + the DotProductExpr
  * precedent).
  *
  * Before, assignment was a broadcast JOIN against the M×K codebook
  * rows (a K-way row blowup) followed by a `min_by` hash aggregate to
  * collapse the blowup back — one broadcast build + one exchange per
  * Lloyd round / encode pass. But the codebook is a bounded dictionary
  * (M×K = 128 rows) that train() already holds on the driver, so the
  * argmin is a pure per-row computation: this expression embeds the
  * codebook (codes sorted ascending per subspace) and scans it in a
  * tight primitive loop. No join, no exchange, no row blowup — and the
  * 100 TB encode pass becomes embarrassingly parallel map work.
  *
  * Bit-identity with the join+min_by form (pinned by PqSpec and the
  * q38/q39 oracle hash gate): the ranking key is the same
  * `cn2 − 2·dot(sv, cv)` with cn2 pre-folded left-to-right like the SQL
  * `aggregate(cv, 0D, (acc, x) -> acc + x*x)` and dot accumulated
  * left-to-right exactly like [[DotProductExpr]]; ties keep the LOWER
  * code — the scan visits codes in ascending order and replaces only on
  * strictly-smaller d2, which equals `min_by(code, struct(d2, code))`.
  */
case class PqNearestExpr(m: Expression, sv: Expression,
                         codes: Array[Array[Int]],
                         cvs: Array[Array[Array[Double]]],
                         cn2: Array[Array[Double]])
    extends BinaryExpression {

  override def left: Expression = m
  override def right: Expression = sv
  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    (m.dataType, sv.dataType) match {
      case (IntegerType, ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"pq_nearest requires (INT, ARRAY<DOUBLE>), got ${l.sql} and ${r.sql}")
    }

  /** The shared interpreted/codegen kernel. */
  def compute(mi: Int, x: ArrayData): Int = {
    require(mi >= 0 && mi < codes.length && codes(mi).nonEmpty,
      s"pq_nearest: subspace $mi has no codebook entries (M=${codes.length})")
    val ks = codes(mi); val cbm = cvs(mi); val cnm = cn2(mi)
    var best = ks(0)
    var bestD = Double.PositiveInfinity
    var k = 0
    while (k < cbm.length) {
      val cv = cbm(k)
      val n = math.min(x.numElements(), cv.length)
      var dot = 0.0
      var i = 0
      while (i < n) { dot += x.getDouble(i) * cv(i); i += 1 }
      val d2 = cnm(k) - 2.0 * dot
      // Double.compare, not <, so NaN/-0.0 order EXACTLY like min_by's
      // struct ordering (Spark double ordering = java.lang.Double.compare:
      // NaN largest, -0.0 < 0.0); the scan replaces only on strictly
      // smaller, so ties keep the first-visited = lower code
      if (java.lang.Double.compare(d2, bestD) < 0) { bestD = d2; best = ks(k) }
      k += 1
    }
    best
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[Int], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqNearest", this, classOf[PqNearestExpr].getName)
    nullSafeCodeGen(ctx, ev, (mv, xv) => s"${ev.value} = $ref.compute($mv, $xv);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqNearestExpr =
    copy(m = newLeft, sv = newRight)
}

/** Nearest coarse-cell assignment against a driver-resident centroid
  * table — the IVF companion of [[PqNearestExpr]] (r20): argmax of
  * ⟨v, cv⟩ over ≤256 bounded-stride seed centroids, ties toward the
  * LOWER cent_id. Replaces the crossJoin(broadcast(centroids)) row
  * blowup + `max_by` hash-aggregate exchange with a per-row primitive
  * loop; comparison via Double.compare so NaN/-0.0 order exactly like
  * max_by's struct ordering (centroids scanned in ascending cent_id,
  * replace only on strictly greater — equals
  * `max_by(cent_id, struct(cdot, -cent_id))`). */
case class PqNearestCellExpr(v: Expression,
                             centIds: Array[Long],
                             cvs: Array[Array[Double]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def child: Expression = v
  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def checkInputDataTypes(): TypeCheckResult =
    v.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"pq_nearest_cell requires ARRAY<DOUBLE>, got ${t.sql}")
    }

  def compute(x: ArrayData): Long = {
    var best = centIds(0)
    var bestDot = Double.NegativeInfinity
    var first = true
    var k = 0
    while (k < cvs.length) {
      val cv = cvs(k)
      val n = math.min(x.numElements(), cv.length)
      var dot = 0.0
      var i = 0
      while (i < n) { dot += x.getDouble(i) * cv(i); i += 1 }
      if (first || java.lang.Double.compare(dot, bestDot) > 0) {
        bestDot = dot; best = centIds(k); first = false
      }
      k += 1
    }
    best
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqNearestCell", this, classOf[PqNearestCellExpr].getName)
    nullSafeCodeGen(ctx, ev, xv => s"${ev.value} = $ref.compute($xv);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqNearestCellExpr =
    copy(v = newChild)
}

object PqNearestCellExpr {
  /** Column form over driver-resident centroids (cent_id, cv), sorted
    * ascending by cent_id for the lower-id tie-break. */
  def nearestCell(v: Column, cents: Seq[(Long, Seq[Double])]): Column = {
    require(cents.nonEmpty, "pq_nearest_cell: empty centroid table")
    val sorted = cents.sortBy(_._1)
    Bridge.column(PqNearestCellExpr(Bridge.expression(v),
      sorted.map(_._1).toArray, sorted.map(_._2.toArray).toArray))
  }
}

/** Cosine variant of [[PqNearestCellExpr]] for UN-normalized vectors:
  * argmax of safeCosine(⟨v,cv⟩, n, cn) = dot/(n·cn) with the 0-denominator
  * guard, over a driver-resident (cent_id, cv, cn) table — replaces the
  * crossJoin(broadcast(centroids)) + max_by(cent_id, struct(ccos,
  * -cent_id)) exchange in the q35-family assignment (r20). Same
  * arithmetic bit-for-bit: dot left-to-right like DotProductExpr, denom
  * = n·cn, ccos = if (denom == 0) 0 else dot/denom, ties toward the
  * lower cent_id via Double.compare (Spark's max_by struct ordering). */
case class CosineNearestCellExpr(v: Expression, n: Expression,
                                 centIds: Array[Long],
                                 cvs: Array[Array[Double]],
                                 cns: Array[Double])
    extends BinaryExpression {

  override def left: Expression = v
  override def right: Expression = n
  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (v.dataType, n.dataType) match {
      case (ArrayType(DoubleType, _), DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"cosine_nearest_cell requires (ARRAY<DOUBLE>, DOUBLE), got ${l.sql} and ${r.sql}")
    }

  def compute(x: ArrayData, xn: Double): Long = {
    var best = centIds(0)
    var bestCos = 0.0
    var first = true
    var k = 0
    while (k < cvs.length) {
      val cv = cvs(k)
      val len = math.min(x.numElements(), cv.length)
      var dot = 0.0
      var i = 0
      while (i < len) { dot += x.getDouble(i) * cv(i); i += 1 }
      val denom = xn * cns(k)
      val ccos = if (denom == 0.0d) 0.0d else dot / denom
      if (first || java.lang.Double.compare(ccos, bestCos) > 0) {
        bestCos = ccos; best = centIds(k); first = false
      }
      k += 1
    }
    best
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cosNearestCell", this, classOf[CosineNearestCellExpr].getName)
    nullSafeCodeGen(ctx, ev, (xv, nv) => s"${ev.value} = $ref.compute($xv, $nv);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineNearestCellExpr =
    copy(v = newLeft, n = newRight)
}

object CosineNearestCellExpr {
  /** Column form over driver-resident centroids (cent_id, cv, cn),
    * sorted ascending by cent_id for the lower-id tie-break. */
  def nearestCellCosine(v: Column, n: Column,
                        cents: Seq[(Long, Seq[Double], Double)]): Column = {
    require(cents.nonEmpty, "cosine_nearest_cell: empty centroid table")
    val sorted = cents.sortBy(_._1)
    Bridge.column(CosineNearestCellExpr(Bridge.expression(v), Bridge.expression(n),
      sorted.map(_._1).toArray, sorted.map(_._2.toArray).toArray,
      sorted.map(_._3).toArray))
  }
}

object PqNearestExpr {
  /** Column form over a driver-resident codebook (m, code, cv). Codes are
    * sorted ascending per subspace so the strict-< scan reproduces
    * min_by's lower-code tie-break. */
  def nearest(m: Column, sv: Column, cb: Seq[(Int, Int, Seq[Double])]): Column = {
    require(cb.nonEmpty, "pq_nearest: empty codebook")
    val byM = cb.groupBy(_._1)
    val mMax = byM.keys.max
    require(byM.keys.min >= 0, "pq_nearest: negative subspace index")
    val sorted = Array.tabulate(mMax + 1)(mi =>
      byM.getOrElse(mi, Seq.empty).sortBy(_._2))
    val codes = sorted.map(_.map(_._2).toArray)
    val cvs = sorted.map(_.map(_._3.toArray).toArray)
    // same fold order as SQL aggregate(cv, 0D, (acc, x) -> acc + x*x)
    val cn2 = cvs.map(_.map(cv => cv.foldLeft(0.0)((acc, x) => acc + x * x)))
    Bridge.column(PqNearestExpr(Bridge.expression(m), Bridge.expression(sv),
      codes, cvs, cn2))
  }
}
