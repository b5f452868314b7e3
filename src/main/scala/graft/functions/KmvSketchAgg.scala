package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** KMV (k-minimum-values) distinct sketch (Bar-Yossef et al. 2002; the
  * Beyer et al. 2007 unbiased estimator) as a Catalyst
  * `TypedImperativeAggregate` — the sketch family's DISTINCT-counting
  * member, alongside the frequency sketch (SpaceSavingAgg). What it adds
  * over Spark's built-in `approx_count_distinct` (HLL++): the sketch
  * VALUE is a reusable, mergeable set signature that supports SET
  * ALGEBRA — union, Jaccard, and intersection estimates between any two
  * sketches ([[KmvPairExpr]]) — which HLL registers cannot give you
  * without an intersection-free inclusion-exclusion detour. That is the
  * 100 TB overlap-matrix primitive: estimate |vocab(A) ∩ vocab(B)| for
  * every group pair from k longs per group, instead of a
  * distinct-pair self-join that shuffles the full vocabulary.
  *
  * Input contract: the child is a 64-bit HASH of the tracked value
  * (compose with the codegen `xxhash64(col)` — hashing stays in
  * whole-stage codegen; the agg just maintains order statistics). The
  * sketch keeps the k smallest distinct hashes masked to 63 bits
  * (uniform on [0, 2^63)); with fewer than k distinct hashes the sketch
  * IS the exact distinct set, and every estimate degrades to exact —
  * the property the small-SF oracle tier leans on deliberately.
  *
  * Merge is trivially exact (k smallest of the union of k-smallest
  * sets), so partial aggregation before the shuffle moves ≤ k longs per
  * map task per group — mergeable-summaries discipline, any merge tree.
  */
case class KmvSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.TreeSet[Long]]
    with ImplicitCastInputTypes
    with UnaryLike[Expression] {

  require(k > 1, "kmv sketch k must be > 1")

  override def inputTypes: Seq[DataType] = Seq(LongType)

  override def createAggregationBuffer(): mutable.TreeSet[Long] = mutable.TreeSet.empty

  override def update(buf: mutable.TreeSet[Long], input: InternalRow): mutable.TreeSet[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long] & Long.MaxValue
      if (buf.size < k) buf.add(h)
      else if (h < buf.last && buf.add(h)) buf.remove(buf.last)
    }
    buf
  }

  override def merge(a: mutable.TreeSet[Long], b: mutable.TreeSet[Long]): mutable.TreeSet[Long] = {
    b.foreach { h =>
      if (a.size < k) a.add(h)
      else if (h < a.last && a.add(h)) a.remove(a.last)
    }
    a
  }

  /** Binary layout: k (int), count (int), then `count` ascending longs. */
  override def eval(buf: mutable.TreeSet[Long]): Any = serialize(buf)

  override def serialize(buf: mutable.TreeSet[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(k)
    out.writeInt(buf.size)
    buf.foreach(out.writeLong)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val kIn = in.readInt()
    require(kIn == k, s"kmv sketch k mismatch: buffer $kIn vs aggregate $k")
    val s = mutable.TreeSet.empty[Long]
    var i = in.readInt()
    while (i > 0) { s.add(in.readLong()); i -= 1 }
    s
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvSketchAgg =
    copy(child = newChild)
}

object KmvSketchAgg {

  /** `kmv_sketch(hash_col, k)` as a Column aggregate; `hash_col` should
    * be `xxhash64(value)` (or any uniform 64-bit hash). */
  def kmvSketch(c: Column, k: Int): Column =
    Bridge.column(KmvSketchAgg(Bridge.expression(c), k).toAggregateExpression())

  /** SQL builder for `graft_kmv(hash_col, k literal)`. */
  val sqlBuilder: Seq[Expression] => Expression = {
    case Seq(child, kE) if kE.foldable =>
      KmvSketchAgg(child, kE.eval().toString.toInt).toAggregateExpression()
    case args =>
      throw new IllegalArgumentException(
        s"graft_kmv(hash_col, k literal) expected, got ${args.length} args")
  }

  /** Decode a sketch blob → (k, ascending hash values). */
  private[functions] def decode(bytes: Array[Byte]): (Int, Array[Long]) = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val k = in.readInt()
    val n = in.readInt()
    val a = new Array[Long](n)
    var i = 0
    while (i < n) { a(i) = in.readLong(); i += 1 }
    (k, a)
  }

  /** Beyer et al. 2007 estimator: exact below k, else (k-1)/m_k. */
  private[functions] def estimate(k: Int, hashes: Array[Long]): Double =
    if (hashes.length < k) hashes.length.toDouble
    else (k - 1).toDouble * Long.MaxValue.toDouble / hashes(k - 1).toDouble
}

/** `kmv_estimate(sketch)` → DOUBLE: the single-sketch cardinality read
  * path. Exact (= the stored distinct count) below k, the Beyer 2007
  * estimator at or past it. Eval-only (CodegenFallback) — one row per
  * GROUP, never per input row. The streaming significance (q108):
  * Structured Streaming rejects `count(DISTINCT)` outright, and holding
  * the exact distinct set as state is unbounded; the sketch is the
  * mergeable bounded state that makes windowed distinct counting
  * streamable at all. */
case class KmvEstimateExpr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression with CodegenFallback {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_kmv_estimate requires a BINARY sketch, got ${t.sql}")
    }

  override def dataType: DataType = DoubleType

  override def nullSafeEval(blob: Any): Any = {
    val (k, hashes) = KmvSketchAgg.decode(blob.asInstanceOf[Array[Byte]])
    KmvSketchAgg.estimate(k, hashes)
  }

  override protected def withNewChildInternal(newChild: Expression): KmvEstimateExpr =
    copy(child = newChild)
}

object KmvEstimateExpr {
  def kmvEstimate(c: Column): Column =
    Bridge.column(KmvEstimateExpr(Bridge.expression(c)))

  val sqlBuilder: Seq[Expression] => Expression = exprs => {
    if (exprs.length != 1)
      throw new IllegalArgumentException(
        s"graft_kmv_estimate takes exactly 1 argument, got ${exprs.length}")
    KmvEstimateExpr(exprs.head)
  }
}

/** `kmv_pair(sketch_a, sketch_b)` → `STRUCT<est_a, est_b, est_union,
  * est_jaccard, est_intersection>` (all DOUBLE): the set-algebra read
  * path over two [[KmvSketchAgg]] blobs built with the SAME k. The
  * combined-sketch rule (Beyer et al. 2007): K = k smallest of
  * A ∪ B; ρ = |K ∩ A ∩ B| / |K| estimates Jaccard;
  * intersection ≈ ρ · est(∪). Eval-only (CodegenFallback) — it runs on
  * one row per GROUP PAIR, never per input row; the per-row hot path
  * is the codegen hash feeding the aggregate. */
case class KmvPairExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_kmv_pair requires (BINARY, BINARY) sketches, got (${l.sql}, ${r.sql})")
    }

  override def dataType: DataType = StructType(Seq(
    StructField("est_a", DoubleType, nullable = false),
    StructField("est_b", DoubleType, nullable = false),
    StructField("est_union", DoubleType, nullable = false),
    StructField("est_jaccard", DoubleType, nullable = false),
    StructField("est_intersection", DoubleType, nullable = false)))

  override def nullSafeEval(ab: Any, bb: Any): Any = {
    val (ka, a) = KmvSketchAgg.decode(ab.asInstanceOf[Array[Byte]])
    val (kb, b) = KmvSketchAgg.decode(bb.asInstanceOf[Array[Byte]])
    require(ka == kb, s"kmv_pair: sketches built with different k ($ka vs $kb)")
    val k = ka
    // k smallest of the union (both inputs ascending)
    val union = new Array[Long](math.min(k, a.length + b.length))
    var i = 0; var j = 0; var n = 0
    while (n < union.length && (i < a.length || j < b.length)) {
      val take =
        if (j >= b.length || (i < a.length && a(i) <= b(j))) { val v = a(i); i += 1; v }
        else { val v = b(j); j += 1; v }
      if (n == 0 || union(n - 1) != take) { union(n) = take; n += 1 }
    }
    val estU = KmvSketchAgg.estimate(k, java.util.Arrays.copyOf(union, n))
    var inBoth = 0
    var m = 0
    while (m < n) {
      val h = union(m)
      if (java.util.Arrays.binarySearch(a, h) >= 0 &&
          java.util.Arrays.binarySearch(b, h) >= 0) inBoth += 1
      m += 1
    }
    val rho = if (n == 0) 0.0 else inBoth.toDouble / n.toDouble
    InternalRow(
      KmvSketchAgg.estimate(k, a), KmvSketchAgg.estimate(k, b),
      estU, rho, rho * estU)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KmvPairExpr =
    copy(left = newLeft, right = newRight)
}

object KmvPairExpr {
  def kmvPair(a: Column, b: Column): Column =
    Bridge.column(KmvPairExpr(Bridge.expression(a), Bridge.expression(b)))

  val sqlBuilder: Seq[Expression] => Expression = exprs => {
    if (exprs.length != 2)
      throw new IllegalArgumentException(
        s"graft_kmv_pair takes exactly 2 arguments, got ${exprs.length}")
    KmvPairExpr(exprs.head, exprs(1))
  }
}
