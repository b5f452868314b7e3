package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Bottom-k uniform sample sketch: the QUANTILE/ORDER-STATISTICS member
  * of the mergeable-summaries family, next to KMV (distinct,
  * [[KmvSketchAgg]]) and SpaceSaving (frequency, [[SpaceSavingAgg]]).
  * The buffer keeps the (hash, value) pairs with the k SMALLEST hashes —
  * hash-membership makes the sample a deterministic uniform draw
  * (bottom-k / coordinated sampling, Cohen & Kaplan 2007), and merge —
  * k smallest of the union — is exact, associative and order-independent,
  * so partial aggregation shuffles ≤ k pairs per map task per group and
  * any merge tree over 1000 executors yields the SAME sketch. That
  * determinism is what Spark's own `approx_percentile` cannot promise
  * across engines and what a t-digest cannot promise across merge
  * orders; here the sketch value is reproducible bit-for-bit, so error
  * bounds can sit under a driver-gate boolean.
  *
  * Input contract: `hash` is a 64-bit uniform hash of the row IDENTITY
  * (compose with codegen `xxhash64(id)` — selection stays in whole-stage
  * codegen), `value` the measured DOUBLE. With fewer than k rows the
  * sample IS the group and every quantile read is exact. At or past k,
  * the sample is uniform-without-replacement, so the sample CDF obeys
  * the DKW inequality: sup_x |F_sample(x) − F(x)| ≤ ε with probability
  * ≥ 1 − 2e^(−2kε²) — ε = 2.5/√k fails with ~4·10⁻⁶.
  *
  * 100 TB read path: quantiles come from k values per group — no sort,
  * no second pass; the same blob answers any probability after the fact
  * (a reusable artifact, unlike a one-shot percentile). */
case class BottomKSampleAgg(
    left: Expression,
    right: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.TreeMap[Long, Double]]
    with ImplicitCastInputTypes
    with BinaryLike[Expression] {

  require(k > 1, "bottom-k sample k must be > 1")

  override def inputTypes: Seq[DataType] = Seq(LongType, DoubleType)

  override def createAggregationBuffer(): mutable.TreeMap[Long, Double] =
    mutable.TreeMap.empty

  private def offer(buf: mutable.TreeMap[Long, Double], h: Long, v: Double): Unit =
    buf.get(h) match {
      // 64-bit collisions are ~never; keep the smaller value so the
      // result stays deterministic if one fires
      case Some(old) => if (v < old) buf.put(h, v)
      case None =>
        if (buf.size < k) buf.put(h, v)
        else if (h < buf.lastKey) { buf.put(h, v); buf.remove(buf.lastKey) }
    }

  override def update(buf: mutable.TreeMap[Long, Double],
      input: InternalRow): mutable.TreeMap[Long, Double] = {
    val h = left.eval(input)
    val v = right.eval(input)
    if (h != null && v != null)
      offer(buf, h.asInstanceOf[Long] & Long.MaxValue, v.asInstanceOf[Double])
    buf
  }

  override def merge(a: mutable.TreeMap[Long, Double],
      b: mutable.TreeMap[Long, Double]): mutable.TreeMap[Long, Double] = {
    b.foreach { case (h, v) => offer(a, h, v) }
    a
  }

  /** Binary layout: k (int), count (int), then `count` (hash, value)
    * pairs in ascending hash order. */
  override def eval(buf: mutable.TreeMap[Long, Double]): Any = serialize(buf)

  override def serialize(buf: mutable.TreeMap[Long, Double]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(k)
    out.writeInt(buf.size)
    buf.foreach { case (h, v) => out.writeLong(h); out.writeDouble(v) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeMap[Long, Double] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val kIn = in.readInt()
    require(kIn == k, s"bottom-k sample k mismatch: buffer $kIn vs aggregate $k")
    val m = mutable.TreeMap.empty[Long, Double]
    var i = in.readInt()
    while (i > 0) { m.put(in.readLong(), in.readDouble()); i -= 1 }
    m
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKSampleAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKSampleAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BottomKSampleAgg =
    copy(left = newLeft, right = newRight)
}

object BottomKSampleAgg {

  /** `graft_bksample(hash_col, value_col, k)` as a Column aggregate;
    * `hash_col` should be `xxhash64(row_id)`. */
  def bkSample(hash: Column, value: Column, k: Int): Column =
    Bridge.column(BottomKSampleAgg(
      Bridge.expression(hash), Bridge.expression(value), k).toAggregateExpression())

  val sqlBuilder: Seq[Expression] => Expression = {
    case Seq(hash, value, kE) if kE.foldable =>
      BottomKSampleAgg(hash, value, kE.eval().toString.toInt).toAggregateExpression()
    case args =>
      throw new IllegalArgumentException(
        s"graft_bksample(hash_col, value_col, k literal) expected, got ${args.length} args")
  }

  /** Decode a sketch blob → (k, values sorted ascending). */
  private[functions] def decodeValues(bytes: Array[Byte]): (Int, Array[Double]) = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val k = in.readInt()
    val n = in.readInt()
    val vs = new Array[Double](n)
    var i = 0
    while (i < n) { in.readLong(); vs(i) = in.readDouble(); i += 1 }
    java.util.Arrays.sort(vs)
    (k, vs)
  }
}

/** `graft_bksample_quantile(sketch, p)` → DOUBLE: the lower
  * (inverse-CDF) sample quantile — smallest sampled value v with
  * F_sample(v) ≥ p. Eval-only (CodegenFallback): one call per GROUP,
  * never per input row. Null on an empty sketch. */
case class BkSampleQuantileExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, DoubleType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_bksample_quantile requires (BINARY, DOUBLE), got (${l.sql}, ${r.sql})")
    }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(blob: Any, prob: Any): Any = {
    val p = prob.asInstanceOf[Double]
    require(p > 0.0 && p <= 1.0, s"quantile probability out of (0,1]: $p")
    val (_, vs) = BottomKSampleAgg.decodeValues(blob.asInstanceOf[Array[Byte]])
    if (vs.isEmpty) null
    else vs(math.min(vs.length - 1, math.max(0, math.ceil(p * vs.length).toInt - 1)))
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BkSampleQuantileExpr =
    copy(left = newLeft, right = newRight)
}

object BkSampleQuantileExpr {
  def bkQuantile(sketch: Column, p: Double): Column =
    Bridge.column(BkSampleQuantileExpr(Bridge.expression(sketch),
      Bridge.expression(org.apache.spark.sql.functions.lit(p))))

  val sqlBuilder: Seq[Expression] => Expression = exprs => {
    if (exprs.length != 2)
      throw new IllegalArgumentException(
        s"graft_bksample_quantile takes exactly 2 arguments, got ${exprs.length}")
    BkSampleQuantileExpr(exprs.head, exprs(1))
  }
}
