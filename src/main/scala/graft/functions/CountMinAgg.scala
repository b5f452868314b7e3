package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count-Min sketch (Cormode & Muthukrishnan 2005) as a Catalyst
  * `TypedImperativeAggregate` — the POINT-FREQUENCY member of the §2.8
  * sketch ladder: Space-Saving ranks the heavy keys (q88), KMV counts
  * distincts (q106/q108), bottom-k samples quantiles (q165), bloom
  * answers membership (q166); Count-Min answers "how often does THIS
  * key occur" in O(depth) words per query with a one-sided guarantee:
  * NEVER an underestimate, overestimate ≤ ε·N with high probability
  * (ε = e/width — here deterministic per fixed corpus+geometry, which
  * is what lets CM-driven plans sit under the bit-exact gate the same
  * way q166's fp-bound does).
  *
  * Buffer: a depth×width Long grid. Row r hashes the key with seed r
  * (MurmurHash3 over the UTF-8 bytes — Scala's library implementation,
  * stable across JVMs); update increments one cell per row; ESTIMATE =
  * min over rows. Geometry is a pure function of (depth, width), so
  * MERGE is element-wise addition — associative, commutative,
  * insertion-order independent: the map-side partials each carry a
  * fixed depth×width grid through the shuffle regardless of vocabulary
  * size (the same exchange economics as the other mergeable sketches).
  *
  * The estimate side lives in [[CountMinEstimateExpr]] so a persisted
  * sketch (sidecar metadata, q166's pattern) can be probed at planning
  * time without re-aggregation. */
case class CountMinAgg(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with ImplicitCastInputTypes
    with UnaryLike[Expression] {

  require(depth > 0 && depth <= 16, s"count-min depth out of (0,16]: $depth")
  require(width > 1, s"count-min width must exceed 1: $width")

  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val bytes = v.asInstanceOf[UTF8String].getBytes
      var r = 0
      while (r < depth) {
        buf(r * width + CountMinAgg.cell(bytes, r, width)) += 1L
        r += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  /** Binary layout: depth, width (ints), then the row-major cells. */
  override def eval(buf: Array[Long]): Any = serialize(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(depth)
    out.writeInt(width)
    var i = 0
    while (i < buf.length) { out.writeLong(buf(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val d = in.readInt(); val w = in.readInt()
    require(d == depth && w == width,
      s"count-min geometry mismatch: sketch ${d}x$w, aggregate ${depth}x$width")
    val buf = new Array[Long](d * w)
    var i = 0
    while (i < buf.length) { buf(i) = in.readLong(); i += 1 }
    buf
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CountMinAgg =
    copy(child = newChild)
}

object CountMinAgg {

  /** Row r's cell for a key: seeded MurmurHash3 over the UTF-8 bytes,
    * floor-mod width. Shared by update and estimate so the two sides
    * can never drift. */
  private[functions] def cell(keyUtf8: Array[Byte], row: Int, width: Int): Int = {
    val h = scala.util.hashing.MurmurHash3.bytesHash(keyUtf8, 0x9E3779B9 * (row + 1))
    java.lang.Math.floorMod(h, width)
  }

  /** `graft_count_min(str_col, depth, width)` as a Column aggregate. */
  def countMin(c: Column, depth: Int, width: Int): Column =
    Bridge.column(CountMinAgg(
      Bridge.expression(c), depth, width).toAggregateExpression())

  val sqlBuilder: Seq[Expression] => Expression = {
    case Seq(child, dE, wE) if dE.foldable && wE.foldable =>
      CountMinAgg(child, dE.eval().toString.toInt,
        wE.eval().toString.toInt).toAggregateExpression()
    case args =>
      throw new IllegalArgumentException(
        s"graft_count_min(col, depth literal, width literal) expected, got ${args.length} args")
  }
}

/** `graft_cm_estimate(sketch, token)` → BIGINT: the point-frequency
  * probe, min over the sketch's rows. Eval-only (CodegenFallback) — it
  * runs per (sketch × candidate) pair, metadata-scale, never per data
  * row. */
case class CountMinEstimateExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, StringType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_cm_estimate requires (BINARY, STRING), got (${l.sql}, ${r.sql})")
    }

  override def dataType: DataType = LongType

  override def nullSafeEval(blob: Any, key: Any): Any = {
    val in = new DataInputStream(new ByteArrayInputStream(
      blob.asInstanceOf[Array[Byte]]))
    val depth = in.readInt(); val width = in.readInt()
    val cells = new Array[Long](depth.toLong.toInt * width)
    var i = 0
    while (i < cells.length) { cells(i) = in.readLong(); i += 1 }
    val bytes = key.asInstanceOf[UTF8String].getBytes
    var est = Long.MaxValue
    var r = 0
    while (r < depth) {
      val c = cells(r * width + CountMinAgg.cell(bytes, r, width))
      if (c < est) est = c
      r += 1
    }
    est
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CountMinEstimateExpr =
    copy(left = newLeft, right = newRight)
}

object CountMinEstimateExpr {
  def cmEstimate(sketch: Column, key: Column): Column =
    Bridge.column(CountMinEstimateExpr(
      Bridge.expression(sketch), Bridge.expression(key)))

  val sqlBuilder: Seq[Expression] => Expression = {
    case Seq(l, r) => CountMinEstimateExpr(l, r)
    case args => throw new IllegalArgumentException(
      s"graft_cm_estimate(sketch, key) expected, got ${args.length} args")
  }
}
