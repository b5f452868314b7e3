package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Bloom membership sketch as a Catalyst `TypedImperativeAggregate` over
  * Spark's public `org.apache.spark.util.sketch.BloomFilter` — the
  * buildable, SERVABLE form of the bloom machinery Spark 4 keeps
  * internal-only (`bloom_filter_agg` / `might_contain`, see q70b's
  * adjudication): here the sketch is a first-class column value that can
  * be persisted as SIDECAR METADATA next to a lake unit and consulted at
  * planning time (q166's skipping index).
  *
  * Mergeability: the buffer is a fixed-geometry bit array (geometry is a
  * pure function of (expectedItems, fpp), identical across partials), so
  * merge is bitwise OR — associative, commutative, insertion-order
  * independent. The serialized sketch is therefore DETERMINISTIC for a
  * given input set under any partitioning, which lets bloom-driven plans
  * sit under the driver's bit-exact gate.
  *
  * Contract: no false negatives ever (an inserted value always reports
  * present); false positives at ≈ fpp when filled to expectedItems. */
case class BloomSketchAgg(
    child: Expression,
    expectedItems: Long,
    fpp: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[BloomFilter]
    with ImplicitCastInputTypes
    with UnaryLike[Expression] {

  require(expectedItems > 0, "bloom expectedItems must be > 0")
  require(fpp > 0.0 && fpp < 1.0, s"bloom fpp out of (0,1): $fpp")

  override def inputTypes: Seq[DataType] = Seq(LongType)

  override def createAggregationBuffer(): BloomFilter =
    BloomFilter.create(expectedItems, fpp)

  override def update(buf: BloomFilter, input: InternalRow): BloomFilter = {
    val v = child.eval(input)
    if (v != null) buf.putLong(v.asInstanceOf[Long])
    buf
  }

  override def merge(a: BloomFilter, b: BloomFilter): BloomFilter = {
    a.mergeInPlace(b)
    a
  }

  override def eval(buf: BloomFilter): Any = serialize(buf)

  override def serialize(buf: BloomFilter): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    buf.writeTo(bos)
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomSketchAgg =
    copy(child = newChild)
}

object BloomSketchAgg {

  /** `graft_bloom(long_col, expectedItems, fpp)` as a Column aggregate. */
  def bloomSketch(c: Column, expectedItems: Long, fpp: Double): Column =
    Bridge.column(BloomSketchAgg(
      Bridge.expression(c), expectedItems, fpp).toAggregateExpression())

  val sqlBuilder: Seq[Expression] => Expression = {
    case Seq(child, nE, pE) if nE.foldable && pE.foldable =>
      BloomSketchAgg(child, nE.eval().toString.toLong,
        pE.eval().toString.toDouble).toAggregateExpression()
    case args =>
      throw new IllegalArgumentException(
        s"graft_bloom(long_col, expectedItems literal, fpp literal) expected, got ${args.length} args")
  }
}

/** `graft_bloom_contains(sketch, long_value)` → BOOLEAN: the planning-time
  * membership probe. Eval-only (CodegenFallback) — it runs per (unit ×
  * probe) METADATA pair, never per data row. */
case class BloomContainsExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_contains requires (BINARY, BIGINT), got (${l.sql}, ${r.sql})")
    }

  override def dataType: DataType = BooleanType

  override def nullSafeEval(blob: Any, value: Any): Any =
    BloomFilter.readFrom(
      new ByteArrayInputStream(blob.asInstanceOf[Array[Byte]]))
      .mightContainLong(value.asInstanceOf[Long])

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomContainsExpr =
    copy(left = newLeft, right = newRight)
}

object BloomContainsExpr {
  def bloomContains(sketch: Column, value: Column): Column =
    Bridge.column(BloomContainsExpr(
      Bridge.expression(sketch), Bridge.expression(value)))

  val sqlBuilder: Seq[Expression] => Expression = exprs => {
    if (exprs.length != 2)
      throw new IllegalArgumentException(
        s"graft_bloom_contains takes exactly 2 arguments, got ${exprs.length}")
    BloomContainsExpr(exprs.head, exprs(1))
  }
}
