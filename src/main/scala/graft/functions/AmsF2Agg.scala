package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** AMS/Tug-of-War F2 sketch (Alon, Matias & Szegedy 1996) as a Catalyst
  * `TypedImperativeAggregate` — the JOIN-SIZE estimator of the sketch
  * ladder: F2 = Σ_k n_k² over a key column is EXACTLY the row count of
  * the table self-joined on that key, the statistic a cost-based
  * planner needs to price a shuffle join (and, by extension with two
  * sketches, an inner-join size via the dot-product of frequency
  * vectors). Computing it exactly costs a vocabulary-sized groupBy;
  * the sketch costs `counters` Longs of state TOTAL.
  *
  * Buffer: `counters` running sums Z_i = Σ_k n_k·s_i(k), where
  * s_i(k) ∈ {−1,+1} is a seeded Murmur sign hash. Each estimate
  * Z_i² has expectation F2; the estimator is the MEDIAN of group MEANS
  * (groups of 8) — the classic median-of-means variance reduction.
  * Merge is element-wise addition of the Z vectors (sign hashes depend
  * only on the key), so the partials carry a constant-size vector
  * through the shuffle regardless of key cardinality, and the
  * serialized sketch is deterministic under any partitioning. */
case class AmsF2Agg(
    child: Expression,
    counters: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with ImplicitCastInputTypes
    with UnaryLike[Expression] {

  require(counters >= 32 && counters % 32 == 0,
    s"ams counters must be a positive multiple of 32: $counters")

  override def inputTypes: Seq[DataType] = Seq(LongType)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](counters)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[Long]
      var i = 0
      while (i < counters) {
        buf(i) += AmsF2Agg.sign(key, i)
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  /** Median of 32-counter group means of Z_i² — one BIGINT estimate. */
  override def eval(buf: Array[Long]): Any = {
    val groups = buf.grouped(32).map { g =>
      g.map(z => BigInt(z) * BigInt(z)).sum / 32
    }.toArray.sorted
    val m = groups.length
    val median =
      if (m % 2 == 1) groups(m / 2)
      else (groups(m / 2 - 1) + groups(m / 2)) / 2
    median.min(BigInt(Long.MaxValue)).toLong
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    var i = 0
    while (i < buf.length) { out.writeLong(buf(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    require(n == counters,
      s"ams geometry mismatch: sketch $n counters, aggregate $counters")
    val buf = new Array[Long](n)
    var i = 0
    while (i < n) { buf(i) = in.readLong(); i += 1 }
    buf
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): AmsF2Agg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): AmsF2Agg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): AmsF2Agg =
    copy(child = newChild)
}

object AmsF2Agg {

  /** ±1 sign hash for counter i — allocation-free splitmix64 finalizer
    * (the update loop runs counters× per row; a tuple-allocating hash
    * here would dominate the aggregate's cost). */
  private[functions] def sign(key: Long, i: Int): Int = {
    var z = key + 0x9E3779B97F4A7C15L * (i + 1)
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^= (z >>> 31)
    if ((z & 1L) == 0L) 1 else -1
  }

  /** `graft_ams_f2(long_col, counters)` as a Column aggregate. */
  def amsF2(c: Column, counters: Int): Column =
    Bridge.column(AmsF2Agg(
      Bridge.expression(c), counters).toAggregateExpression())

  val sqlBuilder: Seq[Expression] => Expression = {
    case Seq(child, kE) if kE.foldable =>
      AmsF2Agg(child, kE.eval().toString.toInt).toAggregateExpression()
    case args =>
      throw new IllegalArgumentException(
        s"graft_ams_f2(long_col, counters literal) expected, got ${args.length} args")
  }
}
