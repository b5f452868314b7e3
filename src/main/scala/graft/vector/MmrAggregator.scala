package graft.vector

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

import scala.collection.mutable.ArrayBuffer

/** O18 as a typed `Aggregator[IN, BUF, OUT]` (SURVEY §2.8's UDAF form of
  * MMR) — the alternative to the `flatMapGroups` path in [[Mmr]].
  *
  * The buffer keeps only the top-`fetchK` candidates by relevance
  * (ties → lower id), so PARTIAL aggregation is meaningful: each map task
  * reduces its local rows to ≤fetch_k before the shuffle, merge combines
  * two ≤fetch_k buffers, and the greedy MMR selection runs once in
  * `finish` on ≤fetch_k rows. This is the classic partial/final shape the
  * reference's two-phase retrieve implies (app.py:264-266) — at scale the
  * shuffle carries fetch_k rows per query instead of the whole score set.
  *
  * Parity with [[Mmr.mmrRerank]] is asserted in MmrAggregatorSpec.
  */
class MmrAggregator(k: Int = 5, fetchK: Int = 20, lambda: Double = 0.5)
    extends Aggregator[MmrAggregator.Cand, ArrayBuffer[MmrAggregator.Cand], Seq[MmrAggregator.Pick]] {
  import MmrAggregator._

  override def zero: ArrayBuffer[Cand] = ArrayBuffer.empty

  private def trim(buf: ArrayBuffer[Cand]): ArrayBuffer[Cand] = {
    if (buf.length > fetchK) {
      val sorted = buf.sortBy(c => (-c.rel, c.id))
      buf.clear()
      buf ++= sorted.take(fetchK)
    }
    buf
  }

  override def reduce(buf: ArrayBuffer[Cand], c: Cand): ArrayBuffer[Cand] = {
    buf += c
    if (buf.length >= fetchK * 2) trim(buf) else buf
  }

  override def merge(a: ArrayBuffer[Cand], b: ArrayBuffer[Cand]): ArrayBuffer[Cand] =
    trim(a ++= b)

  override def finish(buf: ArrayBuffer[Cand]): Seq[Pick] = {
    val cands = trim(buf).map(c => (c.id, c.rel, c.vec)).toSeq
    Mmr.select(cands, k, lambda).map { case (id, score, rank) => Pick(id, score, rank) }
  }

  override def bufferEncoder: Encoder[ArrayBuffer[Cand]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[ArrayBuffer[Cand]]()
  override def outputEncoder: Encoder[Seq[Pick]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Pick]]()
}

object MmrAggregator {
  case class Cand(id: Long, rel: Double, vec: Array[Double])
  case class Pick(id: Long, score: Double, rank: Int)
}
