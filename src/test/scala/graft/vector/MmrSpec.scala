package graft.vector

import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §5.2 MMR properties + FIXTURES.md §B golden case. */
class MmrSpec extends AnyFunSuite {

  private val q = Array(1.0, 0.0, 0.0, 0.0)
  private def cos(a: Array[Double], b: Array[Double]): Double = {
    val dot = a.zip(b).map { case (x, y) => x * y }.sum
    val na = math.sqrt(a.map(x => x * x).sum)
    val nb = math.sqrt(b.map(x => x * x).sum)
    if (na == 0 || nb == 0) 0.0 else dot / (na * nb)
  }
  // candidates with relevance = cosine to q
  private def mk(vs: (Long, Array[Double])*): Seq[(Long, Double, Array[Double])] =
    vs.map { case (id, v) => (id, cos(q, v), v) }

  test("golden: diversification beats redundancy at lambda=0.5") {
    // 10 and 11 are near-duplicates both close to q; 12 is orthogonal to
    // both. (10 is deliberately NOT colinear with q: for a candidate set
    // where pick1 ∥ q, relevance equals redundancy and MMR ties at 0.)
    val cands = mk(
      10L -> Array(0.95, 0.312, 0.0, 0.0),
      11L -> Array(0.90, 0.436, 0.0, 0.0),
      12L -> Array(0.0, 0.0, 1.0, 0.0))
    val picked = Mmr.select(cands, k = 2, lambda = 0.5).map(_._1)
    // pick1 = 10 (rel .95). pick2: 11 → .5*.90 − .5*cos(11,10)≈.45−.496<0;
    //                              12 → .5*0  − .5*0 = 0 ⇒ 12 wins.
    assert(picked === Seq(10L, 12L))
  }

  test("first pick is always the argmax of relevance") {
    val cands = mk(
      1L -> Array(0.2, 0.8, 0.0, 0.0),
      2L -> Array(0.9, 0.1, 0.0, 0.0),
      3L -> Array(0.5, 0.5, 0.0, 0.0))
    assert(Mmr.select(cands, k = 1, lambda = 0.5).head._1 === 2L)
  }

  test("lambda=1 reduces to plain top-k by relevance") {
    val cands = mk(
      1L -> Array(0.2, 0.8, 0.0, 0.0),
      2L -> Array(0.9, 0.1, 0.0, 0.0),
      3L -> Array(0.5, 0.5, 0.0, 0.0),
      4L -> Array(0.7, 0.3, 0.0, 0.0))
    val picked = Mmr.select(cands, k = 3, lambda = 1.0).map(_._1)
    val topk = cands.sortBy(c => (-c._2, c._1)).take(3).map(_._1)
    assert(picked === topk)
  }

  test("output is a subset of candidates, size min(k, n), ranks 1..n") {
    val cands = mk(
      1L -> Array(0.1, 0.2, 0.3, 0.4),
      2L -> Array(0.4, 0.3, 0.2, 0.1),
      3L -> Array(0.0, 0.0, 1.0, 0.0))
    val out = Mmr.select(cands, k = 5, lambda = 0.5)
    assert(out.size === 3)
    assert(out.map(_._1).toSet.subsetOf(cands.map(_._1).toSet))
    assert(out.map(_._3) === Seq(1, 2, 3))
    assert(out.map(_._1).distinct.size === out.size)
  }

  test("deterministic on exact ties: lower id wins") {
    val cands = mk(
      7L -> Array(1.0, 0.0, 0.0, 0.0),
      3L -> Array(1.0, 0.0, 0.0, 0.0))
    assert(Mmr.select(cands, k = 1, lambda = 1.0).head._1 === 3L)
  }
}
