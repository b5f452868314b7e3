package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding tokenizer TRAINING (Sennrich, Haddow &
  * Birch 2016, "Neural Machine Translation of Rare Words with Subword
  * Units") — the vocabulary-building stage of every modern LLM data
  * pipeline, next to the BPE-ish token *counter* the engine already has
  * (q41).
  *
  * The 100 TB shape — and why this scales when a naive port would not:
  *
  *   - '''Train on the word-frequency table, never the corpus.''' The
  *     corpus is scanned exactly ONCE (whitespace split → word counts,
  *     one map-side-combined shuffle). Every merge iteration after that
  *     touches only DISTINCT words weighted by frequency — Heaps'-law
  *     bounded (≈ millions at 100 TB), 5-6 orders below token count.
  *   - '''Pair counting is one vocab-sized scan + a tiny shuffle''' of
  *     (left, right, weight) triples per iteration; the argmax pair comes
  *     back via TakeOrdered (one row to the driver per iteration — the
  *     same single-row convergence-witness discipline as the CC rounds
  *     in Clusters.scala, not a driver-side data loop).
  *   - '''Merges-so-far stay on the driver''' (≤ numMerges pairs, KBs)
  *     and ship to executors in the encode closure — re-symbolizing from
  *     the CACHED base vocabulary each round keeps the plan depth
  *     constant (no 50-deep lineage of transforms to blow up Catalyst).
  *   - Ties break lexicographically, so the merge list is a pure
  *     function of the word-frequency table: deterministic at any
  *     partitioning, any cluster size.
  *
  * The per-word merge application is a Scala function (not a SQL HOF):
  * greedy left-to-right pair rewriting over all learned merges is
  * genuinely imperative per-row logic — the documented UDF exception —
  * and it runs over the vocab table only, never the corpus.
  */
object Bpe {

  /** Greedy BPE encode: apply `merges` in learned order to the word's
    * character symbolization (no end-of-word marker; merges never cross
    * word boundaries by construction). */
  def applyMerges(word: String, merges: Seq[(String, String)]): Vector[String] = {
    var syms: Vector[String] = word.map(_.toString).toVector
    merges.foreach { case (l, r) =>
      if (syms.length > 1) {
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
            out += (l + r); i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.result()
      }
    }
    syms
  }

  /** Reference single-node trainer (spec cross-check): same semantics as
    * [[train]] on an in-memory (word, freq) list. */
  def trainLocal(words: Seq[(String, Long)], numMerges: Int): Seq[(String, String, Long)] = {
    val out = Vector.newBuilder[(String, String, Long)]
    var merges = Vector.empty[(String, String)]
    var done = false
    while (!done && merges.length < numMerges) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (w, n) =>
        val syms = applyMerges(w, merges)
        syms.indices.dropRight(1).foreach { i =>
          counts((syms(i), syms(i + 1))) = counts.getOrElse((syms(i), syms(i + 1)), 0L) + n
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((l, r), n) = counts.minBy { case ((l, r), n) => (-n, l, r) }
        merges :+= ((l, r)); out += ((l, r, n))
      }
    }
    out.result()
  }

  /** Below this vocab size the whole (word, freq) table is smaller than
    * one shuffle block — iterate on the driver instead of paying 40
    * job-scheduling round trips (the same adaptive small-side reasoning
    * as a broadcast join; BpeSpec pins local ≡ distributed, so the
    * switch can never change the answer). */
  val LocalVocabThreshold = 65536L

  /** How many merges one distributed scan may accept. 16 cuts job count
    * ~16× at a real vocab (50k merges → ~3k scans instead of 50k) while
    * the exactness filter below keeps the result identical to the
    * one-merge-per-scan sequence. */
  val MergeBatchSize = 16

  /** The largest rank-prefix of one scan's top pairs that SEQUENTIAL
    * training would provably pick in the same order — the driver-side
    * "non-interacting batch" check. Candidates arrive as (l, r, count)
    * sorted by (-count, l, r); always at least 1 is accepted (the plain
    * argmax is exact by definition). Acceptance stops at the first pair
    * that is not provably safe:
    *
    *   1. '''Prefix only''': a skipped pair may be the true next argmax
    *      (its count can survive earlier merges), so nothing after the
    *      first rejection is taken this scan.
    *   2. '''Mutual disjointness''': pair i's symbols {l, r} must avoid
    *      every earlier accepted {l, r, l+r} — then earlier merges can
    *      neither create nor destroy an occurrence of pair i, so its
    *      count (and rank among accepted) is invariant while the batch
    *      is applied.
    *   3. '''Strictly above the boundary''' (count of the first
    *      non-accepted candidate): any pair a batch merge CREATES
    *      (x, l+r) comes from an original occurrence of (x, l), which
    *      shares a symbol with an accepted pair, so it was not accepted
    *      and its count is ≤ the boundary. Accepted counts strictly
    *      above the boundary therefore still dominate every new pair —
    *      without this, a created pair could out-rank (or out-tie-break)
    *      a later batch member and sequential training would diverge.
    *   4. '''A self-pair (l == r) closes the batch''' after itself: the
    *      bound in (3) rests on every created pair having a witness pair
    *      that shares a symbol with an accepted pair and was therefore
    *      NOT accepted (≤ boundary). For "a"+"a" the witness of a
    *      created ("aa","a") is ("a","a") — the accepted pair ITSELF,
    *      whose support is not below the boundary, so created pairs may
    *      out-rank later members ("aaaa…" corpora do exactly this). The
    *      next scan re-counts them correctly.
    */
  private[text] def acceptBatch(
      cand: Seq[(String, String, Long)], batch: Int): Seq[(String, String, Long)] = {
    val limit = math.min(batch, cand.length)
    val used = scala.collection.mutable.Set.empty[String]
    var k = 0
    var open = true
    while (open && k < limit) {
      val (l, r, _) = cand(k)
      if (k > 0 && (used(l) || used(r))) open = false
      else {
        used += l; used += r; used += (l + r)
        k += 1
        if (l == r) open = false
      }
    }
    val boundary = if (k < cand.length) cand(k)._3 else 0L
    while (k > 1 && cand(k - 1)._3 <= boundary) k -= 1
    cand.take(k)
  }

  /** Learn `numMerges` merges from a (word, freq) DataFrame. Returns the
    * ordered merge table: (rank, left, right, merged, support). Each
    * distributed scan accepts up to `batchSize` merges via [[acceptBatch]]
    * — bit-identical to one-merge-per-scan (BpeSpec pins both against
    * [[trainLocal]]) at ~batchSize× fewer Spark jobs. */
  def train(spark: SparkSession, wordFreq: DataFrame, numMerges: Int,
            localThreshold: Long = LocalVocabThreshold,
            batchSize: Int = MergeBatchSize): DataFrame = {
    import spark.implicits._
    val base = wordFreq.select(col("word").cast("string"), col("freq").cast("long"))
      .as[(String, Long)].cache()
    if (base.count() <= localThreshold) {
      val rows = trainLocal(base.collect().toSeq, numMerges).zipWithIndex.map {
        case ((l, r, n), i) => (i + 1, l, r, l + r, n)
      }
      base.unpersist()
      return rows.toDF("rank", "left", "right", "merged", "support")
    }
    var merges = Vector.empty[(String, String)]
    val rows = Vector.newBuilder[(Int, String, String, String, Long)]
    var done = false
    while (!done && merges.length < numMerges) {
      val sofar = merges // stable closure capture for this iteration
      val want = math.min(batchSize, numMerges - merges.length)
      val top = base.flatMap { case (w, n) =>
        val syms = applyMerges(w, sofar)
        syms.indices.dropRight(1).iterator.map(i => (syms(i), syms(i + 1), n))
      }.toDF("l", "r", "n")
        .groupBy("l", "r").agg(sum("n").as("n"))
        .orderBy(desc("n"), asc("l"), asc("r"))
        .limit(want + 1) // +1: the boundary candidate the batch must clear
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
      if (top.isEmpty) done = true
      else acceptBatch(top, want).foreach { case (l, r, n) =>
        merges :+= ((l, r))
        rows += ((merges.length, l, r, l + r, n))
      }
    }
    base.unpersist()
    rows.result().toDF("rank", "left", "right", "merged", "support")
  }
}
