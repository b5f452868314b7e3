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

  /** Learn `numMerges` merges from a (word, freq) DataFrame. Returns the
    * ordered merge table: (rank, left, right, merged, support). */
  def train(spark: SparkSession, wordFreq: DataFrame, numMerges: Int,
            localThreshold: Long = LocalVocabThreshold): DataFrame = {
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
      val top = base.flatMap { case (w, n) =>
        val syms = applyMerges(w, sofar)
        syms.indices.dropRight(1).iterator.map(i => (syms(i), syms(i + 1), n))
      }.toDF("l", "r", "n")
        .groupBy("l", "r").agg(sum("n").as("n"))
        .orderBy(desc("n"), asc("l"), asc("r"))
        .limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val (l, r, n) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges :+= ((l, r))
        rows += ((merges.length, l, r, l + r, n))
      }
    }
    base.unpersist()
    rows.result().toDF("rank", "left", "right", "merged", "support")
  }
}
