package graft.vector

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import scala.collection.mutable.ArrayBuffer

import graft.functions.VectorFns

/** O18 — Maximal Marginal Relevance re-rank (SURVEY §2.3).
  *
  * Reference: `search_type="mmr"`, k=5, fetch_k=20, lambda_mult=0.5
  * (`/root/reference/app.py:261-267`): fetch the 20 nearest, then greedily
  * pick 5 maximizing `λ·sim(q,d) − (1−λ)·max_{s∈selected} sim(d,s)`.
  *
  * Spark shape (SURVEY §4): the candidate stage is the broadcast top-k
  * (one shuffle, WindowGroupLimit); the greedy stage is inherently
  * sequential PER QUERY, so object code is confined to ≤fetch_k rows per
  * group via `groupByKey.flatMapGroups` — at any scale each group is ≤20
  * rows, so this never collects to the driver and never breaks the
  * partition-parallelism across queries.
  */
object Mmr {

  /** Pure greedy MMR over (id, relevance, vector) candidates.
    * Deterministic: ties broken by lower id. Returns (id, score, rank)
    * where score is the MMR objective at selection time (the first pick's
    * score is λ·sim, matching the objective with an empty selected set). */
  def select(cands: Seq[(Long, Double, Array[Double])], k: Int, lambda: Double)
      : Seq[(Long, Double, Int)] = {
    val remaining = ArrayBuffer.from(cands.sortBy(c => (-c._2, c._1)))
    val out = ArrayBuffer.empty[(Long, Double, Int)]
    val selectedVecs = ArrayBuffer.empty[Array[Double]]
    var rank = 1
    while (out.length < k && remaining.nonEmpty) {
      var bestIdx = 0
      var bestScore = Double.NegativeInfinity
      var i = 0
      while (i < remaining.length) {
        val (id, rel, vec) = remaining(i)
        // the redundancy term is max over SIGNED similarities — a
        // candidate anti-correlated with everything selected must get a
        // bonus, not be clamped to 0 (public MMR semantics)
        var maxSim = Double.NegativeInfinity
        var j = 0
        while (j < selectedVecs.length) {
          val s = cosine(vec, selectedVecs(j))
          if (s > maxSim) maxSim = s
          j += 1
        }
        val score =
          if (selectedVecs.isEmpty) lambda * rel
          else lambda * rel - (1.0 - lambda) * maxSim
        if (score > bestScore ||
          (score == bestScore && id < remaining(bestIdx)._1)) {
          bestScore = score; bestIdx = i
        }
        i += 1
      }
      val (id, _, vec) = remaining.remove(bestIdx)
      selectedVecs += vec
      out += ((id, bestScore, rank))
      rank += 1
    }
    out.toSeq
  }

  private def cosine(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** DataFrame operator: queries(query_id, qvec) × cands(vec_id, cvec) →
    * (query_id, vec_id, mmr_score DOUBLE, mmr_rank INT), k rows per query. */
  def mmrRerank(queries: DataFrame, cands: DataFrame,
                k: Int = 5, fetchK: Int = 20, lambda: Double = 0.5): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._

    val q = queries
      .withColumn("qvec", VectorFns.asDouble(col("qvec")))
      .withColumn("qnorm", VectorFns.normL2(col("qvec")))
    val c = cands
      .withColumn("cvec", VectorFns.asDouble(col("cvec")))
      .withColumn("cnorm", VectorFns.normL2(col("cvec")))

    // candidate stage = top-fetchK per query, vectors carried through
    val w = Window.partitionBy("query_id").orderBy(desc("cosine"), asc("vec_id"))
    val fetched = c.crossJoin(broadcast(q))
      .withColumn("cosine", VectorFns.safeCosine(VectorFns.dot(col("qvec"), col("cvec")), col("qnorm"), col("cnorm")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= fetchK)
      .select(col("query_id").cast("long"), col("vec_id").cast("long"),
        col("cosine"), col("cvec"))

    fetched.as[(Long, Long, Double, Seq[Double])]
      .groupByKey(_._1)
      .flatMapGroups { (qid, rows) =>
        val cs = rows.map { case (_, id, rel, vec) => (id, rel, vec.toArray) }.toSeq
        Mmr.select(cs, k, lambda).map { case (id, score, rank) => (qid, id, score, rank) }
      }
      .toDF("query_id", "vec_id", "mmr_score", "mmr_rank")
  }
}
