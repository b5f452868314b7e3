package graft.vector

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFns

/** O17 — batch top-k cosine similarity search (SURVEY.md §2.3).
  *
  * Reference semantics: Qdrant cosine search, k=5 over the whole
  * collection (`/root/reference/app.py:261-271`, distance pinned at
  * `app.py:87`). Re-expressed Spark-first:
  *
  *   - the (small) query side is `broadcast()` — the cross join becomes a
  *     BroadcastNestedLoopJoin with NO shuffle of the candidate side, so
  *     it scales linearly with the index: each executor streams its local
  *     candidate partitions past the in-memory query set;
  *   - norms are precomputed per side (n+m, not n·m evaluations);
  *   - scoring runs in codegen'd Project via higher-order functions;
  *   - `row_number <= k` compiles to WindowGroupLimitExec (Spark ≥3.5),
  *     which pushes the per-group limit below the single shuffle on
  *     `query_id`, so only ~k·|queries| rows ever cross the wire;
  *   - deterministic tie-break on candidate id.
  */
object TopK {

  /** queries(query_id, qvec) × cands(vec_id, cvec) → top-k rows per query
    * with columns (query_id, vec_id, cosine DOUBLE, rank INT).
    */
  def topKCosine(queries: DataFrame, cands: DataFrame, k: Int): DataFrame = {
    val q = queries
      .withColumn("qvec", VectorFns.asDouble(col("qvec")))
      .withColumn("qnorm", VectorFns.normL2(col("qvec")))
    val c = cands
      .withColumn("cvec", VectorFns.asDouble(col("cvec")))
      .withColumn("cnorm", VectorFns.normL2(col("cvec")))

    val scored = c
      .crossJoin(broadcast(q))
      .withColumn("cosine", VectorFns.safeCosine(VectorFns.dot(col("qvec"), col("cvec")), col("qnorm"), col("cnorm")))

    val w = Window.partitionBy("query_id").orderBy(desc("cosine"), asc("vec_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id"), col("cosine"), col("rank").cast("int").as("rank"))
  }
}
