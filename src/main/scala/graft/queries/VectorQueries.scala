package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.vector.TopK

/** Vector-retrieval query surface (SURVEY §2.3 O17, §2.4 O23). */
object VectorQueries {

  /** O17: top-5 cosine per query; queries = the 3 lowest vec_ids (they are
    * members of the index, so rank 1 is the self-match at cosine 1.0 — same
    * as searching the reference's own collection, app.py:261-271). */
  def topkCosine(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val queries = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val cands = emb.select(col("vec_id"), col("embedding").as("cvec"))
    TopK.topKCosine(queries, cands, k = 5)
      .select(col("query_id"), col("vec_id"), round(col("cosine"), 6).as("cosine"), col("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  val topkCosineOracle: String =
    """WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
      |           FROM embeddings WHERE vec_id < 3),
      |     c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ce FROM embeddings),
      |     scored AS (
      |       SELECT q.query_id, c.vec_id,
      |              list_cosine_similarity(qe, ce) AS cos,
      |              row_number() OVER (PARTITION BY q.query_id
      |                                 ORDER BY list_cosine_similarity(qe, ce) DESC, c.vec_id) AS rnk
      |       FROM q CROSS JOIN c)
      |SELECT query_id, vec_id, round(cos, 6) AS cosine, CAST(rnk AS INTEGER) AS rank
      |FROM scored WHERE rnk <= 5 ORDER BY query_id, rank""".stripMargin

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q17_topk_cosine" -> ((s, d) => topkCosine(s, d))
  )

  def oracles: Map[String, String] = Map(
    "q17_topk_cosine" -> topkCosineOracle
  )
}
