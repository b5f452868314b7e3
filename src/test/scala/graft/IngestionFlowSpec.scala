package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.embed.HashEmbedder
import graft.sources.Collections
import graft.text.Chunker
import graft.vector.{Mmr, TopK}

/** End-to-end E1 + E2 lifecycle (SURVEY §3) over real test data:
  * ingest documents → chunk → embed → build the index collection →
  * top-k retrieve → MMR re-rank — the reference's full pipeline
  * (app.py:160-212 ingestion, app.py:256-296 retrieval) as one flow. */
class IngestionFlowSpec extends SparkSuite {

  test("E1→E2: ingest, index, retrieve, re-rank") {
    import spark.implicits._
    val dim = 32
    val indexPath = Files.createTempDirectory("graft-e2e").toString + "/index"

    // E1: ingest — chunk (reference splitter, scaled config) + embed
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text")).as[(Long, String)]
    val chunks = docs.flatMap { case (id, text) =>
      Chunker.chunkWithIds(text, chunkSize = 200, overlap = 40)
        .map(c => (id, c.chunkId.toLong, c.text))
    }.toDF("doc_id", "chunk_id", "chunk")
    val embedded = chunks.withColumn("embedding", HashEmbedder.embedUdf(dim)(col("chunk")))

    Collections.create(spark, indexPath, embedded.schema)
    Collections.upsert(embedded, indexPath)
    val index = spark.read.parquet(indexPath)
    assert(index.count() === chunks.count())
    assert(index.count() > 500) // every doc chunked, ≥1 chunk each

    // E2: retrieve — embed 3 query strings with the same embedder, top-20
    // candidates, MMR down to 5 (k/fetch_k per app.py:264-266)
    val queries = Seq(
      (0L, "spark merge join speed"),
      (1L, "filter window hash table scan"),
      (2L, "vector stream batch"))
      .toDF("query_id", "qtext")
      .withColumn("qvec", HashEmbedder.embedUdf(dim)(col("qtext")))
      .select(col("query_id"), col("qvec"))
    val cands = index.select(
      (col("doc_id") * 1000 + col("chunk_id")).as("vec_id"), col("embedding").as("cvec"))

    val top20 = TopK.topKCosine(queries.select(col("query_id"), col("qvec")), cands, k = 20)
    val perQuery = top20.groupBy("query_id").count().collect()
    assert(perQuery.length === 3 && perQuery.forall(_.getLong(1) === 20L))

    val mmr = Mmr.mmrRerank(queries, cands, k = 5, fetchK = 20, lambda = 0.5)
    val picked = mmr.orderBy("query_id", "mmr_rank").collect()
    assert(picked.length === 15)
    // MMR output ⊆ the top-20 candidate set for the same query
    val topSet = top20.select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    assert(picked.forall(r => topSet.contains((r.getLong(0), r.getLong(1)))))
    // rank 1 = the plain nearest neighbor (argmax relevance)
    val nn = top20.filter(col("rank") === 1).select("query_id", "vec_id")
      .as[(Long, Long)].collect().toMap
    picked.filter(_.getInt(3) == 1).foreach { r =>
      assert(nn(r.getLong(0)) === r.getLong(1))
    }

    // E3: truncate (clear-all analog) leaves an empty, readable collection
    Collections.truncate(spark, indexPath, embedded.schema)
    assert(spark.read.parquet(indexPath).count() === 0)
  }
}
