package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sequence packing — bin docs into fixed token-budget context windows
  * (the training-batch assembly op). Global first-fit is inherently
  * sequential, so the distributed form packs WITHIN deterministic
  * buckets (doc_id ranges): each bucket's docs are packed first-fit in
  * doc_id order inside one flatMapGroups call. Results are independent
  * of partitioning/parallelism (the bucket, not the partition, is the
  * packing unit), and buckets pack in parallel across executors — the
  * standard scale trade: ~optimal packing inside buckets, zero global
  * coordination.
  */
object Packing {

  /** docs(doc_id, n_tokens) → (bucket, bin_id, n_docs, used_tokens,
    * fill_rate) with first-fit in doc_id order per bucket. Docs longer
    * than `capacity` get a bin of their own (truncation is the caller's
    * policy decision). */
  def packFirstFit(spark: SparkSession, docs: DataFrame,
                   capacity: Int = 512, bucketSize: Int = 100): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("n_tokens").cast("long"))
      .withColumn("bucket", expr(s"doc_id div $bucketSize"))
      .as[(Long, Long, Long)]
      .groupByKey(_._3)
      .flatMapGroups { (bucket, rows) =>
        val sorted = rows.toSeq.sortBy(_._1) // deterministic order
        val bins = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)] // (used, nDocs)
        val assign = scala.collection.mutable.ArrayBuffer.empty[(Long, Int)]
        for ((id, tok, _) <- sorted) {
          val fit = bins.indexWhere(_._1 + tok <= capacity)
          val idx = if (fit >= 0 && tok <= capacity) fit
          else { bins += ((0L, 0L)); bins.length - 1 }
          bins(idx) = (bins(idx)._1 + tok, bins(idx)._2 + 1)
          assign += ((id, idx))
        }
        bins.zipWithIndex.map { case ((used, nDocs), binId) =>
          (bucket, binId, nDocs, used, math.rint(used.toDouble / capacity * 1e6) / 1e6)
        }
      }
      .toDF("bucket", "bin_id", "n_docs", "used_tokens", "fill_rate")
  }
}
