package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** O6/O7/O8 — collection lifecycle as parquet-table DDL (SURVEY §2.1).
  *
  * The reference's Qdrant collection ops map to table-path operations:
  *   - create  (app.py:84-91, idempotent "already exists" swallow)
  *     → first write with SaveMode.Ignore;
  *   - upsert  (app.py:204-212, add_documents)
  *     → SaveMode.Append of embedded chunk rows;
  *   - truncate (app.py:493-498, delete+recreate with same params)
  *     → SaveMode.Overwrite with an empty frame of the same schema.
  *
  * All are executor-parallel writes; none of them list files on the
  * driver beyond what the parquet committer already does.
  */
object Collections {

  def exists(spark: SparkSession, path: String): Boolean =
    // Only "path is not a readable table" means absent; anything else
    // (OOM, interrupt, a genuinely corrupt store) must propagate.
    try { spark.read.parquet(path).schema; true }
    catch { case _: org.apache.spark.sql.AnalysisException => false }

  /** Idempotent CREATE: writes an empty table if absent, no-op if present. */
  def create(spark: SparkSession, path: String, schema: StructType): Unit =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      .write.mode(SaveMode.Ignore).parquet(path)

  /** Upsert = append (the reference's add_documents has insert-only
    * semantics; dedup-on-reingest is the O25 anti-join upstream). */
  def upsert(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Append).parquet(path)

  /** Drop + recreate with identical schema. */
  def truncate(spark: SparkSession, path: String, schema: StructType): Unit =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      .write.mode(SaveMode.Overwrite).parquet(path)
}
