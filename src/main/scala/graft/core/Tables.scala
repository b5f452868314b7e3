package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver's test tables (TESTDATA.md / FIXTURES.md).
  *
  * All reads are plain parquet scans — Catalyst gets predicate pushdown,
  * column pruning and partition pruning for free, which is the whole point
  * at 100 TB: never materialize columns a query doesn't touch.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Session-scoped DataFrame memo: every `spark.read.parquet` re-lists
    * the path and re-reads the footer to infer the schema; a bench session
    * touches the same ten tables hundreds of times. Keyed by (session,
    * path) so schemas never leak across sessions or SF dirs; holding the
    * analyzed plan is metadata-only (no rows are pinned — this is what a
    * catalog does for a real lake table).
    *
    * Contract: a fixture path must be IMMUTABLE for the lifetime of the
    * session reading it — the memoized relation pins the eagerly-resolved
    * file listing, so rewriting part files under a live session would
    * serve a stale listing (the same contract a real catalog's snapshot
    * gives). Entries for stopped sessions are purged on the next load so
    * neither the session object nor its listings are retained. */
  private val memo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    memo.keySet.removeIf(k => k._1.sparkContext.isStopped)
    memo.computeIfAbsent((spark, s"$dir/$name.parquet"),
      { case (s, p) => s.read.parquet(p) })
  }

  def region(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS) in the driver corpus
    * (FIXTURES.md), which Spark 4 rejects by default — with the legacy
    * conf it surfaces as LONG nanos, which we truncate to µs (the same
    * ns→µs truncation DuckDB applies, so oracle comparisons agree).
    * Files from other writers surface as TIMESTAMP or TIMESTAMP_NTZ; a
    * 100 TB lake has mixed writers, so the reader adapts to whatever
    * physical type the footer declares instead of assuming one layout. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
