package graft.sources

import graft.{SparkEntry, SparkSuite}
import org.apache.spark.sql.functions._

/** q119's quarantine semantics — what the aggregate oracle can't see:
  * the corrupt column captures the RAW line (rows stay re-processable),
  * clean rows parse every field, and the same lake under FAILFAST
  * refuses to load at all. */
class CsvQuarantineSpec extends SparkSuite {

  private val tsFmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
  private val schema = "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, " +
    "event_type STRING, value DOUBLE, props STRING, _quarantine STRING"

  /** Stage the lake via the query itself, then resolve its EXACT
    * fingerprinted root via the same helper stagedBlobs uses — never a
    * prefix+mtime scan that could pick a stale generation (ADVICE r15). */
  private lazy val lakePath: String = {
    SparkEntry.queries("q119_csv_quarantine")(spark, sfDir).count()
    val root = graft.queries.SourceQueries.stagedBlobRoot(sfDir, "csvq", srcTable = "events")
    new java.io.File(root, "events_csv").getAbsolutePath
  }

  test("quarantined rows carry the raw line; value parses null") {
    val raw = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_quarantine")
      .option("timestampFormat", tsFmt)
      .csv(lakePath)
    // keep real columns in every projection: Spark disallows scans that
    // reference ONLY the corrupt-record column (count() would prune to it)
    val q = raw.filter(col("_quarantine").isNotNull)
      .select(col("event_id"), col("value"), col("_quarantine")).collect()
    assert(q.nonEmpty, "the sf0.001 corpus must contain event_id % 97 == 0 rows")
    // every quarantined row: raw line retained (contains the N/A token),
    // the typed value column nulled, the id still addressable
    q.foreach { r =>
      assert(!r.isNullAt(0) && r.getLong(0) % 97 === 0L)
      assert(r.isNullAt(1), "the malformed value field must parse to null")
      assert(r.getString(2).contains(",N/A,"), "raw line must be retained")
    }
  }

  test("clean rows parse every declared field") {
    val raw = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_quarantine")
      .option("timestampFormat", tsFmt)
      .csv(lakePath)
    val bad = raw.filter(col("_quarantine").isNull &&
      (col("value").isNull || col("ts").isNull || col("event_type").isNull))
      .count()
    assert(bad === 0)
  }

  test("the same lake under FAILFAST refuses to load") {
    val strictSchema = "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, " +
      "event_type STRING, value DOUBLE, props STRING"
    val ex = intercept[Exception] {
      // must reference a parsed field: count() alone skips field
      // conversion entirely and never trips the malformed row
      spark.read.schema(strictSchema)
        .option("mode", "FAILFAST")
        .option("timestampFormat", tsFmt)
        .csv(lakePath)
        .agg(sum(col("value"))).collect()
    }
    assert(ex.getMessage != null)
  }
}
