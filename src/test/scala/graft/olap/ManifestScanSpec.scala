package graft.olap

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSuite}
import graft.core.Tables

/** q161's contract: the manifest-planned scan equals the full-scan
  * truth, pruning genuinely happens (and is exactly the overlap
  * arithmetic), and the staged manifest is a valid Avro artifact whose
  * opaque unit layout is a true permutation of the day index. */
class ManifestScanSpec extends SparkSuite {

  private val loOff = 615600000000L
  private val hiOff = 1054800000000L

  private lazy val out = SparkEntry.queries("q161_manifest_scan")(spark, sfDir)

  private lazy val dayStats = Tables.events(spark, sfDir)
    .select(unix_micros(col("ts")).as("us"))
    .withColumn("d", expr("us div 86400000000"))
    .groupBy("d").agg(min("us").as("mn"), max("us").as("mx"))
    .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

  test("pruned scan equals the full-scan truth") {
    val e = Tables.events(spark, sfDir).withColumn("us", unix_micros(col("ts")))
    val t0 = e.agg(min("us")).head().getLong(0)
    val full = e.filter(col("us") >= t0 + loOff && col("us") <= t0 + hiOff)
      .groupBy("event_type").agg(count(lit(1)).as("n"), sum("event_id").as("id_sum"))
    val got = out.select(col("event_type"), col("n"), col("id_sum"))
    assert(got.exceptAll(full).count() == 0 && full.exceptAll(got).count() == 0)
    assert(got.count() > 0)
  }

  test("pruning happened and matches the overlap arithmetic exactly") {
    val r = out.head()
    val total = r.getLong(3)
    val scanned = r.getLong(4)
    assert(total == dayStats.length.toLong)
    val t0 = dayStats.map(_._2).min
    val expectScanned = dayStats.count { case (_, mn, mx) =>
      mx >= t0 + loOff && mn <= t0 + hiOff
    }.toLong
    assert(scanned == expectScanned, s"scanned $scanned != $expectScanned")
    assert(scanned < total, "predicate window must not cover the whole lake")
    assert(out.select("units_total", "units_scanned").distinct().count() == 1)
  }

  test("plan: ts predicate pushes into the parquet scan; only surviving units are read") {
    val plan = out.queryExecution.executedPlan.toString
    // the residual time filter must reach the parquet reader, not sit
    // above it on a derived column
    assert(plan.contains("PushedFilters: [IsNotNull(ts), GreaterThanOrEqual(ts"),
      s"ts bounds not pushed:\n${plan.take(2000)}")
    // the scan's file listing is the manifest's surviving units only:
    // recompute survivors from day stats and check location strings
    val t0 = dayStats.map(_._2).min
    val nSurvive = dayStats.count { case (_, mn, mx) =>
      mx >= t0 + loOff && mn <= t0 + hiOff
    }
    val nPaths = "InMemoryFileIndex\\((\\d+) paths\\)".r
      .findFirstMatchIn(plan).map(_.group(1).toInt)
    assert(nPaths.contains(nSurvive),
      s"scan lists $nPaths unit dirs, expected $nSurvive")
  }

  test("q161b: expiry is metadata-only, append is real, generation arithmetic exact") {
    val out = SparkEntry.queries("q161b_manifest_generations")(spark, sfDir).collect()
    val r = out.head
    val (g1, g2, expired, scanned) =
      (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))
    val t0 = dayStats.map(_._2).min
    val expectExpired = dayStats.count(_._3 < t0 + 172800000000L).toLong
    val lateDays = Tables.events(spark, sfDir)
      .filter(col("event_id") % 17 === 0)
      .select((unix_micros(col("ts")) + 2678400000000L).as("us"))
      .select(expr("us div 86400000000")).distinct().count()
    assert(g1 == dayStats.length.toLong)
    assert(expired == expectExpired && expired > 0)
    assert(g2 == g1 - expired + lateDays, s"g2 $g2 != $g1 - $expired + $lateDays")
    assert(scanned > 0 && scanned <= g2)
    // metadata-only delete: every g1 unit dir STILL exists on disk, and
    // the g2 manifest simply no longer references the expired ones
    val root = graft.queries.SourceQueries.stagedBlobRoot(sfDir, "manifestg2",
      srcTable = "events")
    def entries(name: String) = graft.sources.Avro.decode(
      java.nio.file.Files.readAllBytes(new java.io.File(root, name).toPath))._2
    val m1 = entries("manifest.avro")
    val m2 = entries("manifest_g2.avro")
    m1.foreach { e =>
      assert(new java.io.File(root, e(1).asInstanceOf[String]).isDirectory,
        s"g1 unit dir ${e(1)} was touched by the metadata-only expiry")
    }
    val g2paths = m2.map(_(1).asInstanceOf[String]).toSet
    val expiredPaths = m1.filter(_(4).asInstanceOf[Long] < t0 + 172800000000L)
      .map(_(1).asInstanceOf[String])
    assert(expiredPaths.nonEmpty && expiredPaths.forall(!g2paths.contains(_)))
    assert(m2.count(_(1).asInstanceOf[String].startsWith("delta/")) == lateDays)
  }

  test("the manifest is strict Avro over an opaque unit permutation; paths exist") {
    out.count() // force staging
    val root = graft.queries.SourceQueries.stagedBlobRoot(sfDir, "manifestlake",
      srcTable = "events")
    val (schema, entries) = graft.sources.Avro.decode(
      java.nio.file.Files.readAllBytes(
        new java.io.File(root, "manifest.avro").toPath))
    assert(schema == graft.queries.OlapQueries.manifestSchema)
    assert(entries.length == dayStats.length)
    // units are a permutation of 0..n-1 (opaque: no order correlation needed)
    val units = entries.map(_(0).asInstanceOf[Long]).sorted
    assert(units == (0L until entries.length.toLong).toVector)
    // every manifest path exists and its stats match a real day's stats
    val statSet = dayStats.map { case (_, mn, mx) => (mn, mx) }.toSet
    entries.foreach { e =>
      assert(new java.io.File(root, e(1).asInstanceOf[String]).isDirectory,
        s"missing unit dir ${e(1)}")
      assert(statSet.contains(
        (e(3).asInstanceOf[Long], e(4).asInstanceOf[Long])),
        s"manifest stats for unit ${e(0)} match no day")
    }
    // row counts in the manifest sum to the corpus
    val n = entries.map(_(2).asInstanceOf[Long]).sum
    assert(n == Tables.events(spark, sfDir).count())
  }
}
