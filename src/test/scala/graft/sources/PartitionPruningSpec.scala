package graft.sources

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Hive-partitioned lake layout (q80's machinery): static partition
  * pruning must cut the file listing BEFORE any rows are read, and
  * dynamic partition pruning must plant a runtime filter on the fact
  * scan from a joined dimension's predicate. */
class PartitionPruningSpec extends SparkSuite {

  private lazy val lake: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_lake").toFile
    import spark.implicits._
    (0 until 1000).map { i =>
      (i.toLong, s"u${i % 37}", Seq("view", "click", "purchase", "signup", "error")(i % 5), i * 1.5)
    }.toDF("event_id", "user", "event_type", "value")
      .write.partitionBy("event_type").orc(new java.io.File(dir, "events").getAbsolutePath)
    new java.io.File(dir, "events").getAbsolutePath
  }

  private def scanOf(df: org.apache.spark.sql.DataFrame): FileSourceScanExec =
    df.queryExecution.executedPlan.collectFirst { case f: FileSourceScanExec => f }.get

  test("static pruning: the partition predicate cuts the file listing") {
    val all = spark.read.orc(lake)
    val pruned = all.filter(col("event_type") === "purchase").select("event_id", "value")
    val scan = scanOf(pruned)
    // the predicate reached the scan's partition filters…
    assert(scan.metadata("PartitionFilters").contains("event_type"))
    // …and only 1 of the 5 partition directories' files survive listing
    val fullScan = scanOf(all.select("event_id"))
    assert(scan.selectedPartitions.partitionCount === 1)
    assert(fullScan.selectedPartitions.partitionCount === 5)
    assert(scan.selectedPartitions.totalNumberOfFiles <
      fullScan.selectedPartitions.totalNumberOfFiles)
    assert(pruned.count() === 200)
  }

  test("dynamic partition pruning: a dim filter plants a runtime partition filter") {
    import spark.implicits._
    // fact ⋈ dim on the PARTITION column, selective filter on the dim —
    // the optimizer reuses the dim's broadcast as a partition filter on
    // the fact scan (visible as a dynamicpruning expression). The dim is
    // file-backed: a purely local relation would constant-fold the
    // filter away and there'd be no predicate for DPP to derive from.
    val dimPath = java.nio.file.Files.createTempDirectory("graft_dim").toString
    Seq(("purchase", "revenue"), ("click", "engagement"),
      ("view", "engagement"), ("signup", "growth"), ("error", "ops"))
      .toDF("event_type", "family")
      .write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.parquet(dimPath)
    val joined = spark.read.orc(lake)
      .join(dim.filter(col("family") === "revenue"), Seq("event_type"))
      .agg(sum(col("value").cast("decimal(18,2)")).cast("double").as("rev"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"expected a dynamicpruning partition filter in:\n$plan")
    assert(joined.first().getDouble(0) === (0 until 1000)
      .filter(_ % 5 == 2).map(_ * 1.5).sum)
  }
}
