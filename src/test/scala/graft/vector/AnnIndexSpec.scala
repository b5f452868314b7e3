package graft.vector

import graft.SparkSuite
import graft.queries.PipelineQueries

/** q35c's persisted-IVF contract: the probe join dynamically prunes the
  * cell-partitioned index scan, and results equal the in-query path. */
class AnnIndexSpec extends SparkSuite {

  test("probe join plants dynamic partition pruning on the cell lake scan") {
    val df = PipelineQueries.annIvfFromIndex(spark, sfDir)
    val formatted = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // the index-side scan must carry a runtime (dynamic) partition filter
    // on cell — without it every cell's files are read per query batch
    assert(formatted.toLowerCase.contains("dynamicpruning"), formatted.take(3000))
  }

  test("index-path results equal the in-query path (q35) bit-for-bit") {
    val fromIndex = PipelineQueries.annIvfFromIndex(spark, sfDir).collect().toSeq
    val inQuery = PipelineQueries.annIvf(spark, sfDir).collect().toSeq
    assert(fromIndex === inQuery)
  }

  // ---- q129: incremental append contract ----------------------------------
  private def newestLake(fmt: String): java.io.File = {
    val sfName = new java.io.File(sfDir).getName
    new java.io.File("/root/repo/target").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith(s"blobs_${fmt}_${sfName}_"))
      .sortBy(_.lastModified()).lastOption
      .getOrElse(fail(s"lake blobs_${fmt}_${sfName}_* not staged"))
  }

  private def fileSnapshot(root: java.io.File): Map[String, (Long, Long)] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(root).map(f => f.getAbsolutePath -> (f.length(), f.lastModified())).toMap
  }

  private def rmr(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(rmr)
    f.delete(): Unit
  }

  test("q129 append writes only delta files — the base index is never touched") {
    import graft.SparkEntry
    val run = SparkEntry.queries("q129_ivf_index_append")
    run(spark, sfDir).collect()
    val base = newestLake("ivfinc")
    val before = fileSnapshot(base)
    // force a FRESH append: drop the delta lake, re-run — the base index
    // must come through byte-identical (same paths, sizes, mtimes)
    newestLake("ivfincd").getParentFile.listFiles()
      .filter(_.getName.startsWith(s"blobs_ivfincd_"))
      .foreach(rmr)
    val out = run(spark, sfDir).collect()
    assert(fileSnapshot(base) === before,
      "the incremental append modified base index files")
    // the re-created delta holds only cell-partitioned invlist dirs whose
    // cells are a subset of the base cells (every centroid owns itself)
    val delta = newestLake("ivfincd")
    def cells(root: java.io.File): Set[String] =
      new java.io.File(root, "cells").listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("cell=")).map(_.getName).toSet
    val (bc, dc) = (cells(base), cells(delta))
    assert(dc.nonEmpty && dc.subsetOf(bc), s"delta cells $dc vs base $bc")
    assert(out.nonEmpty && out.exists(_.getAs[Long]("n_new") > 0))
  }

  test("serving probe against the appended delta lake still DPP-prunes") {
    import graft.SparkEntry
    import org.apache.spark.sql.functions._
    SparkEntry.queries("q129_ivf_index_append")(spark, sfDir).collect()
    val delta = spark.read.parquet(
      new java.io.File(newestLake("ivfincd"), "cells").getAbsolutePath)
    val base = spark.read.parquet(
      new java.io.File(newestLake("ivfinc"), "cells").getAbsolutePath)
    val queries = base.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("n").as("qn"), col("cell"))
    val probe = delta.join(broadcast(queries), Seq("cell"))
    val formatted = probe.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(formatted.toLowerCase.contains("dynamicpruning"), formatted.take(3000))
  }
}
