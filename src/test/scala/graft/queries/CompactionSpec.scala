package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSuite}

/** q156's contract: the compacted generation is exactly base ∪ delta
  * (row-payload identical — any serve over it is therefore equal), the
  * serving plan consults ONLY the compacted root, untouched cells and
  * the codebook travel as hard links (zero copy), and a re-run serves
  * the published generation without rewriting a byte. */
class CompactionSpec extends SparkSuite {

  // sf0.001 quantizes into a single cell (bounded-K floor) — every claim
  // would be vacuous; sf0.01 has 5 cells
  override val sfDir = "/root/testdata/sf0.01"

  private def lake(fmt: String): java.io.File = {
    val root = SourceQueries.stagedBlobRoot(sfDir, fmt, srcTable = "embeddings")
    assert(root.exists(), s"lake $fmt not staged at $root")
    root
  }

  private def fileKey(f: java.io.File): AnyRef =
    Files.readAttributes(f.toPath,
      classOf[java.nio.file.attribute.BasicFileAttributes]).fileKey()

  private def cellRows(dir: java.io.File) =
    spark.read.parquet(dir.getAbsolutePath)
      .select(col("vec_id"), col("cell").cast("long").as("cell"),
        col("ccos").cast("string").as("ccos"), col("v"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getAs[Seq[Double]]("v").toList))
      .toSet

  test("the compacted generation holds exactly base ∪ delta, payloads intact") {
    val census = SparkEntry.queries("q156_index_compact")(spark, sfDir).collect()
    assert(census.nonEmpty)
    census.foreach { r =>
      assert(r.getAs[Long]("n_total") ==
        r.getAs[Long]("n_base") + r.getAs[Long]("n_new"),
        s"cell ${r.getAs[Long]("cell")}: measured total diverges from base+delta")
    }
    // full-payload row-set equality — stronger than the count census, and
    // it implies serve-equality for ANY query over the generation
    val comp = cellRows(new java.io.File(lake("ivfcomp"), "cells"))
    val base = cellRows(new java.io.File(lake("ivfinc"), "cells"))
    val delta = cellRows(new java.io.File(lake("ivfincd"), "cells"))
    assert(base.intersect(delta).isEmpty, "base and delta overlap — bad fixture")
    assert(comp == base.union(delta), "compacted generation is not base ∪ delta")
  }

  test("the q156b serving plan reads ONLY the compacted generation") {
    val df = SparkEntry.queries("q156b_ann_compacted_serve")(spark, sfDir)
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("blobs_ivfcomp_"), plan.take(1500))
    assert(!plan.contains("blobs_ivfincd_"),
      "serving still consults the delta lake — the generation is not self-contained")
    assert(!plan.contains("blobs_ivfinc_" + new java.io.File(sfDir).getName),
      "serving still consults the old base lake")
    assert(df.collect().nonEmpty)
  }

  test("the codebook is hard-linked, and a re-run rewrites nothing") {
    SparkEntry.queries("q156_index_compact")(spark, sfDir).collect()
    val baseCent = new java.io.File(lake("ivfinc"), "centroids")
    val compCent = new java.io.File(lake("ivfcomp"), "centroids")
    val bKeys = baseCent.listFiles().filter(_.isFile)
      .map(f => f.getName -> fileKey(f)).toMap
    val cKeys = compCent.listFiles().filter(_.isFile)
      .map(f => f.getName -> fileKey(f)).toMap
    assert(bKeys == cKeys, "codebook was copied or rewritten (inode mismatch)")
    // fingerprint idempotence: the second call serves the published
    // generation — no file appears, disappears, or changes mtime
    def snap: Map[String, Long] = {
      def walk(f: java.io.File): Seq[(String, Long)] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
        else Seq(f.getAbsolutePath -> f.lastModified)
      walk(lake("ivfcomp")).toMap
    }
    val before = snap
    SparkEntry.queries("q156_index_compact")(spark, sfDir).collect()
    assert(snap == before, "re-run rewrote the published generation")
  }

  test("linked path: untouched cells hard-link, touched cells merge (unit lake)") {
    // the real corpora's uniform delta touches every cell, so the linked
    // branch needs direct coverage: 3-cell base, delta touching cell=1 only
    import spark.implicits._
    val tmp = Files.createTempDirectory("compact_unit").toFile
    val baseCells = new java.io.File(tmp, "base")
    val deltaCells = new java.io.File(tmp, "delta")
    val out = new java.io.File(tmp, "out")
    Seq((1L, 0L), (2L, 0L), (3L, 1L), (4L, 2L)).toDF("vec_id", "cell")
      .repartition(1).write.partitionBy("cell").parquet(baseCells.getAbsolutePath)
    Seq((10L, 1L)).toDF("vec_id", "cell")
      .repartition(1).write.partitionBy("cell").parquet(deltaCells.getAbsolutePath)
    PipelineQueries.compactCellLakes(spark, baseCells, deltaCells, out)
    def keysOf(root: java.io.File, cell: String): Set[AnyRef] =
      new java.io.File(root, cell).listFiles().filter(f => f.isFile &&
        f.getName.endsWith(".parquet")).map(fileKey).toSet
    // untouched cells 0 and 2: same inodes as the base
    assert(keysOf(out, "cell=0") == keysOf(baseCells, "cell=0"))
    assert(keysOf(out, "cell=2") == keysOf(baseCells, "cell=2"))
    // touched cell 1: new files, merged content
    assert(keysOf(out, "cell=1").intersect(keysOf(baseCells, "cell=1")).isEmpty)
    val merged = spark.read.parquet(out.getAbsolutePath)
      .select(col("vec_id"), col("cell").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(merged == Set((1L, 0L), (2L, 0L), (3L, 1L), (10L, 1L), (4L, 2L)))
    org.apache.commons.io.FileUtils.deleteQuietly(tmp)
  }
}
