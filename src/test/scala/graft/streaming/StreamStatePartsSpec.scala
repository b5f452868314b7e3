package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.StreamQueries

/** The r19 scale-adaptive state-partition rule (StreamQueries
  * .adaptiveStateParts): floor keeps cores busy only while each slice
  * carries at least one bring-up's worth of bytes; ceiling targets the
  * usual shuffle-partition band; cap bounds runaway counts at 8×cores.
  * Constants (64 MB target, 256 KB floor) were sized by the sf0.1
  * 1/4/8/32-partition sweep recorded in OPTIMIZATION_r19.md. */
class StreamStatePartsSpec extends AnyFunSuite {
  private val MB = 1024L * 1024
  private val target = 64L * MB
  private val minB = 256L * 1024

  test("tiny source (sf0.01-class, ~200 KB) collapses to 1 partition") {
    assert(StreamQueries.adaptiveStateParts(200L * 1024, 32, target, minB) === 1)
  }

  test("sf0.1-class source (2 MB) lands on the measured 8-partition optimum") {
    assert(StreamQueries.adaptiveStateParts(2L * MB, 32, target, minB) === 8)
  }

  test("floor saturates at core count once bytes justify it") {
    // 100 MB / 256 KB = 400 slices >> 32 cores → floor = cores; ceiling
    // term ceil(100 MB / 64 MB) = 2 < 32 → parts = 32
    assert(StreamQueries.adaptiveStateParts(100L * MB, 32, target, minB) === 32)
  }

  test("large source is sized by the 64 MB target, capped at 8×cores") {
    // 10 GB → ceil(10 GB/64 MB) = 160 partitions on a 32-core box (< cap 256)
    assert(StreamQueries.adaptiveStateParts(10L * 1024 * MB, 32, target, minB) === 160)
    // 1 TB → 16384 by the ratio, capped to 8×32 = 256
    assert(StreamQueries.adaptiveStateParts(1024L * 1024 * MB, 32, target, minB) === 256)
  }

  test("degenerate inputs never yield < 1 partition") {
    assert(StreamQueries.adaptiveStateParts(0L, 32, target, minB) === 1)
    assert(StreamQueries.adaptiveStateParts(1L, 1, target, minB) === 1)
  }

  test("unknown source size (bytes < 0) falls back to CORES, never 1") {
    // r20 (VERDICT r19 task 2): an unprobeable source must keep full
    // parallelism — collapsing a 100 TB stream onto one state store is
    // the failure mode the probe fallback exists to prevent
    assert(StreamQueries.statePartsFor(-1L, 32, target, minB) === 32)
    assert(StreamQueries.statePartsFor(-1L, 1, target, minB) === 1)
    // known sizes still route through the adaptive rule
    assert(StreamQueries.statePartsFor(2L * MB, 32, target, minB) === 8)
  }
}

/** The Hadoop-FS byte probe itself (needs a SparkSession for the Hadoop
  * conf): must sum NESTED directories recursively — the r19 java.io.File
  * probe summed only top-level plain files, so a Hive-partitioned
  * (directory-shaped) source read as ~0 bytes and collapsed to 1 state
  * partition (ADVICE r19). */
class SourceBytesProbeSpec extends graft.SparkSuite {
  test("recursive directory sizing and the missing-path sentinel") {
    val root = java.nio.file.Files.createTempDirectory("srcbytes").toFile
    try {
      val nested = new java.io.File(root, "day=2026-08-19")
      assert(nested.mkdirs())
      java.nio.file.Files.write(new java.io.File(root, "a.parquet").toPath,
        Array.fill[Byte](100)(1))
      java.nio.file.Files.write(new java.io.File(nested, "b.parquet").toPath,
        Array.fill[Byte](50)(1))
      assert(StreamQueries.sourceBytes(spark, root.getAbsolutePath) === 150L)
      assert(StreamQueries.sourceBytes(spark,
        new java.io.File(root, "nope").getAbsolutePath) === -1L)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(root)
    }
  }
}
