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
}
