package graft

import org.scalatest.funsuite.AnyFunSuite

/** Contract guard for the driver registry: every registered query either
  * carries a DuckDB oracle or is on the pinned rows-only list (each of
  * which is unit/property-tested instead — SURVEY §8). A new query that
  * forgets its oracle, or an oracle whose query was renamed away, fails
  * here before the driver's correctness run does. */
class RegistrySpec extends AnyFunSuite {

  // q36/q38/q39/q83b were lifted to the witness-oracle tier in round 9,
  // q83 in round 10 (merge-table invariants + DuckDB-recomputed first
  // merge) — only the queries whose OUTPUT VALUES are engine-internal
  // remain here
  private val rowsOnly = Set(
    "q07_index_build",      // embedder output digests; embedder is unit-tested
    "q32_neardup_minhash",  // Murmur not in DuckDB; brute-force parity spec
    "q33_neardup_simhash",  // same
    "q37_ann_mllib")        // MLlib LSH cross-check, recall column spec'd

  test("every query has an oracle or a documented rows-only justification") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- rowsOnly
    assert(missing.isEmpty, s"queries with neither oracle nor rows-only pin: $missing")
  }

  test("no orphaned oracles and no stale rows-only pins") {
    val orphaned = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphaned.isEmpty, s"oracles without a registered query: $orphaned")
    val stale = rowsOnly -- SparkEntry.queries.keySet
    assert(stale.isEmpty, s"rows-only pins for unregistered queries: $stale")
    val both = rowsOnly.intersect(SparkEntry.oracleSql.keySet)
    assert(both.isEmpty, s"queries pinned rows-only but carrying an oracle: $both")
  }
}
