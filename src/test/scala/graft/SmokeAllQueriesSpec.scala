package graft

/** Every registered query must EXECUTE at sf0.001 — no exceptions, no
  * skips. This is the local gate the q113 incident (round 13) proved
  * necessary: a query was registered whose stream source could not even
  * open (`basePath must be a directory`), erred in both driver bench
  * legs, and shipped anyway because no local test ever ran the harness
  * entry itself (its processor was unit-green). `count()` forces the
  * full plan end-to-end; a query that cannot run fails `sbt test`, not
  * the driver bench three hours later.
  *
  * One test PER query so a failure names its query in the report and
  * the rest still run (a single loop-test would stop at the first).
  */
class SmokeAllQueriesSpec extends SparkSuite {
  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"smoke: $name executes at sf0.001") {
      val n = fn(spark, sfDir).count()
      assert(n >= 0) // execution itself is the assertion; rows>0 is entry()'s
    }
  }

  test("smoke: entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
