package graft.olap

import graft.{SparkEntry, SparkSuite}
import graft.core.Tables
import org.apache.spark.sql.functions._

/** q137's contract: the digest-based diff classifies exactly the keys the
  * deterministic v2 derivation touched, partitions v1 completely, and the
  * shuffled projection above each scan is (doc_id, digest) — no payloads. */
class SnapshotDiffSpec extends SparkSuite {

  private lazy val diff = SparkEntry.queries("q137_snapshot_diff")(spark, sfDir)
    .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
    .toMap

  test("classification counts reconstruct from the derivation rules") {
    val ids = Tables.documents(spark, sfDir).select(col("doc_id"))
      .collect().map(_.getLong(0))
    val removed = ids.count(_ % 97 == 0).toLong
    val changed = ids.count(id => id % 97 != 0 && id % 53 == 0).toLong
    val added = ids.count(_ % 101 == 0).toLong
    val unchanged = ids.length - removed - changed
    assert(diff("removed")._1 == removed, s"removed: ${diff("removed")._1} vs $removed")
    assert(diff("changed")._1 == changed, s"changed: ${diff("changed")._1} vs $changed")
    assert(diff("added")._1 == added, s"added: ${diff("added")._1} vs $added")
    assert(diff("unchanged")._1 == unchanged)
    // v1 is partitioned: every v1 key lands in exactly one of the 3 v1 classes
    assert(diff("removed")._1 + diff("changed")._1 + diff("unchanged")._1 == ids.length)
  }

  test("added keys live in the re-keyed id space, v1 classes in the original") {
    assert(diff("added")._2 >= 10000000000L, "inserts are re-keyed above the offset")
    Seq("removed", "changed", "unchanged").foreach { c =>
      assert(diff(c)._3 < 10000000000L, s"$c keys stay in the v1 id space")
    }
  }

  test("the shuffled rows carry digests, not document payloads") {
    val plan = SparkEntry.queries("q137_snapshot_diff")(spark, sfDir)
      .queryExecution.executedPlan.toString
    // the projection feeding each exchange is (doc_id, xxhash64(...)); the
    // text column must not appear above any Exchange — only under scans
    val aboveFirstExchange = plan.linesIterator
      .takeWhile(l => !l.contains("Exchange")).mkString("\n")
    assert(!aboveFirstExchange.contains("text#") ||
      aboveFirstExchange.contains("xxhash64"),
      "join-side projections must reduce to (doc_id, digest) before the shuffle")
  }
}
