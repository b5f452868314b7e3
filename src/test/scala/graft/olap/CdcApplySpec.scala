package graft.olap

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSuite}
import graft.core.Tables

/** q159's contract: last-writer-wins picks the HIGHEST sequence per key,
  * deletes beat every update, inserts land above the live key space, and
  * untouched rows pass through byte-identical. */
class CdcApplySpec extends SparkSuite {

  private lazy val out = SparkEntry.queries("q159_cdc_apply")(spark, sfDir)
    .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
  private lazy val docs = Tables.documents(spark, sfDir)
    .select(col("doc_id"), sha2(col("text"), 256).as("sha"),
      sha2(concat(col("text"), lit(" [cdc1]")), 256).as("sha1"),
      sha2(concat(col("text"), lit(" [cdc2]")), 256).as("sha2"),
      sha2(concat(col("text"), lit(" [new]")), 256).as("shaNew"))
    .collect().map(r => r.getLong(0) ->
      ((r.getString(1), r.getString(2), r.getString(3), r.getString(4)))).toMap
  private lazy val maxKey = docs.keys.max

  test("deletes win over every update; deleted keys vanish") {
    val deleted = docs.keys.filter(_ % 11 == 0)
    assert(deleted.nonEmpty)
    deleted.foreach(k => assert(!out.contains(k), s"deleted key $k survived"))
  }

  test("LWW picks seq 2 over seq 1 when both fire; op counts exact") {
    val both = docs.keys.filter(k => k % 5 == 0 && k % 7 == 0 && k % 11 != 0)
    assert(both.nonEmpty, "need a key hit by cdc1 AND cdc2")
    both.foreach { k =>
      val (sha, nOps) = out(k)
      assert(sha == docs(k)._3, s"key $k: seq-1 text won over seq-2")
      assert(nOps == 2L, s"key $k: expected 2 ops, got $nOps")
    }
    val only1 = docs.keys.filter(k => k % 5 == 0 && k % 7 != 0 && k % 11 != 0)
    only1.foreach { k =>
      assert(out(k)._1 == docs(k)._2, s"key $k: cdc1 update lost")
    }
  }

  test("inserts land above the live key space; untouched rows byte-identical") {
    val inserted = docs.keys.filter(_ % 13 == 0)
    assert(inserted.nonEmpty)
    inserted.foreach { k =>
      val (sha, nOps) = out(k + maxKey + 1)
      assert(sha == docs(k)._4 && nOps == 1L, s"insert for $k wrong")
    }
    val untouched = docs.keys.filter(k => k % 5 != 0 && k % 7 != 0 && k % 11 != 0)
    assert(untouched.nonEmpty)
    untouched.foreach { k =>
      val (sha, nOps) = out(k)
      assert(sha == docs(k)._1 && nOps == 0L, s"untouched $k modified")
    }
  }
}
