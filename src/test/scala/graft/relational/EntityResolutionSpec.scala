package graft.relational

import graft.{SparkEntry, SparkSuite}
import graft.core.Tables
import org.apache.spark.sql.functions._

/** q141's contract: deletion-neighborhood blocking has structural recall
  * (every single-deletion variant merges with its base), verification has
  * precision (no cluster mixes two distinct source customers), and the
  * output is the exact star decomposition of the dirty record set. */
class EntityResolutionSpec extends SparkSuite {

  private lazy val clusters = SparkEntry.queries("q141_entity_resolution")(spark, sfDir)
    .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

  test("recall: every derived variant resolves into its base's cluster") {
    val expectedBases = Tables.customer(spark, sfDir)
      .filter(col("c_custkey") % 7 === 0)
      .select(col("c_custkey")).collect().map(_.getLong(0)).toSet
    assert(clusters.nonEmpty)
    assert(clusters.map(_._1).toSet == expectedBases,
      "each every-7th customer must anchor exactly one merged entity")
    clusters.foreach { case (canon, size, nvar) =>
      assert(size == 2 && nvar == 1,
        s"cluster $canon: expected (base, variant) star, got size=$size variants=$nvar")
    }
  }

  test("precision: canonical ids are base records, never variants") {
    // variants are re-keyed above the table's max key (q141's
    // collision-proof synthetic-id derivation)
    val maxKey = Tables.customer(spark, sfDir)
      .agg(max(col("c_custkey")).cast("long")).head().getLong(0)
    clusters.foreach { case (canon, _, _) =>
      assert(canon <= maxKey, s"canonical $canon is a variant id")
      assert(canon % 7 == 0, s"canonical $canon has no derived variant")
    }
  }

  test("blocking recall is structural: a deletion variant shares a key with its base") {
    // pure property of the key scheme, independent of the corpus: for any
    // name, dropping char p yields a string that IS one of the base's keys
    val name = "Customer#000012345"
    val keys = (0 until name.length).map(p => name.substring(0, p) + name.substring(p + 1)).toSet + name
    (0 until name.length).foreach { p =>
      val variant = name.substring(0, p) + name.substring(p + 1)
      assert(keys.contains(variant), s"variant dropping $p not in base's deletion neighborhood")
    }
  }
}
