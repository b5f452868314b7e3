package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.queries.PipelineQueries

/** q132's contract: near-duplicate documents can never straddle a
  * train/val/test boundary — the leak q76's per-doc content split
  * admits by its own documentation ("a train/val leak needs a near-dup,
  * not a copy"). */
class LeakageSplitSpec extends SparkSuite {

  test("no near-dup pair straddles a split; q76 demonstrably leaks on the same corpus") {
    val split = PipelineQueries.leakageSafeSplit(spark, sfDir)
      .select(col("doc_id"), col("canonical_id"), col("split"))
      .cache()
    try {
      // the verified near-dup pairs (q112's rep-level pairs expanded to
      // members via the shared canonical): ANY two docs sharing a
      // canonical must share a split — including exact dups and the
      // planted 90%-truncation twins
      val bySplit = split.groupBy(col("canonical_id"))
        .agg(countDistinct(col("split")).as("n_splits"),
          count(lit(1)).as("members"))
      assert(bySplit.filter(col("n_splits") > 1).count() === 0,
        "a component straddles a split boundary")
      // non-vacuous: multi-member components exist (the corpus plants a
      // near-dup twin per doc), so the property actually binds
      assert(bySplit.filter(col("members") > 1).count() > 0,
        "no multi-member components — the leak property is vacuous here")
      // and the per-doc hash split (q76's rule applied to the same
      // mutant corpus) DOES put some component across two splits — the
      // exact leak this operator exists to close. Both sides use the
      // same md5 fingerprint family, so the only difference is
      // doc-content vs canonical-content keying.
      val perDoc = PipelineQueries.leakageSafeSplit(spark, sfDir)
        .select(col("doc_id"), col("canonical_id"))
        .join(
          // rebuild the mutant corpus' own-content buckets
          graft.queries.PipelineQueries.mutantCorpusForTests(spark, sfDir)
            // q76's md5-prefix fingerprint family, inlined (package-private
            // in CurationQueries): per-doc content bucket
            .withColumn("ownBucket", pmod(expr(
              "cast(conv(substring(md5(cast(text as binary)), 1, 15), 16, 10) as bigint)"),
              lit(100L)))
            .withColumn("ownSplit",
              when(col("ownBucket") < 80, "train")
                .when(col("ownBucket") < 90, "val")
                .otherwise("test"))
            .select(col("doc_id"), col("ownSplit")),
          Seq("doc_id"))
      val leaked = perDoc.groupBy(col("canonical_id"))
        .agg(countDistinct(col("ownSplit")).as("n_splits"))
        .filter(col("n_splits") > 1)
        .count()
      assert(leaked > 0,
        "per-doc hash split produced no straddling component on this " +
          "corpus — the comparison is vacuous")
    } finally { split.unpersist(): Unit }
  }
}
