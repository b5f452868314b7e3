package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.queries.CurationQueries

class CurationQueriesSpec extends SparkSuite {

  test("decontaminate: every planted leak (truncated eval doc) is flagged") {
    val flagged = CurationQueries.decontaminate(spark, sfDir)
      .filter(col("doc_id") >= 2000000L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // planted leaks are eval docs (id % 19 == 0) truncated to 90% of their
    // tokens — any eval doc long enough to retain an 8-gram must be caught
    val expected = graft.core.Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 19 === 0)
      .withColumn("n", expr("size(filter(split(text, ' '), x -> x != ''))"))
      // 90% of the tokens must still contain at least one 8-token window
      .filter(expr("CAST(floor(n * 0.9) AS INT) >= 8"))
      .select((col("doc_id") + 2000000L).as("doc_id"))
      .collect().map(_.getLong(0)).toSet
    assert(expected.nonEmpty, "fixture should produce at least one plant")
    assert(expected.subsetOf(flagged),
      s"missed plants: ${(expected -- flagged).take(5)}")
  }

  test("q70b bloom-prefiltered decontamination ≡ exact q70, with might_contain in the plan") {
    val exact = CurationQueries.decontaminate(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val bloomed = CurationQueries.decontaminateBloom(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(exact.nonEmpty)
    // no false negatives (bloom guarantee) AND no false positives (the
    // exact phase-2 join) ⇒ identical result sets, counts included
    assert(bloomed === exact)
    // the prefilter must actually be in the executed plan — otherwise
    // this is just q70 with extra steps
    val plan = CurationQueries.decontaminateBloom(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), "bloom prefilter missing from plan")
  }

  test("synthetic-id offsets stay clear of genuine doc_ids at every local SF") {
    // q70 plants leaks at doc_id + 2,000,000 and corpusMutant copies at
    // + 1,000,000; a corpus whose real ids reach either offset would
    // silently merge a real doc's rows with a synthetic one's. Guard the
    // invariant on every fixture dir present on this box (incl. scale
    // rungs), with 10× headroom below the smaller offset.
    val dirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
      "/root/testdata/sf0.1", "/tmp/sf1", "/tmp/sfdocs16")
      .filter(d => new java.io.File(s"$d/documents.parquet").exists())
    // maxId < 1,000,000 keeps genuine ids off the mutant range AND keeps
    // mutant ids (maxId + 1,000,000) below the 2,000,000 plant range
    dirs.foreach { d =>
      val maxId = graft.core.Tables.documents(spark, d)
        .agg(max(col("doc_id"))).collect()(0).getLong(0)
      assert(maxId < 1000000L,
        s"$d: max(doc_id)=$maxId collides with the 1,000,000 mutant offset")
    }
  }

  test("q02b oracle preconditions hold on every local fixture rung") {
    // The recursive chunker's closed-form oracle (RagQueries.
    // chunkRecursiveOracle) is valid ONLY on single-space corpora whose
    // words are shorter than chunkSize − overlap (200 − 40): no newlines
    // (the "\n\n"/"\n" separators would fire first), no double/edge
    // spaces (split would emit empty words), and no word ≥ 160 chars
    // (the popped window plus a long word could re-overflow, which the
    // closed form does not model). A regenerated corpus violating any of
    // these must fail HERE with a named cause, not as a mysterious q02b
    // hash mismatch in the driver gate.
    val dirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
      "/root/testdata/sf0.1", "/tmp/sf1", "/tmp/sfdocs16")
      .filter(d => new java.io.File(s"$d/documents.parquet").exists())
    dirs.foreach { d =>
      val bad = graft.core.Tables.documents(spark, d)
        .agg(
          sum(when(col("text").contains("\n"), 1).otherwise(0)).as("newlines"),
          sum(when(col("text").contains("  "), 1).otherwise(0)).as("dbl"),
          sum(when(col("text").startsWith(" ") || col("text").endsWith(" "), 1)
            .otherwise(0)).as("edge"),
          max(expr("array_max(transform(filter(split(text, ' '), x -> x != ''), x -> length(x)))"))
            .as("max_word"))
        .collect()(0)
      assert(bad.getLong(0) == 0L, s"$d: ${bad.getLong(0)} docs contain newlines")
      assert(bad.getLong(1) == 0L, s"$d: ${bad.getLong(1)} docs contain double spaces")
      assert(bad.getLong(2) == 0L, s"$d: ${bad.getLong(2)} docs have edge spaces")
      assert(bad.getInt(3) < 160, s"$d: max word length ${bad.getInt(3)} >= 160")
    }
    // q60's bytes-as-samples oracle additionally requires that no doc's
    // text starts with a RIFF magic — such a doc would be dispatched into
    // the real WAV codec and break the oracle as a mystery hash mismatch
    dirs.foreach { d =>
      val riff = graft.core.Tables.documents(spark, d)
        .filter(col("text").startsWith("RIFF")).count()
      assert(riff == 0L, s"$d: $riff docs begin with RIFF magic (q60 oracle precondition)")
    }
  }

  test("decontaminate: clean training docs share no 8-gram with eval") {
    val out = CurationQueries.decontaminate(spark, sfDir)
    // output only lists docs with >= 1 shared shingle
    assert(out.filter(col("n_shared_ngrams") <= 0).count() === 0L)
  }

  test("pii redact: injected counts match the injection rule; zero residual") {
    val out = CurationQueries.piiRedact(spark, sfDir).cache()
    assert(out.filter(col("residual_pii") =!= 0).count() === 0L)
    assert(out.filter(col("doc_id") % 4 === 0).filter(col("n_emails") =!= 1).count() === 0L)
    assert(out.filter(col("doc_id") % 4 === 1).filter(col("n_phones") =!= 1).count() === 0L)
    assert(out.filter(col("doc_id") % 4 === 2).filter(col("n_ips") =!= 1).count() === 0L)
    // untouched docs: no PII found at all
    assert(out.filter(col("doc_id") % 4 === 3)
      .filter(col("n_emails") + col("n_phones") + col("n_ips") =!= 0).count() === 0L)
    out.unpersist()
  }

  test("domain mix: every source fills its quota exactly and n_kept <= n_avail") {
    val out = CurationQueries.domainMix(spark, sfDir).cache()
    assert(out.count() > 0)
    assert(out.filter(col("n_kept") =!= col("quota")).count() === 0L,
      "quota must be achievable by construction of T")
    assert(out.filter(col("n_kept") > col("n_avail")).count() === 0L)
    out.unpersist()
  }

  test("q78: shuffle is a permutation — dense per-shard positions, all docs, reproducible") {
    val out = CurationQueries.globalShuffle(spark, sfDir).cache()
    val n = graft.core.Tables.documents(spark, sfDir).count()
    assert(out.count() === n, "shuffle dropped or duplicated docs")
    assert(out.select(col("doc_id")).distinct().count() === n)
    // positions are dense 0..|shard|-1 within every shard
    val bad = out.groupBy(col("shard"))
      .agg(count(lit(1)).as("cnt"), max(col("pos")).as("mx"),
        countDistinct(col("pos")).as("dp"))
      .filter(col("mx") =!= col("cnt") - 1 || col("dp") =!= col("cnt"))
      .count()
    assert(bad === 0L, "per-shard positions are not dense ranks")
    // content-hash ordering: a second run is bit-identical
    assert(out.collect().toSeq ===
      CurationQueries.globalShuffle(spark, sfDir).collect().toSeq)
    out.unpersist()
  }

  test("domain mix: selection is reproducible across runs") {
    val a = CurationQueries.domainMix(spark, sfDir).collect().toSeq
    val b = CurationQueries.domainMix(spark, sfDir).collect().toSeq
    assert(a === b)
  }
}
