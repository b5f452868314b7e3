package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.queries.{CurationQueries, PipelineQueries}

/** Properties of the round-6 dedup-action operators: substring-span dedup
  * (q74), the keep/drop decision table (q75), and the deterministic
  * content-hash holdout split (q76). The driver gate proves bit-exactness
  * vs DuckDB; these specs pin the SEMANTIC invariants that would not fail
  * a hash compare if both engines drifted together.
  */
class DedupOpsSpec extends SparkSuite {

  test("q74: a mutant (90%-prefix copy) has nearly all spans duplicated") {
    // every 13-word span of a mutant also occurs in its original, except
    // the ONE span ending at the final (possibly char-truncated) word —
    // span i covers words i..i+12, so only i = n_words−12 touches the
    // last word — hence n_dup_spans ≥ n_spans − 1 for every mutant
    val out = PipelineQueries.substringDedup(spark, sfDir).cache()
    val mutants = out.filter(col("doc_id") >= 1000000L)
    assert(mutants.count() > 0L, "fixture should produce mutant rows")
    val violating = mutants
      .filter(col("n_dup_spans") < col("n_spans") - 1L).count()
    assert(violating === 0L,
      "a mutant doc had more unique spans than its truncated tail allows")
    // dup_frac is a ratio: 0 ≤ dup_frac ≤ 1 and consistent with the counts
    assert(out.filter(col("dup_frac") < 0.0 || col("dup_frac") > 1.0).count() === 0L)
    assert(out.filter(
      abs(col("dup_frac") - col("n_dup_spans") / col("n_spans").cast("double")) > 1e-6)
      .count() === 0L)
    out.unpersist()
  }

  test("q74: originals inherit their mutant's shared-prefix spans as dups") {
    // the shared 90% prefix is duplicated text from the ORIGINAL's point
    // of view too: any original whose mutant kept ≥ 14 words (≥ 2 spans —
    // a 13-word mutant's only span includes the char-truncated last word
    // and may match nothing) must report at least one duplicated span
    val out = PipelineQueries.substringDedup(spark, sfDir)
    val mutantSpanned = out.filter(col("doc_id") >= 1000000L && col("n_spans") >= 2L)
      .select((col("doc_id") - 1000000L).as("doc_id"))
    val missing = mutantSpanned
      .join(out.filter(col("n_dup_spans") >= 1L), Seq("doc_id"), "left_anti")
      .count()
    assert(missing === 0L,
      s"$missing originals with a ≥13-word mutant report zero duplicated spans")
  }

  test("q74b: island accounting closes and mutants are cut to the bone") {
    val out = PipelineQueries.substringRemove(spark, sfDir).cache()
    // the rebuilt text must account for every word: covered + kept = total
    assert(out.filter(col("dup_words") + col("keep_words") =!= col("n_words"))
      .count() === 0L, "interval union and rebuild disagree on coverage")
    // a mutant is a shared prefix: all spans except the last are
    // duplicated, so removal leaves at most the final word (docs with
    // < 14 words have ≤ 1 span and may keep everything)
    val survivors = out.filter(col("doc_id") >= 1000000L && col("n_words") >= 14L)
      .filter(col("keep_words") > 1L).count()
    assert(survivors === 0L, s"$survivors mutants kept more than the last word")
    // no-dup docs keep their exact text (digest matches a direct hash)
    val corpus = graft.core.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
    val cleanIds = out.filter(col("dup_words") === 0L).select(col("doc_id"), col("clean_fp"))
    val mismatched = cleanIds.join(corpus, Seq("doc_id"))
      .filter(col("clean_fp") !==
        sha2(concat_ws(" ", expr("filter(split(text, ' '), x -> x != '')")), 256))
      .count()
    assert(mismatched === 0L, "an untouched doc's rebuilt text differs from the original")
    out.unpersist()
  }

  test("q74b: empty/whitespace docs survive the rebuild (mutant of a 1-char doc)") {
    // a 1-char doc's mutant truncates to n_chars*9 DIV 10 = 0 chars → an
    // empty token array; the rebuild's sequence(0, size-1) would count
    // DOWN to [0,-1] unguarded and element_at(toks, 0) throws at runtime
    val dir = java.nio.file.Files.createTempDirectory("graft-shortdoc").toString
    import spark.implicits._
    Seq((1L, "x", "en", "src0", 1L),
        (2L, "alpha beta gamma delta", "en", "src0", 22L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = PipelineQueries.substringRemove(spark, dir).collect()
    assert(out.length === 4)
    val emptyMutant = out.find(_.getLong(0) === 1000001L).get
    assert(emptyMutant.getLong(1) === 0L, "empty mutant should have 0 words")
    assert(emptyMutant.getLong(3) === 0L, "empty mutant should keep 0 words")
  }

  test("q77: semantic dedup decisions are cell-closed and keep-lowest") {
    val out = PipelineQueries.semDedup(spark, sfDir).cache()
    // keep ⟺ no lower-id near-dup partner in the cell
    assert(out.filter(col("keep") =!= (col("n_dup_lower") === 0L)).count() === 0L)
    // the lowest vec_id of every cell has no lower partner → always kept
    val cellMins = out.groupBy(col("cell")).agg(min(col("vec_id")).as("vec_id"))
    val droppedMins = cellMins.join(out.filter(!col("keep")), Seq("vec_id")).count()
    assert(droppedMins === 0L, "a cell's lowest vec_id was dropped")
    // every vector gets exactly one decision row
    val n = graft.core.Tables.embeddings(spark, sfDir).count()
    assert(out.count() === n)
    out.unpersist()
  }

  test("q75: kept docs = distinct texts; every drop points at an identical kept doc") {
    val decision = PipelineQueries.dedupDecision(spark, sfDir).cache()
    val corpus = graft.core.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
    val corpusAll = corpus.unionByName(
      corpus.select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
    // keep-count equals the number of distinct texts (one canonical each)
    val kept = decision.filter(col("keep")).count()
    val distinctTexts = corpusAll.select(col("text")).distinct().count()
    assert(kept === distinctTexts)
    // canonical is minimal and self-kept
    assert(decision.filter(col("canonical_id") > col("doc_id")).count() === 0L)
    val canonNotKept = decision.select(col("canonical_id").as("doc_id")).distinct()
      .join(decision.filter(col("keep")), Seq("doc_id"), "left_anti").count()
    assert(canonNotKept === 0L, "a canonical_id refers to a dropped doc")
    // dropped docs are byte-identical to their canonical (exact-dup dedup
    // must never drop non-identical text)
    val texts = corpusAll
    val mismatched = decision.filter(!col("keep"))
      .join(texts, Seq("doc_id"))
      .join(texts.select(col("doc_id").as("canonical_id"), col("text").as("ctext")),
        Seq("canonical_id"))
      .filter(col("text") =!= col("ctext")).count()
    assert(mismatched === 0L, "a dropped doc differs from its canonical")
    decision.unpersist()
  }

  test("q76: split is a pure content function — deterministic, partitioning, 80/10/10") {
    val a = CurationQueries.trainSplit(spark, sfDir).collect()
    val b = CurationQueries.trainSplit(spark, sfDir).collect()
    assert(a.toSeq === b.toSeq, "split assignment is not deterministic")
    // buckets in range and the split label follows the bucket rule
    assert(a.forall { r =>
      val bucket = r.getLong(r.fieldIndex("bucket"))
      val split = r.getString(r.fieldIndex("split"))
      bucket >= 0 && bucket < 100 &&
        split == (if (bucket < 80) "train" else if (bucket < 90) "val" else "test")
    })
    // proportions near 80/10/10 (binomial tolerance at 500 docs)
    val n = a.length.toDouble
    val frac = a.groupBy(_.getString(2)).view.mapValues(_.length / n).toMap
    assert(math.abs(frac.getOrElse("train", 0.0) - 0.8) < 0.1, s"train frac: $frac")
    assert(frac.getOrElse("val", 0.0) < 0.2 && frac.getOrElse("test", 0.0) < 0.2)
  }

  test("q76: assignment is stable under corpus growth (content-keyed, not positional)") {
    // independently re-derive the assignment from raw md5 on an arbitrary
    // SUBSET of the corpus: a content-keyed split gives every surviving
    // doc the same label it had in the full corpus — the property that
    // rand()/row_number() splits lack (any growth reshuffles them). A
    // deliberate positional control (ntile over doc_id) drifts, proving
    // the test can fail.
    val full = CurationQueries.trainSplit(spark, sfDir)
      .select(col("doc_id"), col("split"))
    val rederived = graft.core.Tables.documents(spark, sfDir)
      .filter(col("doc_id") >= 100L) // the subset: drop a corpus prefix
      .withColumn("bucket",
        pmod(expr("cast(conv(substring(md5(cast(text as binary)), 1, 15), 16, 10) as bigint)"),
          lit(100L)))
      .withColumn("resplit",
        when(col("bucket") < 80, "train").when(col("bucket") < 90, "val")
          .otherwise("test"))
      .select(col("doc_id"), col("resplit"))
    val drifted = rederived.join(full, Seq("doc_id"))
      .filter(col("split") =!= col("resplit")).count()
    assert(drifted === 0L, "content-hash split reassigned a doc after corpus shrink")
    // positional control: an ntile-based split over the same subset MUST
    // disagree with its full-corpus version somewhere
    import org.apache.spark.sql.expressions.Window
    def ntileSplit(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("nt", ntile(10).over(Window.orderBy(col("doc_id"))))
        .withColumn("psplit", when(col("nt") <= 8, "train")
          .when(col("nt") === 9, "val").otherwise("test"))
        .select(col("doc_id"), col("psplit"))
    val docs = graft.core.Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    // dropping a PREFIX shifts every remaining doc's rank (an every-other
    // subset would scale ranks proportionally and tile identically)
    val posFull = ntileSplit(docs)
    val posHalf = ntileSplit(docs.filter(col("doc_id") >= 100L))
    val posDrift = posHalf.join(posFull.withColumnRenamed("psplit", "fullp"), Seq("doc_id"))
      .filter(col("psplit") =!= col("fullp")).count()
    assert(posDrift > 0L, "positional control failed to drift — test is vacuous")
  }
}
