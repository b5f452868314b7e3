package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** BPE trainer: the distributed merge list must equal an independent
  * single-node reference implementation merge-by-merge (argmax choice,
  * tie-breaks, support counts), at any partitioning. */
class BpeSpec extends SparkSuite {

  // Sennrich et al.'s worked example family: repeated subwords with
  // clear frequency structure plus ties that exercise the lexicographic
  // tie-break.
  private val corpus: Seq[(String, Long)] = Seq(
    "low" -> 5L, "lower" -> 2L, "lowest" -> 6L,
    "newest" -> 3L, "widest" -> 3L, "new" -> 2L, "wide" -> 1L)

  test("distributed merges equal the single-node reference, merge by merge") {
    import spark.implicits._
    val wordsDf = corpus.toDF("word", "freq")
    // localThreshold = 0 forces the DISTRIBUTED path — the adaptive
    // small-vocab shortcut must never be what this test exercises
    val got = Bpe.train(spark, wordsDf, numMerges = 12, localThreshold = 0L)
      .orderBy("rank")
      .as[(Int, String, String, String, Long)].collect().toSeq
    val want = Bpe.trainLocal(corpus, numMerges = 12).zipWithIndex.map {
      case ((l, r, n), i) => (i + 1, l, r, l + r, n)
    }
    assert(got === want)
    // the worked-example structure is actually learned: "est" and "low"
    // emerge as units within the first merges
    val merged = got.map(_._4)
    assert(merged.contains("est") || merged.contains("st") && merged.contains("es"))
  }

  test("merge list is invariant to input partitioning") {
    import spark.implicits._
    val one = Bpe.train(spark, corpus.toDF("word", "freq").repartition(1), 8, localThreshold = 0L)
      .orderBy("rank").as[(Int, String, String, String, Long)].collect().toSeq
    val many = Bpe.train(spark, corpus.toDF("word", "freq").repartition(7), 8, localThreshold = 0L)
      .orderBy("rank").as[(Int, String, String, String, Long)].collect().toSeq
    assert(one === many)
  }

  test("adaptive small-vocab path equals the distributed path exactly") {
    import spark.implicits._
    val df = corpus.toDF("word", "freq")
    val local = Bpe.train(spark, df, 10) // corpus size << threshold → local
      .orderBy("rank").as[(Int, String, String, String, Long)].collect().toSeq
    val dist = Bpe.train(spark, df, 10, localThreshold = 0L)
      .orderBy("rank").as[(Int, String, String, String, Long)].collect().toSeq
    assert(local === dist)
  }

  test("encode with learned merges: greedy left-to-right, non-overlapping") {
    assert(Bpe.applyMerges("aaa", Seq(("a", "a"))) === Vector("aa", "a"))
    assert(Bpe.applyMerges("aaaa", Seq(("a", "a"), ("aa", "aa"))) === Vector("aaaa"))
    assert(Bpe.applyMerges("lowest", Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")))
      === Vector("low", "est"))
    assert(Bpe.applyMerges("x", Seq(("a", "b"))) === Vector("x"))
    assert(Bpe.applyMerges("", Nil) === Vector.empty)
  }

  test("batched distributed merges equal the reference on adversarial corpora") {
    import spark.implicits._
    // self-pair runs: merging (a,a) creates (aa,a)/(aa,aa) pairs whose
    // counts rival everything else — the case where naive batching
    // diverges from sequential training (acceptBatch rule 4)
    val runs = Seq("aaaaaaaa" -> 9L, "aaab" -> 7L, "bbbb" -> 6L, "abab" -> 5L)
    // dense tie structure: every count equal — the boundary-strictness
    // shrink (rule 3) must collapse each batch to the plain argmax
    val ties = Seq("ab" -> 3L, "cd" -> 3L, "ef" -> 3L, "gh" -> 3L, "ij" -> 3L)
    // chained symbols: rank-adjacent pairs share letters (rule 2)
    val chain = Seq("the" -> 10L, "then" -> 8L, "hen" -> 6L, "ten" -> 4L)
    for ((corpus, n) <- Seq((runs, 12), (ties, 6), (chain, 10))) {
      val got = Bpe.train(spark, corpus.toDF("word", "freq"), n, localThreshold = 0L)
        .orderBy("rank").as[(Int, String, String, String, Long)].collect().toSeq
      val want = Bpe.trainLocal(corpus, n).zipWithIndex.map {
        case ((l, r, s), i) => (i + 1, l, r, l + r, s)
      }
      assert(got === want, s"corpus=${corpus.take(2)}…")
    }
  }

  test("batched distributed merges equal the reference on random corpora") {
    import spark.implicits._
    val rng = new scala.util.Random(20260813L)
    for (trial <- 0 until 3) {
      val corpus = (0 until 60).map { _ =>
        val len = 1 + rng.nextInt(8)
        val w = (0 until len).map(_ => ('a' + rng.nextInt(4)).toChar).mkString
        w -> (1L + rng.nextInt(20))
      }.groupBy(_._1).map { case (w, xs) => w -> xs.map(_._2).sum }.toSeq
      val got = Bpe.train(spark, corpus.toDF("word", "freq"), 15, localThreshold = 0L)
        .orderBy("rank").as[(Int, String, String, String, Long)].collect().toSeq
      val want = Bpe.trainLocal(corpus, 15).zipWithIndex.map {
        case ((l, r, s), i) => (i + 1, l, r, l + r, s)
      }
      assert(got === want, s"trial=$trial")
    }
  }

  test("acceptBatch: prefix, disjointness, boundary strictness, self-pair close") {
    // disjoint, strictly descending: all accepted
    assert(Bpe.acceptBatch(Seq(("a", "b", 10L), ("c", "d", 8L), ("e", "f", 6L)), 16)
      .map(_._3) === Seq(10L, 8L, 6L))
    // interaction stops the prefix (no skipping over)
    assert(Bpe.acceptBatch(
      Seq(("a", "b", 10L), ("b", "c", 8L), ("e", "f", 6L)), 16).map(_._3) === Seq(10L))
    // the merged symbol also interacts: ("a","b") blocks ("ab","x")
    assert(Bpe.acceptBatch(
      Seq(("a", "b", 10L), ("ab", "x", 8L)), 16).map(_._3) === Seq(10L))
    // tie with the boundary candidate shrinks the batch to above it
    assert(Bpe.acceptBatch(
      Seq(("a", "b", 10L), ("c", "d", 8L), ("e", "f", 8L)), 2).map(_._3) === Seq(10L))
    // rank-1 is always accepted even when tied (plain argmax is exact)
    assert(Bpe.acceptBatch(
      Seq(("a", "b", 8L), ("c", "d", 8L)), 1).map(_._1) === Seq("a"))
    // a self-pair closes the batch after itself
    assert(Bpe.acceptBatch(
      Seq(("a", "a", 10L), ("c", "d", 8L)), 16).map(_._3) === Seq(10L))
    assert(Bpe.acceptBatch(
      Seq(("c", "d", 10L), ("a", "a", 8L), ("e", "f", 6L)), 16).map(_._3) === Seq(10L, 8L))
  }

  test("trainer stops early when no pairs remain") {
    import spark.implicits._
    val singles = Seq("a" -> 3L, "b" -> 2L).toDF("word", "freq")
    assert(Bpe.train(spark, singles, 10).count() === 0L)
  }

  test("q83b distributed corpus encode equals a driver-local re-encode") {
    // independent path: train locally on the same (filtered) word freqs,
    // then re-encode every doc on the driver word by word — the
    // distributed query's vocab-encode + join-back must reproduce it
    // exactly, doc for doc
    val docs = graft.core.Tables.documents(spark, sfDir)
      .selectExpr("doc_id", "filter(split(lower(text), ' '), x -> x != '') AS toks")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[String](1)))
    val freqs = docs.flatMap(_._2).filter(_.length <= 20)
      .groupBy(identity).map { case (w, ws) => (w, ws.length.toLong) }.toSeq
    val merges = Bpe.trainLocal(freqs, numMerges = 40).map { case (l, r, _) => (l, r) }
    val pieceLen = scala.collection.mutable.Map.empty[String, Long]
    val want = docs.filter(_._2.nonEmpty).map { case (id, toks) =>
      val nt = toks.map(w =>
        pieceLen.getOrElseUpdate(w, Bpe.applyMerges(w, merges).length.toLong)).sum
      (id, toks.length.toLong, nt)
    }.sortBy(_._1).toSeq
    val got = graft.queries.TextQueries.bpeEncode(spark, sfDir)
      .select("doc_id", "n_words", "n_tokens").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === want)
  }

  test("q83 runs on the sf fixture and yields a full, ranked merge table") {
    val df = graft.queries.TextQueries.bpeTrain(spark, sfDir)
    val rows = df.collect()
    assert(rows.length === 40)
    assert(rows.map(_.getInt(0)).toSeq === (1 to 40))
    // supports are non-increasing is NOT guaranteed (merges create new
    // pairs), but every support is positive and every merged symbol is
    // the concatenation of its parts
    rows.foreach { r =>
      assert(r.getLong(4) > 0)
      assert(r.getString(3) === r.getString(1) + r.getString(2))
    }
  }
}
