package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** End-to-end parity of the rows-only LSH near-dup queries against
  * brute-force references computed driver-side on the real sf0.001 corpus.
  * These pin the first-colliding-band rewrite (no distinct) to the exact
  * semantics "unique pairs sharing >= 1 band, passing verification" — any
  * duplicate or dropped pair fails the set comparison. */
class LshExactnessSpec extends SparkSuite {

  // replicate PipelineQueries.corpusMutant: docs + 90%-prefix mutants
  private lazy val corpus: Seq[(Long, String)] = {
    val docs = graft.core.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"), col("n_chars"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2).toInt))
    docs.map { case (id, t, _) => (id, t) } ++
      docs.map { case (id, t, n) => (id + 1000000L, t.substring(0, n * 9 / 10)) }
  }

  test("q33 simhash pairs == brute-force band-collision + hamming reference") {
    val fp = corpus.map { case (id, t) => (id, Sketches.simhash64(t)) }
    val expected = (for {
      (i1, h1) <- fp; (i2, h2) <- fp
      if i1 < i2
      if Sketches.simhashBandsOf(h1).intersect(Sketches.simhashBandsOf(h2)).nonEmpty
      if Sketches.hamming64(h1, h2) <= 16
    } yield (i1, i2, Sketches.hamming64(h1, h2))).toSet

    val got = graft.queries.PipelineQueries.all("q33_neardup_simhash")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got === expected)
  }

  test("q32 minhash pairs == brute-force band-collision + jaccard reference") {
    // replicate shingleExpr: distinct token 3-grams (whole text if < 3 tokens)
    def shingles(t: String): Set[String] = {
      val toks = t.split(' ').filter(_.nonEmpty)
      if (toks.length < 3) Set(toks.mkString(" "))
      else toks.sliding(3).map(_.mkString(" ")).toSet
    }
    val sk = corpus.map { case (id, t) =>
      val sh = shingles(t)
      (id, sh, Sketches.minhashBandsOf(sh.toSeq))
    }
    def jac(a: Set[String], b: Set[String]): Double = {
      val inter = (a & b).size
      BigDecimal(inter.toDouble / (a.size + b.size - inter))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val expected = (for {
      (i1, s1, b1) <- sk; (i2, s2, b2) <- sk
      if i1 < i2
      if b1.intersect(b2).nonEmpty
      if jac(s1, s2) >= 0.3
    } yield (i1, i2)).toSet

    val got = graft.queries.PipelineQueries.all("q32_neardup_minhash")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === expected)
  }

  test("q32b portable minhash: subset of exact pairs, recall ≥ 0.9") {
    // q32b verifies every candidate with the SAME exact-Jaccard threshold
    // as q31, so precision is 1 by construction (⊆); the 4×4 banding's
    // only freedom is missed candidates — pin the recall floor
    val exact = graft.queries.PipelineQueries.all("q31_neardup_jaccard")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = graft.queries.PipelineQueries.all("q32b_neardup_minhash_md5")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((got -- exact).isEmpty,
      s"q32b emitted pairs exact Jaccard rejects: ${(got -- exact).take(5)}")
    assert(exact.nonEmpty)
    val recall = got.size.toDouble / exact.size
    assert(recall >= 0.9, f"q32b recall $recall%.3f below floor (${got.size}/${exact.size})")
  }
}
