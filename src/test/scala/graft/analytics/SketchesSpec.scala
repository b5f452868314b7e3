package graft.analytics

import graft.SparkSuite

class SketchesSpec extends SparkSuite {

  private val base = Seq.tabulate(60)(i => s"tok$i").mkString(" ")
  private val nearDup = Seq.tabulate(54)(i => s"tok$i").mkString(" ") // 90% prefix
  private val unrelated = Seq.tabulate(60)(i => s"other$i").mkString(" ")

  test("jaccard: identity, symmetry, disjoint") {
    assert(Sketches.jaccard(base, base) === 1.0)
    assert(Sketches.jaccard(base, nearDup) === Sketches.jaccard(nearDup, base))
    assert(Sketches.jaccard(base, unrelated) === 0.0)
    assert(Sketches.jaccard(base, nearDup) > 0.8)
  }

  test("minhash is deterministic and signature approximates jaccard") {
    val s1 = Sketches.minhash(base, 128)
    assert(s1.toSeq === Sketches.minhash(base, 128).toSeq)
    val s2 = Sketches.minhash(nearDup, 128)
    val agree = s1.zip(s2).count { case (a, b) => a == b } / 128.0
    val trueJ = Sketches.jaccard(base, nearDup)
    assert(math.abs(agree - trueJ) < 0.15, s"minhash est $agree vs true $trueJ")
  }

  test("minhash bands: near-dups collide on at least one band, unrelated don't") {
    val b1 = Sketches.minhashBands(base)
    val b2 = Sketches.minhashBands(nearDup)
    val b3 = Sketches.minhashBands(unrelated)
    assert(b1.zip(b2).exists { case (x, y) => x == y })
    assert(!b1.zip(b3).exists { case (x, y) => x == y })
  }

  test("simhash: near-dups have small hamming distance, unrelated large") {
    val h1 = Sketches.simhash64(base)
    val h2 = Sketches.simhash64(nearDup)
    val h3 = Sketches.simhash64(unrelated)
    assert(Sketches.hamming64(h1, h1) === 0)
    assert(Sketches.hamming64(h1, h2) < 16)
    assert(Sketches.hamming64(h1, h3) > 16)
  }

  test("simhash: the codegen bit_count(xor) column equals hamming64 exactly") {
    import org.apache.spark.sql.functions.{bit_count, col}
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val pairs = Seq.fill(200)((rnd.nextLong(), rnd.nextLong())) :+
      ((Long.MinValue, Long.MaxValue)) :+ ((0L, -1L))
    val got = pairs.toDF("a", "b")
      .withColumn("h", bit_count(col("a").bitwiseXOR(col("b"))).cast("int"))
      .orderBy("a", "b").collect().map(_.getInt(2))
    val want = pairs.sortBy(p => (p._1, p._2)).map { case (a, b) => Sketches.hamming64(a, b) }
    assert(got.toSeq === want)
  }

  test("srp: identical vectors share all bands; perturbed vectors usually collide") {
    val rnd = new scala.util.Random(7)
    var hits = 0
    val trials = 50
    for (_ <- 1 to trials) {
      val v = Array.fill(64)(rnd.nextGaussian())
      val p = v.map(_ + rnd.nextGaussian() * 0.05) // cosine ≈ 0.999
      assert(Sketches.srpBands(v).toSeq === Sketches.srpBands(v).toSeq)
      val shared = Sketches.srpBands(v).zip(Sketches.srpBands(p)).exists { case (a, b) => a == b }
      if (shared) hits += 1
    }
    assert(hits >= trials * 7 / 10, s"only $hits/$trials perturbed vectors collided")
  }

  test("shingles: short text degenerates to whole-text shingle") {
    assert(Sketches.shingles("a b").toSeq === Seq("a b"))
    assert(Sketches.shingles("").isEmpty)
  }

  test("dhash63: exactly invariant under pixel scale+shift; dither flips few bits") {
    val rnd = new scala.util.Random(11)
    for (_ <- 1 to 20) {
      val px = Array.fill(64 + rnd.nextInt(2000))(rnd.nextInt(120))
      val fp = Sketches.dhash63(px)
      // contrast x2 + brightness +2: the cross-multiplied mean comparison
      // scales both sides identically — the fingerprint is bit-identical
      assert(Sketches.dhash63(px.map(v => 2 * v + 2)) === fp)
      // the alternating dither only breaks near-ties: hamming stays small
      val dithered = Array.tabulate(px.length)(i => 2 * px(i) + 2 + i % 2)
      assert(Sketches.hamming64(Sketches.dhash63(dithered), fp) <= 6)
      // an unrelated stream lands far away (random bits: expect ~31)
      val other = Array.fill(px.length)(rnd.nextInt(120))
      assert(Sketches.hamming64(Sketches.dhash63(other), fp) > 10)
    }
    // positivity (63 bits) and the minimum-length contract
    assert(Sketches.dhash63(Array.tabulate(64)(i => i)) >= 0L)
    assertThrows[IllegalArgumentException](Sketches.dhash63(Array.fill(63)(1)))
  }
}
