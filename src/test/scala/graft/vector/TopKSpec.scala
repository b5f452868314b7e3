package graft.vector

import graft.SparkSuite

/** FIXTURES.md §B hand vectors: q=[1,0,0,0]; candidates with known cosines
  * and a duplicate-score pair pinning the id tie-break. */
class TopKSpec extends SparkSuite {

  test("top-k cosine golden values and tie-break by id") {
    import spark.implicits._
    val queries = Seq((0L, Seq(1.0f, 0.0f, 0.0f, 0.0f))).toDF("query_id", "qvec")
    val cands = Seq(
      (10L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),  // cos 1.0
      (11L, Seq(0.0f, 1.0f, 0.0f, 0.0f)),  // cos 0.0
      (12L, Seq(0.6f, 0.8f, 0.0f, 0.0f)),  // cos 0.6
      (13L, Seq(0.6f, -0.8f, 0.0f, 0.0f)), // cos 0.6 — tie with 12, loses on id
      (14L, Seq(2.0f, 0.0f, 0.0f, 0.0f))   // cos 1.0 — scale invariant, ties with 10
    ).toDF("vec_id", "cvec")

    val rows = TopK.topKCosine(queries, cands, k = 4)
      .orderBy("rank").collect()
      .map(r => (r.getLong(1), math.rint(r.getDouble(2) * 1e6) / 1e6, r.getInt(3)))

    assert(rows.toSeq === Seq(
      (10L, 1.0, 1), (14L, 1.0, 2), (12L, 0.6, 3), (13L, 0.6, 4)))
  }

  test("k larger than candidate count returns all, still ranked") {
    import spark.implicits._
    val queries = Seq((0L, Seq(1.0f, 0.0f))).toDF("query_id", "qvec")
    val cands = Seq((1L, Seq(1.0f, 0.0f)), (2L, Seq(0.0f, 1.0f))).toDF("vec_id", "cvec")
    val n = TopK.topKCosine(queries, cands, k = 10).count()
    assert(n === 2)
  }
}
