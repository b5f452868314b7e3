package graft.text

import graft.{SparkEntry, SparkSuite}

/** q150's contract: the confusion matrix is consistent with q42's
  * accuracy report (diagonal = n_correct, row sums = class sizes) and
  * the basis-point shares are floor-exact. */
class LangIdConfusionSpec extends SparkSuite {

  test("matrix marginals reconcile with q42's per-class accuracy") {
    val m = SparkEntry.queries("q150_langid_confusion")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val acc = SparkEntry.queries("q42_lang_id")(spark, sfDir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    m.groupBy(_._1).foreach { case (lang, rows) =>
      val (nDocs, nCorrect) = acc(lang)
      assert(rows.map(_._3).sum == nDocs, s"$lang row sum vs q42 n_docs")
      val diag = rows.filter(r => r._2 == lang).map(_._3).sum
      assert(diag == nCorrect, s"$lang diagonal $diag vs q42 n_correct $nCorrect")
      val bp = rows.map(_._4).sum
      assert(bp > 10000 - rows.length && bp <= 10000, s"$lang shares: $bp bp")
      rows.foreach { case (_, _, n, rowBp) =>
        assert(rowBp == n * 10000 / nDocs, "floor-division share")
      }
    }
  }
}
