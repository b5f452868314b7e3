package graft.text

/** Gopher repetition signals (Rae et al. 2021, "Scaling Language Models:
  * Methods, Analysis & Insights from Training Gopher", §A1.1 Table A1) —
  * the repetition-removal half of the Gopher filter the q95 quality
  * rules intentionally left out:
  *
  *  - top n-gram character fraction (n = 2, 3, 4): the fraction of the
  *    document's characters contained within the occurrences of its
  *    MOST FREQUENT word n-gram;
  *  - duplicate n-gram character fraction (n = 5..10): the fraction of
  *    characters covered by the UNION of the spans of every n-gram that
  *    occurs more than once (overlapping occurrences counted once).
  *
  * All signals are DOCUMENT-LOCAL — the operator is a single map pass
  * with no shuffle, which is what makes it viable on a 100 TB corpus.
  * Character coordinates come from the word-offset scan (cumulative
  * word length + 1 separator), the same coordinate system the DuckDB
  * oracle reconstructs, so the two engines agree bit-for-bit on the
  * single-space corpora the fixtures guarantee (preconditions pinned by
  * the corpus probes: no double/edge spaces, no newlines).
  *
  * Tie-break for the top n-gram (the paper leaves it unspecified, the
  * oracle must be deterministic): highest count, then longest in
  * characters, then lexicographically smallest.
  */
object Repetition {

  /** top(0..2) = top-{2,3,4}-gram char fraction; dup(0..5) =
    * dup-{5..10}-gram char fraction. */
  final case class Signals(top: Seq[Double], dup: Seq[Double])

  def signals(text: String): Signals =
    signalsOf(text.split(" ").filter(_.nonEmpty), text.length)

  /** Words-based entry for callers that already tokenized (avoids a
    * second split on the hot map path). `textLen` is the original
    * text's character count — the fractions' denominator. */
  def signalsOf(words: Array[String], textLen: Int): Signals = {
    val nw = words.length
    val totalChars = textLen.toDouble
    // word start offsets in the single-space coordinate system
    val starts = new Array[Int](nw)
    var off = 0
    var i = 0
    while (i < nw) { starts(i) = off; off += words(i).length + 1; i += 1 }
    def spanEnd(iWord: Int, n: Int): Int = starts(iWord + n - 1) + words(iWord + n - 1).length

    def gramsOf(n: Int): scala.collection.mutable.LinkedHashMap[String, List[Int]] = {
      // gram -> start-word indexes of every occurrence (insertion-ordered
      // for determinism; order never leaks into the output values)
      val m = scala.collection.mutable.LinkedHashMap[String, List[Int]]()
      var j = 0
      while (j + n <= nw) {
        val g = words.slice(j, j + n).mkString(" ")
        m.update(g, j :: m.getOrElse(g, Nil))
        j += 1
      }
      m
    }

    val top = (2 to 4).map { n =>
      if (nw < n || totalChars == 0) 0.0
      else {
        val byGram = gramsOf(n).map { case (g, occ) => (g, occ.size) }
        // (count desc, char length desc, gram asc)
        val (gram, cnt) = byGram.maxBy { case (g, c) => (c, g.length, ReverseString(g)) }(
          Ordering.Tuple3(Ordering.Int, Ordering.Int, ReverseString.ordering))
        cnt * gram.length / totalChars
      }
    }

    val dup = (5 to 10).map { n =>
      if (nw < n || totalChars == 0) 0.0
      else {
        val spans = gramsOf(n).iterator
          .filter(_._2.size >= 2)
          .flatMap { case (_, occ) => occ.map(j => (starts(j), spanEnd(j, n))) }
          .toArray.sortBy(identity)
        var covered = 0L
        var maxEnd = 0
        var k = 0
        while (k < spans.length) {
          val (s, e) = spans(k)
          if (e > maxEnd) {
            covered += e - math.max(s, maxEnd)
            maxEnd = e
          }
          k += 1
        }
        covered / totalChars
      }
    }
    Signals(top, dup)
  }

  /** Lexicographically-SMALLEST-wins inside a maxBy: wrap with reversed
    * ordering so maxBy's preference for the largest picks the smallest
    * string. */
  private final case class ReverseString(s: String)
  private object ReverseString {
    val ordering: Ordering[ReverseString] =
      Ordering.by[ReverseString, String](_.s).reverse
  }
}
