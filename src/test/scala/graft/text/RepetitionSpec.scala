package graft.text

import org.scalatest.funsuite.AnyFunSuite

/** Gopher repetition signals: hand-computed fractions, span-union
  * semantics (overlaps counted once), and the pinned top tie-break. */
class RepetitionSpec extends AnyFunSuite {

  test("top n-gram char fraction: hand-computed") {
    // "a b a b c" (len 9): top 2-gram "a b" occurs twice (i=0, i=2),
    // len 3 -> 2*3/9
    val s = Repetition.signals("a b a b c")
    assert(s.top(0) === 2 * 3 / 9.0)
    // top 3-gram: all three 3-grams occur once; tie-break is
    // (count, char-len desc, lexicographic asc): "a b a"/"b a b"/"a b c"
    // all len 5 -> smallest string "a b a", frac 5/9
    assert(s.top(1) === 5 / 9.0)
  }

  test("dup n-gram char fraction: union counts overlapping spans once") {
    // "x y z w v x y z w v x y z w v" — the 5-gram "x y z w v" occurs 3
    // times at words 0, 5, 10, spans [0,9),[10,19),[20,29) of a 29-char
    // text; additionally "y z w v x" etc. occur twice each, overlapping.
    // Union of ALL duplicated 5-gram spans covers the whole text.
    val text = Seq.fill(3)("x y z w v").mkString(" ")
    val s = Repetition.signals(text)
    assert(s.dup(0) === 1.0)
    // and a no-repetition text has zero everywhere
    val clean = Repetition.signals("one two three four five six seven eight nine ten")
    assert(clean.dup.forall(_ == 0.0))
    assert(clean.top.forall(_ > 0.0)) // top-gram exists even without repeats
  }

  test("short docs: n-grams longer than the doc yield 0") {
    val s = Repetition.signals("only three words")
    assert(s.top(0) > 0.0) // 2-grams exist
    assert(s.top(2) === 0.0) // no 4-gram
    assert(s.dup.forall(_ == 0.0))
  }

  test("keep thresholds: a pathological repeat fails, prose passes") {
    val bad = Repetition.signals(Seq.fill(20)("buy now").mkString(" "))
    assert(bad.top(0) > 0.20)
    // prose needs LENGTH for the thresholds to be meaningful (Gopher's
    // fractions assume real documents): ~100 distinct words
    val ok = Repetition.signals((1 to 100).map(i => s"word$i").mkString(" "))
    assert(ok.top(0) <= 0.20 && ok.dup.forall(_ <= 0.10))
  }
}
