package graft.text

import org.scalatest.funsuite.AnyFunSuite

/** FIXTURES.md §B chunker cases: reference config 1000/200 with separators
  * ["\n\n","\n"," ",""] (app.py:181-187). */
class ChunkerSpec extends AnyFunSuite {

  test("empty string yields no chunks") {
    assert(Chunker.chunk("") === Vector.empty)
  }

  test("text shorter than chunk_size is a single unchanged chunk") {
    val t = "hello world this is short"
    assert(Chunker.chunk(t) === Vector(t))
  }

  test("exactly chunk_size chars is one chunk") {
    val t = Seq.fill(200)("abcd").mkString(" ").take(1000)
    assert(Chunker.chunk(t).size === 1)
  }

  test("separator-free text falls through to char split with overlap") {
    val t = "x" * 1001
    val cs = Chunker.chunk(t)
    assert(cs.size === 2)
    assert(cs.head.length === 1000)
    // consecutive chunks share the trailing overlap region
    assert(cs(0).takeRight(200) === cs(1).take(200))
  }

  test("paragraph separator takes precedence over spaces") {
    val para1 = "alpha " * 100 // 600 chars
    val para2 = "beta " * 100  // 500 chars
    val t = para1.trim + "\n\n" + para2.trim
    val cs = Chunker.chunk(t)
    // 600 + 500 > 1000 ⇒ split at the paragraph boundary, not mid-word
    assert(cs.size === 2)
    assert(cs(0).startsWith("alpha"))
    assert(cs(1).startsWith("beta"))
  }

  test("word-separated text chunks at word boundaries, chunks within size") {
    val t = Seq.tabulate(500)(i => s"tok$i").mkString(" ")
    val cs = Chunker.chunk(t, chunkSize = 200, overlap = 40)
    assert(cs.nonEmpty)
    assert(cs.forall(_.length <= 200))
    // no token is cut in half: every chunk is a substring of the original
    assert(cs.forall(t.contains(_)))
  }

  test("all input content is covered (no gaps) for word splits") {
    val t = Seq.tabulate(100)(i => s"w$i").mkString(" ")
    val cs = Chunker.chunk(t, chunkSize = 50, overlap = 10)
    // every word appears in some chunk
    val joined = cs.mkString(" ")
    assert((0 until 100).forall(i => joined.contains(s"w$i")))
  }

  test("property: chunks never exceed chunkSize when tokens fit (seeded fuzz)") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 200) {
      val size = 40 + rnd.nextInt(160)
      val toks = Vector.fill(rnd.nextInt(80))(
        rnd.alphanumeric.take(1 + rnd.nextInt(20)).mkString)
      val t = toks.mkString(" ")
      val cs = Chunker.chunk(t, chunkSize = size, overlap = size / 4)
      assert(cs.forall(_.length <= size), s"size=$size text=${t.take(80)}")
    }
  }
}
