package graft.embed

import org.scalatest.funsuite.AnyFunSuite

class HashEmbedderSpec extends AnyFunSuite {

  test("deterministic across calls") {
    val a = HashEmbedder.embed("spark merge join speed", 64)
    val b = HashEmbedder.embed("spark merge join speed", 64)
    assert(a.toSeq === b.toSeq)
  }

  test("unit norm for non-empty text") {
    val v = HashEmbedder.embed("the quick brown fox", 64)
    val norm = math.sqrt(v.map(x => x * x).sum)
    assert(math.abs(norm - 1.0) < 1e-12)
  }

  test("empty and null text give zero vector") {
    assert(HashEmbedder.embed("", 16).forall(_ == 0.0))
    assert(HashEmbedder.embed(null, 16).forall(_ == 0.0))
  }

  test("different texts give different vectors") {
    val a = HashEmbedder.embed("alpha beta gamma", 64)
    val b = HashEmbedder.embed("delta epsilon zeta", 64)
    assert(a.toSeq !== b.toSeq)
  }

  test("token order does not matter (bag-of-words), repetition does") {
    val a = HashEmbedder.embed("one two three", 64)
    val b = HashEmbedder.embed("three two one", 64)
    val c = HashEmbedder.embed("one one two three", 64)
    assert(a.toSeq === b.toSeq)
    assert(a.toSeq !== c.toSeq)
  }

  test("dimension is respected") {
    assert(HashEmbedder.embed("x y z", 32).length === 32)
    assert(HashEmbedder.embed("x y z", 128).length === 128)
  }
}
