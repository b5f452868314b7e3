package graft.embed

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

import scala.util.hashing.MurmurHash3

/** Deterministic feature-hash embedder — the zero-egress stand-in for the
  * reference's Cohere `embed-english-v3.0` call (`/root/reference/app.py:70,
  * 204-212`; SURVEY §2.8 "hash-embedder UDF").
  *
  * Seedless and stable: MurmurHash3 over token bytes decides the bucket and
  * the sign, the result is L2-normalized, so embed(text) is identical across
  * JVMs, executors, and rounds — required for oracle-free reproducibility.
  * Dimensionality is a parameter (the driver's index is 64-d; the reference
  * pinned 1024 — SURVEY D3 treats dim as data-driven).
  */
object HashEmbedder {

  def embed(text: String, dim: Int): Array[Double] = {
    val v = new Array[Double](dim)
    if (text != null) {
      var i = 0
      val tokens = text.split(" ")
      while (i < tokens.length) {
        val t = tokens(i)
        if (t.nonEmpty) {
          val h = MurmurHash3.stringHash(t, 42)
          val idx = math.floorMod(h, dim)
          val sign = if (((h >>> 31) & 1) == 0) 1.0 else -1.0
          v(idx) += sign
        }
        i += 1
      }
    }
    val norm = math.sqrt(v.map(x => x * x).sum)
    if (norm > 0) { var i = 0; while (i < dim) { v(i) /= norm; i += 1 } }
    v
  }

  /** Column form. A plain Scala UDF (not codegen) is acceptable here: the
    * embedder runs once per chunk at ingest, not in an n×m join hot path. */
  def embedUdf(dim: Int): Column => Column = {
    val f = udf((s: String) => embed(s, dim))
    (c: Column) => f(c)
  }
}
