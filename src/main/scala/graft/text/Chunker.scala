package graft.text

import scala.collection.mutable.ArrayBuffer
import scala.util.matching.Regex

/** D2 / §2.8 UDTF — recursive character text splitter.
  *
  * Faithful re-implementation of the splitting semantics the reference
  * configures at `/root/reference/app.py:181-187, 194-199`:
  * chunk_size=1000, chunk_overlap=200, separators `["\n\n","\n"," ",""]`
  * (the public RecursiveCharacterTextSplitter algorithm: split on the
  * first separator present, greedily merge splits up to chunk_size with
  * a trailing-overlap carry, recurse into oversized splits with the
  * remaining separators).
  *
  * This is a pure function used via `Dataset.flatMap` — one input doc row
  * fans out to N chunk rows on the executor, no driver involvement, no
  * shuffle (chunking is embarrassingly parallel at any scale).
  */
object Chunker {

  val DefaultSeparators: Seq[String] = Seq("\n\n", "\n", " ", "")
  val DefaultChunkSize = 1000
  val DefaultOverlap = 200

  final case class Chunk(chunkId: Int, text: String)

  def chunk(text: String,
            chunkSize: Int = DefaultChunkSize,
            overlap: Int = DefaultOverlap,
            separators: Seq[String] = DefaultSeparators): Vector[String] =
    if (text.isEmpty) Vector.empty
    else splitText(text, separators, chunkSize, overlap).filter(_.nonEmpty)

  def chunkWithIds(text: String,
                   chunkSize: Int = DefaultChunkSize,
                   overlap: Int = DefaultOverlap): Vector[Chunk] =
    chunk(text, chunkSize, overlap).zipWithIndex.map { case (t, i) => Chunk(i, t) }

  private def splitText(text: String, separators: Seq[String],
                        chunkSize: Int, overlap: Int): Vector[String] = {
    // First separator that occurs in the text wins; "" (char split) is the
    // terminal fallback.
    var sep = separators.lastOption.getOrElse("")
    var rest: Seq[String] = Nil
    val it = separators.iterator
    var idx = 0
    var found = false
    while (it.hasNext && !found) {
      val s = it.next()
      if (s.isEmpty || text.contains(s)) {
        sep = s
        rest = separators.drop(idx + 1)
        found = true
      }
      idx += 1
    }

    val splits: Vector[String] =
      if (sep.isEmpty) text.map(_.toString).toVector
      else text.split(Regex.quote(sep), -1).toVector

    val out = ArrayBuffer.empty[String]
    val good = ArrayBuffer.empty[String]
    for (s <- splits) {
      if (s.length < chunkSize) good += s
      else {
        if (good.nonEmpty) { out ++= mergeSplits(good.toVector, sep, chunkSize, overlap); good.clear() }
        if (rest.isEmpty) out += s
        else out ++= splitText(s, rest, chunkSize, overlap)
      }
    }
    if (good.nonEmpty) out ++= mergeSplits(good.toVector, sep, chunkSize, overlap)
    out.toVector
  }

  /** Greedy merge with trailing overlap (the public _merge_splits shape). */
  private def mergeSplits(splits: Vector[String], sep: String,
                          chunkSize: Int, overlap: Int): Vector[String] = {
    val sepLen = sep.length
    val docs = ArrayBuffer.empty[String]
    val current = ArrayBuffer.empty[String]
    var total = 0
    for (d <- splits) {
      val len = d.length
      val extra = if (current.nonEmpty) sepLen else 0
      if (total + len + extra > chunkSize && current.nonEmpty) {
        docs += current.mkString(sep).trim
        // drop from the front until within overlap (and until the new piece fits)
        var done = false
        while (!done && current.nonEmpty &&
          (total > overlap || (total + len + (if (current.nonEmpty) sepLen else 0) > chunkSize && total > 0))) {
          total -= current.head.length + (if (current.length > 1) sepLen else 0)
          current.remove(0)
          if (current.isEmpty) done = true
        }
      }
      current += d
      total += len + (if (current.length > 1) sepLen else 0)
    }
    docs += current.mkString(sep).trim
    docs.toVector
  }
}
