package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

/** Minimal strict SubRip (.srt) subtitle codec — the transcript side of
  * the video-alignment stage (q140). Cues are single-line (the staged
  * corpus has no newlines), millisecond-resolution, written with LF line
  * endings and a blank line after every cue block:
  *
  * {{{
  * 1
  * 00:00:00,000 --> 00:00:00,025
  * cue text
  *
  * }}}
  *
  * Decode is strict in the repo's codec discipline: indices must start at
  * 1 and increment, timestamps must parse as HH:MM:SS,mmm with the
  * " --> " arrow, every window must be non-empty — anything else throws
  * LOUDLY rather than yielding silently-wrong alignments.
  */
object Srt {

  final case class Cue(idx: Int, startMs: Long, endMs: Long, text: String)

  private def fmt(ms: Long): String = {
    val h = ms / 3600000L; val m = (ms % 3600000L) / 60000L
    val s = (ms % 60000L) / 1000L; val r = ms % 1000L
    f"$h%02d:$m%02d:$s%02d,$r%03d"
  }

  /** cues = (startMs, endMs, single-line text), emitted 1-indexed. */
  def encode(cues: Seq[(Long, Long, String)]): Array[Byte] = {
    val sb = new StringBuilder
    cues.zipWithIndex.foreach { case ((s, e, t), i) =>
      require(s >= 0 && e > s, s"cue ${i + 1}: invalid window [$s,$e) ms")
      require(!t.contains('\n') && !t.contains('\r'),
        s"cue ${i + 1}: multi-line cue text unsupported")
      sb.append(i + 1).append('\n')
        .append(fmt(s)).append(" --> ").append(fmt(e)).append('\n')
        .append(t).append('\n').append('\n')
    }
    sb.toString.getBytes(UTF_8)
  }

  private val Ts = raw"(\d{2,}):(\d{2}):(\d{2}),(\d{3})".r

  private def parseTs(s: String): Long = s match {
    case Ts(h, m, sec, ms) =>
      require(m.toInt < 60 && sec.toInt < 60, s"corrupt SRT timestamp: $s")
      h.toLong * 3600000L + m.toLong * 60000L + sec.toLong * 1000L + ms.toLong
    case _ => throw new IllegalArgumentException(s"corrupt SRT timestamp: $s")
  }

  def decode(bytes: Array[Byte]): Seq[Cue] = {
    val body = new String(bytes, UTF_8)
    if (body.isEmpty) return Seq.empty
    require(body.endsWith("\n\n"), "corrupt SRT: missing terminating blank line")
    val blocks = body.dropRight(2).split("\n\n", -1)
    blocks.zipWithIndex.map { case (block, i) =>
      val lines = block.split("\n", -1)
      require(lines.length == 3, s"corrupt SRT: cue block ${i + 1} has ${lines.length} lines, want 3")
      val idx = lines(0).toIntOption.getOrElse(
        throw new IllegalArgumentException(s"corrupt SRT: non-numeric cue index '${lines(0)}'"))
      require(idx == i + 1, s"corrupt SRT: cue index $idx at position ${i + 1}")
      val arrow = lines(1).split(" --> ", -1)
      require(arrow.length == 2, s"corrupt SRT: cue $idx timing line '${lines(1)}'")
      val (s, e) = (parseTs(arrow(0)), parseTs(arrow(1)))
      require(e > s, s"corrupt SRT: cue $idx empty window [$s,$e) ms")
      Cue(idx, s, e, lines(2))
    }.toSeq
  }
}
