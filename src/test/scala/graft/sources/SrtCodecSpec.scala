package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

import graft.{SparkEntry, SparkSuite}

/** The strict SRT codec (q140's transcript side) and the alignment
  * invariants of the subtitle-to-scene interval join. */
class SrtCodecSpec extends SparkSuite {

  test("encode/decode round-trips cues exactly, 1-indexed") {
    val cues = Seq((0L, 25L, "hello world"), (30L, 55L, "second cue"),
      (3600000L + 61000L + 7L, 3600000L + 62000L, "an hour in"))
    val back = Srt.decode(Srt.encode(cues))
    assert(back.map(c => (c.startMs, c.endMs, c.text)) == cues)
    assert(back.map(_.idx) == Seq(1, 2, 3))
  }

  test("encode renders the standard timestamp form") {
    val s = new String(Srt.encode(Seq((3661007L, 3662000L, "x"))), UTF_8)
    assert(s.contains("01:01:01,007 --> 01:01:02,000"), s)
  }

  test("decode of empty input is empty; corrupt inputs throw loudly") {
    assert(Srt.decode(Array.emptyByteArray).isEmpty)
    def bad(s: String): Unit =
      intercept[IllegalArgumentException](Srt.decode(s.getBytes(UTF_8)))
    bad("1\n00:00:00,000 --> 00:00:00,025\nx\n")            // no terminator
    bad("2\n00:00:00,000 --> 00:00:00,025\nx\n\n")          // index skip
    bad("1\n00:00:00,000 -> 00:00:00,025\nx\n\n")           // wrong arrow
    bad("1\n00:00:00,025 --> 00:00:00,025\nx\n\n")          // empty window
    bad("1\n00:00:61,000 --> 00:00:62,000\nx\n\n")          // seconds >= 60
    bad("1\n00:00:00,000 --> 00:00:00,025\nx\ny\n\n")       // multi-line cue
  }

  test("encode refuses windows and text it could not round-trip") {
    intercept[IllegalArgumentException](Srt.encode(Seq((10L, 10L, "x"))))
    intercept[IllegalArgumentException](Srt.encode(Seq((0L, 5L, "a\nb"))))
  }

  test("q140 alignment invariants hold corpus-wide") {
    val rows = SparkEntry.queries("q140_subtitle_align")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // cue windows are the 30 ms grid; overlap bounded by the cue length
    rows.foreach { r =>
      val (cueIdx, start, end) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(start == cueIdx * 30000 && end == start + 25000)
      val (scene, ov) = (r.getLong(6), r.getLong(7))
      assert(ov >= 0 && ov <= 25000, s"overlap $ov outside [0, cue length]")
      assert((scene == -1) == (ov == 0), "scene -1 iff zero overlap")
      assert(scene < r.getLong(5), "assigned scene index within n_scenes")
    }
    // cue indices are dense per doc starting at 0
    rows.groupBy(_.getLong(0)).foreach { case (doc, rs) =>
      val idxs = rs.map(_.getLong(1)).sorted.toSeq
      assert(idxs == (0L until idxs.length).toSeq, s"doc $doc cue gaps: $idxs")
    }
    // the mix is non-degenerate: some cues align past scene 0, some dangle
    assert(rows.exists(_.getLong(6) > 0), "no cue aligned past scene 0")
    assert(rows.exists(_.getLong(6) == -1), "no cue past the video end")
  }
}
