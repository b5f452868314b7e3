package graft.sources

import graft.{SparkEntry, SparkSuite}
import org.apache.spark.sql.functions._

/** q60w's segmentation invariants — the properties the row-level oracle
  * can't state as clearly: scene arithmetic, cut-index domain, and the
  * single-frame degenerate case. */
class SceneCutSpec extends SparkSuite {

  test("scene count is cuts + 1 and first_cut is -1 iff no cuts") {
    val out = SparkEntry.queries("q60w_scene_cut")(spark, sfDir)
    val bad = out.filter(
      col("n_scenes") =!= col("n_cuts") + 1 ||
        (col("n_cuts") === 0) =!= (col("first_cut") === -1)).count()
    assert(bad === 0)
  }

  test("single-frame docs have no cuts and a zero checksum") {
    val out = SparkEntry.queries("q60w_scene_cut")(spark, sfDir)
    val bad = out.filter(col("n_frames") === 1 &&
      (col("n_cuts") =!= 0 || col("cuts_checksum") =!= 0)).count()
    assert(bad === 0)
  }

  test("first cut index lies in [1, n_frames - 1]") {
    val out = SparkEntry.queries("q60w_scene_cut")(spark, sfDir)
    val bad = out.filter(col("n_cuts") > 0 &&
      (col("first_cut") < 1 || col("first_cut") >= col("n_frames"))).count()
    assert(bad === 0)
  }

  test("direct codec check: cut fires exactly on a metric jump > 300") {
    // frame 1 differs from frame 0 by exactly 301 in byte sum → cut;
    // frame 2 differs from frame 1 by exactly 300 → no cut (strict >).
    // 301 exceeds one byte's range, so spread it over three bytes.
    val f0 = Array.fill(200)('a'.toByte)
    val f1 = f0.clone()
    f1(0) = ('a' + 100).toByte; f1(1) = ('a' + 100).toByte; f1(2) = ('a' + 101).toByte
    val f2 = f1.clone()
    f2(0) = ('a' + 0).toByte; f2(1) = ('a' + 0).toByte; f2(2) = ('a' + 1).toByte
    val bytes = Avi.encode(Seq(f0, f1, f2), width = 320, height = 240,
      usPerFrame = 33367)
    val v = Avi.decode(bytes)
    val ms = v.frames.map(f => f.foldLeft(0L)((a, b) => a + (b & 0xff)))
    assert(ms(1) - ms(0) === 301L)
    assert(ms(1) - ms(2) === 300L)
    val cuts = (1 until ms.length).filter(i => math.abs(ms(i) - ms(i - 1)) > 300)
    assert(cuts === Seq(1))
  }
}
