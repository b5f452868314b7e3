package graft.olap

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSuite}

/** q160's contract: the Avro round trip is INVISIBLE — the applied
  * snapshot equals q159's bit-for-bit — and the staged changelog lake is
  * a genuine multi-codec Avro object-container family whose records,
  * decoded file-by-file, reproduce exactly the derived change log. */
class AvroChangelogSpec extends SparkSuite {

  test("q160 equals q159 exactly (the Avro container adds nothing, loses nothing)") {
    val viaAvro = SparkEntry.queries("q160_avro_changelog")(spark, sfDir)
    val native = SparkEntry.queries("q159_cdc_apply")(spark, sfDir)
    assert(viaAvro.exceptAll(native).count() == 0)
    assert(native.exceptAll(viaAvro).count() == 0)
    assert(viaAvro.count() == native.count() && native.count() > 0)
  }

  test("the staged lake is real Avro: both codecs present, schema uniform, tombstones null") {
    // force staging, then inspect the published artifact directly
    SparkEntry.queries("q160_avro_changelog")(spark, sfDir).count()
    val root = graft.queries.SourceQueries.stagedBlobRoot(sfDir, "avrocdc")
    val files = root.listFiles().filter(_.getName.endsWith(".avro")).sortBy(_.getName)
    assert(files.nonEmpty, s"no .avro files under $root")
    var codecs = Set.empty[String]
    var total = 0L
    var deletes = 0L
    files.foreach { f =>
      val bytes = java.nio.file.Files.readAllBytes(f.toPath)
      // the codec name rides in the metadata map — recover it by decoding
      // with both and checking which the strict reader accepts is NOT
      // possible (decode reads it itself), so read it from the bytes: the
      // value directly follows the "avro.codec" key + 1 length byte
      val key = "avro.codec".getBytes
      val i = bytes.indexOfSlice(key) + key.length + 1
      val codec = if (bytes(i) == 'n') "null" else "deflate"
      codecs += codec
      val (schema, rows) = graft.sources.Avro.decode(bytes)
      assert(schema == graft.queries.OlapQueries.avroChangeSchema)
      total += rows.length
      rows.foreach { r =>
        val (seq, op, text) = (r(0).asInstanceOf[Long], r(1).asInstanceOf[String], r(3))
        assert(seq >= 1L && seq <= 3L)
        if (op == "D") { assert(text == null, "delete without null tombstone"); deletes += 1 }
        else assert(op == "U" && text != null)
      }
    }
    assert(codecs == Set("null", "deflate"),
      s"expected both codecs across the lake, saw $codecs")
    // record count equals the derived log's arithmetic cardinality
    val d = graft.core.Tables.documents(spark, sfDir).select(col("doc_id"))
    val expected = Seq(5, 7, 11, 13)
      .map(m => d.filter(col("doc_id") % m === 0).count()).sum
    assert(total == expected, s"lake rows $total != derived log rows $expected")
    assert(deletes == d.filter(col("doc_id") % 11 === 0).count())
  }
}
