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

  test("q160b: two schema generations, one reader — provenance witness is arithmetic-exact") {
    val out = SparkEntry.queries("q160b_avro_schema_evolution")(spark, sfDir)
    // dropping src must reproduce q159 exactly
    val native = SparkEntry.queries("q159_cdc_apply")(spark, sfDir)
    assert(out.drop("src").exceptAll(native).count() == 0)
    assert(native.exceptAll(out.drop("src")).count() == 0)
    // winning-source distribution from first principles: %11 deleted;
    // else %7 → priority (seq 2); else %5 → upsert (seq 1, DEFAULT-FILLED
    // from v1 files that never stored the byte); else base; inserts are
    // fresh keys
    val keys = graft.core.Tables.documents(spark, sfDir)
      .select(col("doc_id")).collect().map(_.getLong(0))
    val expected = Map(
      "priority-upsert-stream" -> keys.count(k => k % 11 != 0 && k % 7 == 0).toLong,
      "upsert-stream" -> keys.count(k => k % 11 != 0 && k % 7 != 0 && k % 5 == 0).toLong,
      "base" -> keys.count(k => k % 11 != 0 && k % 7 != 0 && k % 5 != 0).toLong,
      "insert-stream" -> keys.count(_ % 13 == 0).toLong)
    val got = out.groupBy(col("src")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expected.filter(_._2 > 0), s"src distribution $got != $expected")
    // both generations really exist on disk
    val root = graft.queries.SourceQueries.stagedBlobRoot(sfDir, "avrocdc2")
    val names = root.listFiles().map(_.getName)
    assert(names.exists(_.startsWith("gen1_")) && names.exists(_.startsWith("gen2_")),
      s"expected both generations in $root, saw ${names.take(5).mkString(",")}")
    // and the v1 generation genuinely lacks the source field (schema check)
    val gen1 = names.filter(_.startsWith("gen1_")).sorted.head
    val (w1, _) = graft.sources.Avro.decode(
      java.nio.file.Files.readAllBytes(new java.io.File(root, gen1).toPath))
    assert(!w1.fields.exists(_.name == "source"))
  }
}
