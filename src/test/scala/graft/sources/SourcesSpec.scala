package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.types._

import graft.SparkSuite

class SourcesSpec extends SparkSuite {

  test("BOM-aware decode: all four sniff branches + strict UTF-16 failures") {
    val s = "héllo wörld"
    assert(TextExtract.decodeAuto(s.getBytes("UTF-8")) === ((s, "utf-8")))
    assert(TextExtract.decodeAuto(
      Array[Byte](0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++ s.getBytes("UTF-8")) ===
      ((s, "utf-8-bom")))
    assert(TextExtract.decodeAuto(
      Array[Byte](0xFF.toByte, 0xFE.toByte) ++ s.getBytes("UTF-16LE")) === ((s, "utf-16le")))
    assert(TextExtract.decodeAuto(
      Array[Byte](0xFE.toByte, 0xFF.toByte) ++ s.getBytes("UTF-16BE")) === ((s, "utf-16be")))
    // BOM-only file decodes to empty with the BOM's codec
    assert(TextExtract.decodeAuto(Array[Byte](0xFF.toByte, 0xFE.toByte)) === (("", "utf-16le")))
    assert(TextExtract.decodeAuto(Array.empty[Byte]) === (("", "utf-8")))
    // odd byte count after a UTF-16 BOM is corruption, not data — loud
    assertThrows[java.nio.charset.CharacterCodingException] {
      TextExtract.decodeAuto(
        Array[Byte](0xFF.toByte, 0xFE.toByte) ++ s.getBytes("UTF-16LE").dropRight(1))
    }
    // no BOM → the q03 fallback contract is unchanged
    assert(TextExtract.decodeAuto(Array[Byte]('h', 0xE9.toByte))._2 === "latin-1")
    // UTF-32 BOMs out-rank their UTF-16 prefixes (FF FE 00 00 is a valid
    // UTF-16LE start — a naive sniff would NUL-interleave the text)
    assert(TextExtract.decodeAuto(
      Array[Byte](0xFF.toByte, 0xFE.toByte, 0, 0) ++ s.getBytes("UTF-32LE")) ===
      ((s, "utf-32le")))
    assert(TextExtract.decodeAuto(
      Array[Byte](0, 0, 0xFE.toByte, 0xFF.toByte) ++ s.getBytes("UTF-32BE")) ===
      ((s, "utf-32be")))
  }

  test("O3 decode: valid UTF-8 stays UTF-8, malformed falls back to latin-1") {
    val (t1, e1) = TextExtract.decodeWithFallback("héllo wörld".getBytes("UTF-8"))
    assert(t1 === "héllo wörld" && e1 === "utf-8")
    // 0xE9 alone is malformed UTF-8 but valid latin-1 'é'
    val (t2, e2) = TextExtract.decodeWithFallback(Array[Byte]('h', 0xE9.toByte, 'l', 'l', 'o'))
    assert(t2 === "héllo" && e2 === "latin-1")
    assert(TextExtract.decodeWithFallback(null)._1 === "")
  }

  test("O2 paragraph join drops blanks and trims (app.py:134-143)") {
    assert(TextExtract.joinParagraphs(Seq(" a ", "", "  ", "b")) === "a\nb")
  }

  test("q03 encoding fallback query: utf-8 rows untouched, %3==0 rows latin-1") {
    import org.apache.spark.sql.functions.col
    val out = graft.queries.SourceQueries.encodingFallback(spark, sfDir).cache()
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    assert(out.count() === docs.count())
    assert(out.filter(col("doc_id") % 3 === 0)
      .filter(col("encoding") =!= "latin-1").count() === 0)
    assert(out.filter(col("doc_id") % 3 =!= 0)
      .filter(col("encoding") =!= "utf-8").count() === 0)
    // latin-1 rows end with the Ã that the dangling 0xC3 decodes to
    assert(out.filter(col("doc_id") % 3 === 0)
      .filter(!col("text").endsWith("Ã")).count() === 0)
    out.unpersist()
  }

  test("q60b binaryFile ingestion matches the synthesized-blob features") {
    import org.apache.spark.sql.functions.col
    val viaFiles = graft.queries.SourceQueries.multimodalBinaryFiles(spark, sfDir)
    val viaCast = graft.queries.SourceQueries.multimodalDecode(spark, sfDir)
      .select(col("doc_id"), col("n_samples"), col("frame_checksum"), col("n_frames"))
    assert(viaFiles.count() > 0)
    assert(viaFiles.exceptAll(viaCast).count() === 0)
    assert(viaCast.exceptAll(viaFiles).count() === 0)
  }

  test("O6/O7/O8 collection lifecycle: idempotent create, append upsert, truncate") {
    val dir = Files.createTempDirectory("graft-coll").toString + "/coll"
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", StringType)))
    import spark.implicits._

    Collections.create(spark, dir, schema)
    Collections.create(spark, dir, schema) // idempotent — must not throw
    assert(Collections.exists(spark, dir))
    assert(spark.read.parquet(dir).count() === 0)

    Collections.upsert(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), dir)
    Collections.upsert(Seq((3L, "c")).toDF("id", "v"), dir)
    assert(spark.read.parquet(dir).count() === 3)

    Collections.truncate(spark, dir, schema)
    assert(spark.read.parquet(dir).count() === 0)
  }
}
