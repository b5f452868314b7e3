package graft.sources

import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSuite

/** Source-format breadth (SURVEY §2.1 / D8): CSV with encoding options
  * (the DataFrame-level analog of O3's fallback), JSON lines with
  * PERMISSIVE corrupt-record capture, wholetext, ORC round-trip, and the
  * binaryFile source feeding the multimodal pipeline. */
class FormatsSpec extends SparkSuite {

  private def tmp(): String = Files.createTempDirectory("graft-fmt").toString

  test("CSV: latin-1 encoded file reads correctly with the encoding option") {
    val dir = tmp()
    val f = Paths.get(dir, "latin.csv")
    Files.write(f, "id,name\n1,héllo\n2,wörld\n".getBytes(StandardCharsets.ISO_8859_1))
    val utf8Wrong = spark.read.option("header", "true").csv(f.toString)
      .collect().map(_.getString(1)).toSeq
    val latin = spark.read.option("header", "true")
      .option("encoding", "ISO-8859-1").csv(f.toString)
      .collect().map(_.getString(1)).toSeq
    assert(latin === Seq("héllo", "wörld"))
    assert(utf8Wrong !== latin) // mis-decoded without the option
  }

  test("JSON lines: PERMISSIVE mode captures the corrupt record, keeps good rows") {
    val dir = tmp()
    Files.write(Paths.get(dir, "rows.json"),
      """{"id": 1, "v": "ok"}
        |{"id": 2, "v": "also ok"}
        |{not valid json at all
        |""".stripMargin.getBytes(StandardCharsets.UTF_8))
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", StringType),
      StructField("_corrupt_record", StringType)))
    val df = spark.read.schema(schema).option("mode", "PERMISSIVE")
      .json(dir).cache()
    assert(df.filter(col("_corrupt_record").isNull).count() === 2)
    assert(df.filter(col("_corrupt_record").isNotNull).count() === 1)
  }

  test("wholetext: one row per file, content intact") {
    val dir = tmp()
    Files.write(Paths.get(dir, "a.txt"), "line1\nline2".getBytes(StandardCharsets.UTF_8))
    val rows = spark.read.option("wholetext", "true").text(dir).collect()
    assert(rows.length === 1 && rows.head.getString(0) === "line1\nline2")
  }

  test("ORC: documents round-trip losslessly") {
    val dir = tmp() + "/docs_orc"
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.write.orc(dir)
    val back = spark.read.orc(dir)
    assert(back.orderBy("doc_id").collect().toSeq ===
      docs.orderBy("doc_id").collect().toSeq)
  }

  test("WAV codec: encode → decode round-trips arbitrary int16 samples") {
    val samples = Array(0, 1, -1, 255, -255, 32767, -32768, 1000, -12345)
    val wav = Multimodal.encodeWavPcm16(samples, sampleRate = 44100)
    assert(Multimodal.isWav(wav))
    assert(Multimodal.decodeWav(wav).toSeq === samples.toSeq)
    // empty sample stream is a legal (44-byte) WAV
    assert(Multimodal.decodeWav(Multimodal.encodeWavPcm16(Array.empty)).isEmpty)
  }

  test("WAV codec: PCM8 and IEEE-float32 subformats round-trip; bad variants are loud") {
    // PCM8 stores UNSIGNED bytes and decodes to the raw 0-255 values
    val bytes8 = Array(0, 1, 127, 128, 200, 255)
    assert(Multimodal.decodeWav(Multimodal.encodeWavPcm8(bytes8)).toSeq === bytes8.toSeq)
    // odd-length data chunk carries the RIFF pad byte and still parses
    val odd = Array(9, 10, 11)
    assert(Multimodal.decodeWav(Multimodal.encodeWavPcm8(odd)).toSeq === odd.toSeq)
    intercept[IllegalArgumentException](Multimodal.encodeWavPcm8(Array(256)))
    intercept[IllegalArgumentException](Multimodal.encodeWavPcm8(Array(-1)))
    // float32 normalizes to the int16 grid: n/32768 is exact in float,
    // so the full int16 range round-trips bit-exactly
    val ints = Array(0, 1, -1, 255, 32767, -32768, -12345)
    assert(Multimodal.decodeWav(Multimodal.encodeWavFloat32(ints)).toSeq === ints.toSeq)
    // a float sample outside [-1, 1] (or NaN) is corruption, not audio
    val f = Multimodal.encodeWavFloat32(Array(100))
    val buf = java.nio.ByteBuffer.wrap(f).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.putFloat(44, 1.5f)
    intercept[IllegalArgumentException](Multimodal.decodeWav(f))
    buf.putFloat(44, Float.NaN)
    intercept[IllegalArgumentException](Multimodal.decodeWav(f))
    // WAVE_FORMAT_EXTENSIBLE (0xFFFE) must be rejected loudly
    val ext = Multimodal.encodeWavPcm16(Array(1, 2, 3)).clone()
    ext(20) = 0xFE.toByte; ext(21) = 0xFF.toByte
    val e = intercept[IllegalArgumentException](Multimodal.decodeWav(ext))
    assert(e.getMessage.contains("unsupported WAV encoding"))
    // PCM24 (bps=24) likewise
    val p24 = Multimodal.encodeWavPcm16(Array(1, 2, 3)).clone()
    p24(34) = 24
    intercept[IllegalArgumentException](Multimodal.decodeWav(p24))
  }

  test("WAV codec: hand-built file with a LIST chunk before data parses; bad files are loud") {
    // hand-assemble RIFF [LIST(6)] [fmt ] [data] — the chunk walk must skip
    // the unknown odd-sized (word-padded) LIST chunk, not trip over it
    val samples = Array(7, -2, 300)
    val clean = Multimodal.encodeWavPcm16(samples)
    val fmtAndData = java.util.Arrays.copyOfRange(clean, 12, clean.length)
    val list = Array[Byte]('L', 'I', 'S', 'T', 5, 0, 0, 0, 'I', 'N', 'F', 'O', 'x', 0)
    val buf = java.nio.ByteBuffer.allocate(12 + list.length + fmtAndData.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(4 + list.length + fmtAndData.length)
      .put("WAVE".getBytes("US-ASCII")).put(list).put(fmtAndData)
    assert(Multimodal.decodeWav(buf.array()).toSeq === samples.toSeq)
    // stereo fmt must be rejected loudly, never silently mis-decoded
    val stereo = clean.clone()
    stereo(22) = 2 // channels field inside fmt
    val e = intercept[IllegalArgumentException](Multimodal.decodeWav(stereo))
    assert(e.getMessage.contains("unsupported WAV encoding"))
    // truncated data chunk must be rejected
    val truncated = java.util.Arrays.copyOfRange(clean, 0, clean.length - 2)
    intercept[IllegalArgumentException](Multimodal.decodeWav(truncated))
    // non-WAV payloads take the opaque bytes-as-samples path
    assert(Multimodal.decodeSamples("plain text".getBytes("US-ASCII")).toSeq ===
      "plain text".getBytes("US-ASCII").map(_ & 0xff).toSeq)
  }

  test("lenient decode quarantines a corrupt WAV; good blobs match the strict path") {
    val dir = tmp()
    val good = Multimodal.encodeWavPcm16(Array(5, -9, 1000))
    Files.write(Paths.get(dir, "blob_1.wav"), good)
    Files.write(Paths.get(dir, "blob_2.wav"),
      java.util.Arrays.copyOfRange(good, 0, good.length - 2)) // truncated
    val blobs = spark.read.format("binaryFile").load(dir)
      .select(
        regexp_extract(col("path"), "blob_(\\d+)\\.wav$", 1).cast("long").as("doc_id"),
        col("content"))
    val out = Multimodal.extractFeaturesLenient(blobs).orderBy("doc_id").collect()
    assert(out.length === 2)
    assert(out(0).getAs[Boolean]("decode_ok"))
    assert(out(0).getLong(1) === 3L) // n_samples
    assert(!out(1).getAs[Boolean]("decode_ok"))
    assert(out(1).getAs[String]("decode_error").contains("overruns payload"))
    // strict path on the same corrupt dir fails loudly instead
    intercept[org.apache.spark.SparkException] {
      Multimodal.extractFeatures(blobs).collect()
    }
  }

  test("binaryFile source feeds the multimodal pipeline") {
    val dir = tmp()
    Files.write(Paths.get(dir, "blob_7.bin"), "some fake image payload".getBytes)
    Files.write(Paths.get(dir, "blob_9.bin"), "another binary body here!".getBytes)
    val blobs = spark.read.format("binaryFile").load(dir)
      .select(
        regexp_extract(col("path"), "blob_(\\d+)\\.bin$", 1).cast("long").as("doc_id"),
        col("content"))
    val feats = Multimodal.extractFeatures(blobs).orderBy("doc_id").collect()
    assert(feats.map(_.getLong(0)).toSeq === Seq(7L, 9L))
    assert(feats.head.getLong(1) === "some fake image payload".length.toLong)
    assert(feats.forall(_.getLong(11) >= 1L)) // n_frames
  }
}
