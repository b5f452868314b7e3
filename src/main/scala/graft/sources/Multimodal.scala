package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns — binary payloads with typed metadata (builder
  * mandate: image/audio/video as opaque BINARY + decode/feature/resize/
  * frame-sample stages).
  *
  * The decode stage dispatches on the payload's magic bytes:
  *   - RIFF/WAVE payloads go through a REAL pure-JVM codec: chunk walk,
  *     fmt validation (PCM, 16-bit), little-endian int16 sample decode —
  *     the same shape as the reference's real parsers (PyMuPDF page text
  *     at app.py:123-132, docx at app.py:134-143), implemented against
  *     the public RIFF/WAVE layout with no native deps.
  *   - PNG payloads go through the REAL pure-JVM image codec in [[Png]]:
  *     chunk walk with CRC verification, zlib inflate, five-filter
  *     scanline reconstruction — pixels come back as the sample stream.
  *   - Anything else is treated as an opaque sample stream (unsigned byte
  *     values) — the fallback for payload types whose codecs genuinely
  *     aren't in this container (JPEG/MP3/H.264), keeping downstream
  *     stages (pooling, frame sampling, checksums) exact, deterministic,
  *     and oracle-checkable for any payload.
  * A new format = one more `case` in `decodeSamples`; the Spark plumbing
  * (BINARY column, typed schema, executor-side mapPartitions batches)
  * is format-agnostic.
  */
object Multimodal {

  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_samples", LongType, nullable = false),
    StructField("b0", DoubleType, nullable = false),
    StructField("b1", DoubleType, nullable = false),
    StructField("b2", DoubleType, nullable = false),
    StructField("b3", DoubleType, nullable = false),
    StructField("b4", DoubleType, nullable = false),
    StructField("b5", DoubleType, nullable = false),
    StructField("b6", DoubleType, nullable = false),
    StructField("b7", DoubleType, nullable = false),
    StructField("frame_checksum", LongType, nullable = false),
    StructField("n_frames", LongType, nullable = false)))

  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def tag(b: Array[Byte], off: Int): String =
    new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** True iff the payload carries a RIFF/WAVE header. */
  private[graft] def isWav(bytes: Array[Byte]): Boolean =
    bytes.length >= 12 && tag(bytes, 0) == "RIFF" && tag(bytes, 8) == "WAVE"

  /** Encode mono 16-bit PCM samples as a standards-shaped WAV file:
    * RIFF header, `fmt ` chunk (PCM, 1 channel, 16 bps), `data` chunk of
    * little-endian int16 frames. Samples must fit int16. */
  private[graft] def encodeWavPcm16(samples: Array[Int], sampleRate: Int = 8000): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1.toShort)            // audio format: PCM
      .putShort(1.toShort)            // channels: mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2)         // byte rate = rate * block align
      .putShort(2.toShort)            // block align (1 ch × 16 bit)
      .putShort(16.toShort)           // bits per sample
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach { s =>
      require(s >= Short.MinValue && s <= Short.MaxValue, s"sample $s exceeds int16")
      buf.putShort(s.toShort)
    }
    buf.array()
  }

  /** Real WAV decode: walk the RIFF chunk list (ids are 4 ASCII bytes,
    * sizes little-endian, chunks even-padded — so a LIST/INFO chunk ahead
    * of `data` is skipped, not tripped over), validate `fmt ` as 16-bit
    * PCM mono, and decode the `data` chunk's little-endian int16 frames.
    * Unsupported encodings fail LOUDLY — silently mis-decoded audio is a
    * corpus poison no downstream filter can catch. */
  private[graft] def decodeWavPcm16(bytes: Array[Byte]): Array[Int] = {
    require(isWav(bytes), "not a RIFF/WAVE payload")
    var off = 12
    var fmtOk = false
    var samples: Array[Int] = null
    while (off + 8 <= bytes.length && (samples == null || !fmtOk)) {
      val id = tag(bytes, off)
      val size = le32(bytes, off + 4)
      // compare in Long: a corrupt size near Int.MaxValue would wrap
      // `off + 8 + size` negative and slip past an Int-typed guard
      require(size >= 0 && off + 8 + size.toLong <= bytes.length,
        s"corrupt WAV: chunk $id size $size overruns payload")
      id match {
        case "fmt " =>
          require(size >= 16, s"corrupt WAV: fmt chunk size $size")
          val audioFormat = le16(bytes, off + 8)
          val channels = le16(bytes, off + 10)
          val bps = le16(bytes, off + 22)
          require(audioFormat == 1 && channels == 1 && bps == 16,
            s"unsupported WAV encoding (format=$audioFormat ch=$channels bps=$bps); " +
              "only 16-bit PCM mono is implemented")
          fmtOk = true
        case "data" =>
          samples = Array.tabulate(size / 2)(i => le16(bytes, off + 8 + 2 * i).toShort.toInt)
        case _ => () // LIST, fact, cue … — skip
      }
      off += 8 + size + (size & 1) // chunks are word-aligned
    }
    require(fmtOk, "corrupt WAV: no fmt chunk")
    require(samples != null, "corrupt WAV: no data chunk")
    samples
  }

  /** Decode dispatch: real WAV codec for RIFF/WAVE payloads, real PNG
    * codec for PNG payloads, opaque bytes-as-samples for formats without
    * an offline codec. */
  private[graft] def decodeSamples(bytes: Array[Byte]): Array[Int] =
    if (isWav(bytes)) decodeWavPcm16(bytes)
    else if (Png.isPng(bytes)) Png.decodeToSamples(bytes)
    else bytes.map(b => b & 0xff)

  /** "Resize": average-pool the sample stream into 8 equal segments
    * (segment of sample i = i*8/n), like pooling an image to fixed dims. */
  private def pool8(samples: Array[Int]): Array[Double] = {
    val sums = new Array[Double](8)
    val counts = new Array[Long](8)
    val n = samples.length
    var i = 0
    while (i < n) { val s = i * 8 / n; sums(s) += samples(i); counts(s) += 1; i += 1 }
    Array.tabulate(8)(s => if (counts(s) == 0) 0.0 else sums(s) / counts(s))
  }

  /** "Frame sampling": every 16th sample (video keyframe analog) folded
    * into a rolling checksum mod 2^31−1, plus the frame count. */
  private def frames(samples: Array[Int]): (Long, Long) = {
    var acc = 0L
    var n = 0L
    var i = 0
    while (i < samples.length) {
      if (i % 16 == 0) { acc = (acc * 31 + samples(i)) % 2147483647L; n += 1 }
      i += 1
    }
    (acc, n)
  }

  /** Typed row for the feature stage — field names ARE the output schema. */
  case class Features(
      doc_id: Long, n_samples: Long,
      b0: Double, b1: Double, b2: Double, b3: Double,
      b4: Double, b5: Double, b6: Double, b7: Double,
      frame_checksum: Long, n_frames: Long)

  /** Lenient variant's row: decode_ok=false quarantines a corrupt blob
    * (zeroed features, the error's class+message preserved) instead of
    * failing the stage. */
  case class FeaturesL(
      doc_id: Long, n_samples: Long,
      b0: Double, b1: Double, b2: Double, b3: Double,
      b4: Double, b5: Double, b6: Double, b7: Double,
      frame_checksum: Long, n_frames: Long,
      decode_ok: Boolean, decode_error: String)

  /** blobs(doc_id LONG, content BINARY) → per-blob features. Batch shape:
    * one partition iterator pass via typed `Dataset.mapPartitions` — the
    * mapInPandas-equivalent contract — staying on the Dataset/encoder
    * path (no RDD round-trip), so the object stage fuses into the
    * surrounding plan with Serialize/DeserializeToObject boundaries. */
  def extractFeatures(blobs: DataFrame): DataFrame = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.select(col("doc_id").cast("long"), col("content").cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val samples = decodeSamples(if (bytes == null) Array.empty else bytes)
          val p = pool8(samples)
          val (ck, nf) = frames(samples)
          Features(id, samples.length.toLong,
            p(0), p(1), p(2), p(3), p(4), p(5), p(6), p(7), ck, nf)
        }
      }
      .toDF()
  }

  /** [[extractFeatures]] with corrupt-blob quarantine: at lake scale some
    * blobs WILL be truncated or mislabeled, and one bad file must not
    * fail a 10-hour stage. Decode errors become `decode_ok = false` rows
    * carrying the error text (routable to a quarantine sink with one
    * filter); good blobs are bit-identical to the strict path. The strict
    * path stays the default — a VALIDATED corpus wants corruption loud. */
  def extractFeaturesLenient(blobs: DataFrame): DataFrame = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.select(col("doc_id").cast("long"), col("content").cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          try {
            val samples = decodeSamples(if (bytes == null) Array.empty else bytes)
            val p = pool8(samples)
            val (ck, nf) = frames(samples)
            FeaturesL(id, samples.length.toLong,
              p(0), p(1), p(2), p(3), p(4), p(5), p(6), p(7), ck, nf,
              decode_ok = true, decode_error = "")
          } catch {
            case e: Exception =>
              FeaturesL(id, 0L, 0, 0, 0, 0, 0, 0, 0, 0, 0L, 0L,
                decode_ok = false,
                decode_error = s"${e.getClass.getSimpleName}: ${e.getMessage}")
          }
        }
      }
      .toDF()
  }
}
