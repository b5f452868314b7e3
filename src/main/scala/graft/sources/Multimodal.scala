package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns — binary payloads with typed metadata (builder
  * mandate: image/audio/video as opaque BINARY + decode/feature/resize/
  * frame-sample stages).
  *
  * The Spark-side plumbing here is REAL: a BINARY column, a typed output
  * schema, executor-side batch iteration via mapPartitions (the Scala
  * analog of `mapInPandas` batches), deterministic partitioning. The
  * DECODE ITSELF IS A STUB — this container has no image/audio codecs —
  * marked ** STUB ** below: it treats the byte stream as the "decoded"
  * sample array, which keeps every downstream stage (pooling, frame
  * sampling, checksums) exact, deterministic, and oracle-checkable.
  * Swapping in a real codec changes only `decodeSamples`.
  */
object Multimodal {

  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
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

  /** ** STUB ** — stands in for image/audio decode (PyMuPDF / PIL / ffmpeg
    * are unavailable offline). Real plumbing, fake codec: samples are the
    * unsigned byte values of the payload. */
  private def decodeSamples(bytes: Array[Byte]): Array[Int] =
    bytes.map(b => b & 0xff)

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
      doc_id: Long, n_bytes: Long,
      b0: Double, b1: Double, b2: Double, b3: Double,
      b4: Double, b5: Double, b6: Double, b7: Double,
      frame_checksum: Long, n_frames: Long)

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
}
