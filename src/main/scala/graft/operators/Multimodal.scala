package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import org.apache.spark.sql.Column

import graft.functions.ImageKernels

/** Multimodal column pattern (north star M7d): media as opaque binary
  * columns + typed metadata, with batched per-partition kernels — the
  * Scala analogue of `mapInPandas` Pandas-UDF plumbing: explicit output
  * schema, bounded batch shape, partition-local processing, no driver
  * involvement.
  *
  * Kernels:
  *  - images (PNG/JPEG): REAL — javax.imageio decode + ImageKernels
  *    resize (no external deps needed on the JVM).
  *  - audio/video: the container ships no codec libraries, so decode is
  *    STUBBED behind `fakeWaveformFeatures` — a clearly-marked
  *    deterministic stand-in (byte-windowed energy) with the real
  *    batch/shape/schema plumbing around it. Swap the stub for a codec
  *    call and nothing else changes.
  */
object Multimodal {

  /** Canonical multimodal row schema: (id, modality, blob, meta).
    * Nullability mirrors what the builders produce (Spark marks
    * strings/binaries from case-class frames nullable). */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = true),
    StructField("blob", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("height", IntegerType, nullable = true),
      StructField("width", IntegerType, nullable = true),
      StructField("n_bytes", LongType, nullable = true),
      StructField("format", StringType, nullable = true))), nullable = false)))

  /** Deterministic frame sampling over an opaque binary column — the
    * video/audio "sample every Nth frame" plumbing as pure relational
    * ops: frames are fixed-length byte windows taken at a fixed stride,
    * capped at `maxFrames` per item, each emitted with its index,
    * actual length (the trailing frame may be short) and content md5.
    * The decode of a frame's bytes is exactly where a codec kernel
    * ([[batchFeatures]]) plugs in; everything around it — offsets,
    * stride arithmetic, per-item bounds, explode shape — is the real
    * 100 TB plumbing and is fully engine-checkable.
    *
    * Scale shape: one narrow projection + a bounded posexplode
    * (≤ `maxFrames` rows per item), no shuffle at all. */
  def sampleFrames(df: DataFrame, idCol: Column, blobCol: Column,
      frameLen: Int, stride: Int, maxFrames: Int): DataFrame = {
    require(frameLen > 0 && stride > 0 && maxFrames > 0,
      s"frameLen=$frameLen stride=$stride maxFrames=$maxFrames")
    df.select(idCol.as("media_id"), blobCol.as("blob"))
      .withColumn("n_bytes", length(col("blob")).cast("long"))
      .filter(col("n_bytes") > 0)
      .withColumn("nf", least(lit(maxFrames.toLong),
        ceil(col("n_bytes") / stride.toDouble).cast("long")))
      .select(col("media_id"), col("n_bytes"),
        posexplode(transform(sequence(lit(0), (col("nf") - 1).cast("int")),
          i => col("blob").substr(i * stride + 1, lit(frameLen))))
          .as(Seq("frame_idx", "frame")))
      .select(col("media_id"), col("n_bytes"),
        col("frame_idx").cast("long").as("frame_idx"),
        length(col("frame")).cast("long").as("frame_len"),
        md5(col("frame")).as("frame_md5"))
  }

  /** Output schema of [[batchFeatures]]. */
  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("feature", ArrayType(FloatType), nullable = true)))

  /** Wrap an (id, modality, blob) frame into the canonical schema,
    * probing image dims from headers (K4) without decoding pixels. */
  def toMediaFrame(df: DataFrame): DataFrame = {
    val dims = udf((modality: String, blob: Array[Byte]) =>
      if (modality == "image")
        try { val (h, w) = ImageKernels.dims(blob); Array(h, w) }
        catch { case _: Exception => null }
      else null)
    df.select(col("media_id"), col("modality"), col("blob"),
      dims(col("modality"), col("blob")).as("hw"))
      .select(col("media_id"), col("modality"), col("blob"),
        struct(
          col("hw").getItem(0).as("height"),
          col("hw").getItem(1).as("width"),
          length(col("blob")).cast("long").as("n_bytes"),
          when(col("modality") === "image", lit("png")).as("format"))
          .as("meta"))
  }

  /** STUB (no codecs in this environment): deterministic pseudo-features
    * for non-image media — mean absolute byte value per fixed-size
    * window. Replace with a real decoder without touching the
    * surrounding batch plumbing. */
  def fakeWaveformFeatures(blob: Array[Byte], nWindows: Int): Array[Float] = {
    val out = new Array[Float](nWindows)
    if (blob.isEmpty) return out
    val win = math.max(1, blob.length / nWindows)
    var i = 0
    while (i < nWindows) {
      var s = 0L
      var j = i * win
      val end = math.min(blob.length, (i + 1) * win)
      while (j < end) { s += (blob(j) & 0xff); j += 1 }
      out(i) = if (end > j - 1 && end - i * win > 0)
        s.toFloat / math.max(1, end - i * win) else 0f
      i += 1
    }
    out
  }

  /** Batched per-partition feature extraction — the mapInPandas shape:
    * the iterator is consumed in bounded `batchSize` groups, each batch
    * processed by one kernel call per modality, output rows streamed
    * with the declared [[featureSchema]]. Images go through the real
    * decode+resize kernel to an 8×8 luminance; other modalities through
    * the stub. */
  def batchFeatures(media: DataFrame, batchSize: Int): DataFrame = {
    val spark = media.sparkSession
    val outRows = media.select("media_id", "modality", "blob")
      .queryExecution.toRdd.mapPartitions { it =>
        it.map { ir =>
          (ir.getLong(0), ir.getUTF8String(1).toString,
            ir.getBinary(2))
        }
      }
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // one "kernel call" per batch (the Pandas-UDF batch shape)
          batch.map { case (id, modality, blob) =>
            val feat: Array[Float] = modality match {
              case "image" =>
                try {
                  val img = ImageKernels.resizeBilinear(
                    ImageKernels.decode(blob), 8, 8)
                  // luminance plane
                  val lum = new Array[Float](64)
                  var p = 0
                  while (p < 64) {
                    lum(p) = 0.299f * img.data(p * 3) +
                      0.587f * img.data(p * 3 + 1) +
                      0.114f * img.data(p * 3 + 2)
                    p += 1
                  }
                  lum
                } catch { case _: Exception => null }
              case _ => fakeWaveformFeatures(blob, 16)
            }
            Row(id, modality, blob.length.toLong, feat)
          }
        }
      }
    spark.createDataFrame(outRows, featureSchema)
  }
}
