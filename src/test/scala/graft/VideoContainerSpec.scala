package graft

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.functions._

import graft.functions.ImageKernels
import graft.operators.Multimodal

/** m10 video-lane receipts: the hand-rolled RIFF/AVI container
  * round-trips byte-exactly (raw DIB and odd-length payloads, word
  * alignment included), the MJPG path carries REAL JPEG frames
  * through the S3 image kernel, malformed containers fail loudly,
  * and batchFeatures' video modality produces real features. */
class VideoContainerSpec extends SparkSpec {

  private def grayDib(w: Int, h: Int, f: Int): Array[Byte] = {
    val rowBytes = (w * 3 + 3) & ~3
    val frame = new Array[Byte](rowBytes * h)
    for (y <- 0 until h; x <- 0 until w) {
      val p = (h - 1 - y) * w + x
      val v = ((f * 17 + p * 7) % 256).toByte
      val b = y * rowBytes + x * 3
      frame(b) = v; frame(b + 1) = v; frame(b + 2) = v
    }
    frame
  }

  test("raw-DIB AVI round-trips byte-exactly with correct meta") {
    val frames = (0 until 5).map(f => grayDib(6, 4, f))
    val blob = Multimodal.aviEncode(frames, 6, 4, fps = 25,
      fourcc = "")
    assert(Multimodal.isAvi(blob))
    val (meta, out) = Multimodal.aviDecode(blob)
    assert(meta == Multimodal.AviMeta(6, 4, 5, 40000, ""))
    assert(out.length == 5)
    for ((o, f) <- out.zip(frames)) assert(o.sameElements(f))
    // bottom-up + padding handled: display pixel (y, x) carries the
    // formula value at p = y·w + x — decoded from the LAST stored row
    val img = Multimodal.dibDecode(out(1), 6, 4) // frame f = 1
    assert(img.h == 4 && img.w == 6 && img.c == 3)
    def v(y: Int, x: Int) = math.round(img(y, x, 0) * 255)
    assert(v(0, 0) == (1 * 17 + 0 * 7) % 256)          // top-left
    assert(v(3, 5) == (1 * 17 + (3 * 6 + 5) * 7) % 256) // bottom-right
    assert(Multimodal.dibPixelSum(out(1), 6, 4) ==
      3L * (0 until 24).map(p => (17 + p * 7) % 256).sum)
  }

  test("odd-length payloads survive the word-aligned walk") {
    val frames = Seq(Array.fill(33)(7.toByte), Array.fill(20)(9.toByte),
      Array.fill(131)(1.toByte))
    val blob = Multimodal.aviEncode(frames, 2, 2, fps = 10,
      fourcc = "")
    val (_, out) = Multimodal.aviDecode(blob)
    assert(out.map(_.length) == Seq(33, 20, 131))
    for ((o, f) <- out.zip(frames)) assert(o.sameElements(f))
  }

  test("MJPG frames route through the real JPEG kernel") {
    // real JPEGs from the smooth synthetic image (JPEG-friendly)
    def jpegOf(seed: Long): Array[Byte] = {
      val png = ImageKernels.synthPngSmooth(seed, 16, 16)
      val bi = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(png))
      val bos = new ByteArrayOutputStream()
      javax.imageio.ImageIO.write(bi, "jpg", bos)
      bos.toByteArray
    }
    val jpegs = (0 until 3).map(i => jpegOf(100 + i))
    val blob = Multimodal.aviEncode(jpegs, 16, 16, fps = 25,
      fourcc = "MJPG")
    val (meta, out) = Multimodal.aviDecode(blob)
    assert(meta.fourcc == "MJPG" && meta.nFrames == 3)
    assert(out.length == 3)
    for ((o, j) <- out.zip(jpegs)) assert(o.sameElements(j))
    // decodeAviFrame sees the JPEG SOI and uses ImageKernels.decode
    val img = Multimodal.decodeAviFrame(out.head, 16, 16)
    assert(img.h == 16 && img.w == 16 && img.c == 3)
    // lossy but close: compare against the original PNG pixels
    val ref = ImageKernels.decode(ImageKernels.synthPngSmooth(100, 16, 16))
    val mad = img.data.zip(ref.data).map { case (a, b) =>
      math.abs(a - b) }.sum / img.data.length
    assert(mad < 0.06, s"JPEG round-trip mean abs diff $mad")
  }

  test("malformed containers fail loudly") {
    val frames = Seq(grayDib(4, 4, 0))
    val blob = Multimodal.aviEncode(frames, 4, 4, 25, "")
    intercept[IllegalArgumentException] {
      Multimodal.aviDecode(blob.take(40)) // truncated mid-header
    }
    val corrupt = blob.clone()
    // blow up the avih chunk's declared size beyond the buffer
    val avihSizePos = 12 + 12 + 4
    corrupt(avihSizePos) = 0xff.toByte
    corrupt(avihSizePos + 1) = 0xff.toByte
    corrupt(avihSizePos + 2) = 0x7f.toByte
    intercept[IllegalArgumentException] {
      Multimodal.aviDecode(corrupt)
    }
    intercept[IllegalArgumentException] {
      Multimodal.aviDecode("plainly not avi bytes".getBytes)
    }
  }

  test("batchFeatures' video modality yields real frame features") {
    val media = Multimodal.toMediaFrame(
      spark.range(1, 9).select(col("id").as("media_id"),
        lit("video").as("modality"),
        Multimodal.synthAviUdf(col("id"), lit(3), lit(8), lit(8))
          .as("blob")))
    val rows = Multimodal.batchFeatures(media, 4)
      .select(col("media_id"), col("feature")).collect()
    assert(rows.length == 8)
    for (r <- rows) {
      val f = r.getSeq[Float](1)
      assert(f != null && f.length == 64)
      // luminance of the deterministic gray frame 0: nonzero spread
      assert(f.max > f.min)
    }
  }
}
