package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.expressions.Window
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
  *  - audio (WAV/PCM): REAL — a hand-rolled RIFF/WAVE chunk walker +
  *    16-bit PCM decode ([[wavDecode]], pure JVM) with exact-integer
  *    windowed energy/zero-crossing features, oracle-checked
  *    end-to-end (m4).
  *  - video (AVI: motion-JPEG and uncompressed DIB): REAL — a
  *    hand-rolled RIFF/AVI chunk walker ([[aviDecode]], the
  *    [[wavDecode]] discipline on the video container) whose frames
  *    route through the S3 image kernel (MJPG) or the raw DIB parse;
  *    the m10 entry hash-checks the full
  *    synth→encode→walk→decode→feature path (the m4 discipline).
  *  - compressed audio (mp3/aac/…): out of scope — no codec
  *    libraries ship in this environment; unknown modalities yield a
  *    null feature rather than a fake one.
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

  // ———— WAV/PCM codec — REAL, pure JVM (no codec libs needed) ————

  /** Decoded WAV: sample rate, channel count, interleaved 16-bit
    * samples. */
  final case class Wav(sampleRate: Int, channels: Int,
      samples: Array[Short])

  /** Encode 16-bit little-endian mono PCM into the canonical 44-byte
    * RIFF/WAVE container — the layout every audio tool accepts. */
  def wavEncodePcm16(samples: Array[Short], sampleRate: Int)
      : Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
    buf.put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1)                     // PCM
      .putShort(1)                     // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2)          // byte rate
      .putShort(2)                     // block align
      .putShort(16)                    // bits per sample
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < samples.length) { buf.putShort(samples(i)); i += 1 }
    buf.array()
  }

  /** True iff the blob starts with a RIFF/WAVE signature. */
  def isWav(blob: Array[Byte]): Boolean =
    blob != null && blob.length >= 12 &&
      blob(0) == 'R' && blob(1) == 'I' && blob(2) == 'F' &&
      blob(3) == 'F' && blob(8) == 'W' && blob(9) == 'A' &&
      blob(10) == 'V' && blob(11) == 'E'

  /** Parse a RIFF/WAVE container: proper chunk walk (foreign files
    * carry LIST/fact/cue chunks between fmt and data — skipped by
    * their declared size, word-aligned per the RIFF spec), PCM
    * (format 1) at 16 bits only. */
  def wavDecode(blob: Array[Byte]): Wav = {
    require(isWav(blob), "not a RIFF/WAVE blob")
    val buf = java.nio.ByteBuffer.wrap(blob)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.position(12)
    var rate = -1; var channels = -1; var bits = -1
    var samples: Array[Short] = null
    while (buf.remaining() >= 8 && samples == null) {
      val tag = new String(Array(buf.get(), buf.get(), buf.get(),
        buf.get()).map(_.toChar))
      val size = buf.getInt()
      // size fields are attacker-/corruption-controlled: a negative
      // value would move the walk BACKWARDS (infinite loop) and a
      // negative data size would blow up array allocation
      require(size >= 0 && size <= buf.remaining(),
        s"malformed chunk '$tag': size $size, ${buf.remaining()} left")
      tag match {
        case "fmt " =>
          require(size >= 16, s"fmt chunk too short: $size")
          val fmt = buf.getShort()
          require(fmt == 1, s"only PCM supported, got format $fmt")
          channels = buf.getShort().toInt
          rate = buf.getInt()
          buf.getInt(); buf.getShort() // byte rate, block align
          bits = buf.getShort().toInt
          require(bits == 16, s"only 16-bit PCM supported, got $bits")
          // skip any fmt extension bytes
          buf.position(buf.position() +
            math.min(buf.remaining(), size - 16 + (size & 1)))
        case "data" =>
          require(rate > 0, "data chunk before fmt chunk")
          val n = size / 2
          val out = new Array[Short](n)
          var i = 0
          while (i < n) { out(i) = buf.getShort(); i += 1 }
          samples = out
        case _ =>
          buf.position(buf.position() +
            math.min(buf.remaining(), size + (size & 1))) // skip
      }
    }
    require(samples != null, "no data chunk found")
    Wav(rate, channels, samples)
  }

  /** Mono view of a decoded WAV: channel 0 of the interleaved frames
    * (deterministic, no averaging round-off). Feeding interleaved
    * stereo into windowed stats would mix channels per window and
    * count L→R sign flips as bogus zero-crossings. */
  def monoSamples(w: Wav): Array[Short] =
    if (w.channels <= 1) w.samples
    else {
      val n = w.samples.length / w.channels
      Array.tabulate(n)(i => w.samples(i * w.channels))
    }

  /** Per-window exact-integer audio features over mono samples —
    * energy (sum of squared samples) and zero-crossing count (strict
    * sign-class changes between adjacent samples WITHIN the window).
    * Integers, so bit-deterministic and oracle-expressible — the
    * audio twin of the micro-unit discipline. Full windows only. */
  final case class WinStat(energy: Long, zcr: Long)
  def wavWindowStats(samples: Array[Short], win: Int): Seq[WinStat] = {
    require(win > 0, s"window must be positive, got $win")
    val nWin = samples.length / win
    (0 until nWin).map { w =>
      var e = 0L; var z = 0L
      var i = w * win
      val end = i + win
      while (i < end) {
        val s = samples(i).toLong
        e += s * s
        if (i > w * win && ((samples(i) < 0) != (samples(i - 1) < 0)))
          z += 1
        i += 1
      }
      WinStat(e, z)
    }
  }

  /** Walsh–Hadamard transform, natural (Hadamard) coefficient order:
    * X[k] = Σ_n x[n]·(−1)^popcount(n AND k). Every basis coefficient
    * is ±1, so the spectrum is EXACT integer math — bit-deterministic
    * and oracle-expressible, which a float DFT is not (libm cos
    * differs between engines at the last ulp). O(n log n) in-place
    * butterfly; length must be a power of two. */
  def walshTransform(x: Array[Long]): Array[Long] = {
    val n = x.length
    require(n > 0 && (n & (n - 1)) == 0,
      s"WHT length must be a power of two, got $n")
    val a = x.clone()
    var h = 1
    while (h < n) {
      var i = 0
      while (i < n) {
        var j = i
        while (j < i + h) {
          val u = a(j); val v = a(j + h)
          a(j) = u + v; a(j + h) = u - v
          j += 1
        }
        i += h * 2
      }
      h *= 2
    }
    a
  }

  /** Per-window Walsh band energies: the `win`-point WHT of each full
    * window, compressed to four equal coefficient bands (Σ X[k]² per
    * band, Hadamard order) — a fixed-width frequency-content feature
    * row per window, the integer-exact stand-in for a spectrogram
    * column. Bounds: |X[k]| ≤ win·2^15, so a band sum fits a Long for
    * any win ≤ 2^16. */
  final case class WalshWin(win_idx: Int, band0: Long, band1: Long,
      band2: Long, band3: Long)
  def wavWalshBands(samples: Array[Short], win: Int): Seq[WalshWin] = {
    require(win >= 4 && (win & (win - 1)) == 0,
      s"window must be a power of two >= 4, got $win")
    val nWin = samples.length / win
    (0 until nWin).map { w =>
      val sp = walshTransform(
        Array.tabulate(win)(i => samples(w * win + i).toLong))
      val q = win / 4
      def band(b: Int): Long = {
        var e = 0L; var i = b * q
        while (i < (b + 1) * q) { e += sp(i) * sp(i); i += 1 }
        e
      }
      WalshWin(w, band(0), band(1), band(2), band(3))
    }
  }

  /** Decode a WAV blob and spectrum-window it — the m5 kernel. */
  val wavWalshUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((blob: Array[Byte], win: Int) =>
      wavWalshBands(monoSamples(wavDecode(blob)), win))

  /** Decoded header + windowed stats in one pass (one decode). */
  final case class WavStats(n_samples: Long, sample_rate: Int,
      wins: Seq[WinStat])

  /** Synthesize a WAV blob from the pure-arithmetic PCM formula
    * sample(i) = ((id·37 + i·193) mod 4096) − 2048 — integer math the
    * DuckDB oracle reproduces exactly, which makes the FULL
    * encode→decode→feature path hash-checkable (m4): a header or
    * framing bug would shift every downstream energy. */
  val synthWavUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((mediaId: Long, ns: Int) =>
      wavEncodePcm16(Array.tabulate(ns)(i =>
        (((mediaId * 37L + i.toLong * 193L) % 4096L) - 2048L).toShort),
        16000))

  /** Decode a WAV blob and window it — the audio feature kernel. */
  val wavStatsUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((blob: Array[Byte], win: Int) => {
      val w = wavDecode(blob)
      val mono = monoSamples(w)
      WavStats(mono.length.toLong, w.sampleRate,
        wavWindowStats(mono, win))
    })

  /** Burst-gated variant of [[synthWavUdf]] for VAD testing: frame f
    * (40 samples) is ACTIVE iff (id·7 + f·13) mod 5 ≥ 2 — active
    * frames carry the full ±2048 pseudo-noise, silent frames a ±32
    * residual (≈4000× energy ratio), giving variable-length speech
    * bursts from pure integer math the oracle reproduces. */
  val synthBurstWavUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((mediaId: Long, ns: Int) =>
      wavEncodePcm16(Array.tabulate(ns) { i =>
        val frame = i / 40
        val base = mediaId * 37L + i.toLong * 193L
        val active = (mediaId * 7L + frame.toLong * 13L) % 5L >= 2L
        (if (active) (base % 4096L) - 2048L
         else (base % 64L) - 32L).toShort
      }, 16000))

  /** Energy-threshold voice-activity segmentation: decode the WAV,
    * window into `win`-sample frames (the m4 kernel), keep frames with
    * energy > threshold, and collapse consecutive active frames into
    * segments via gaps-and-islands (frame_idx − row_number per media).
    * Emits (media_id, start_frame, end_frame, n_frames, energy_sum) —
    * the speech-segment manifest an ASR-data pipeline cuts clips from.
    *
    * Scale shape: decode + framing are per-row; the islands window is
    * keyed by media (frames-per-clip bounded), never global. */
  def vadSegments(df: DataFrame, idCol: Column, blobCol: Column,
      win: Int, threshold: Long): DataFrame = {
    val frames = df
      .select(idCol.as("media_id"), wavStatsUdf(blobCol, lit(win)).as("st"))
      .select(col("media_id"), posexplode(col("st.wins"))
        .as(Seq("frame_idx", "w")))
      .select(col("media_id"), col("frame_idx").cast("long").as("frame_idx"),
        col("w.energy").as("energy"))
    val wOrd = Window.partitionBy(col("media_id")).orderBy(col("frame_idx"))
    frames.filter(col("energy") > threshold)
      .withColumn("grp", col("frame_idx") - row_number().over(wOrd))
      .groupBy(col("media_id"), col("grp"))
      .agg(min(col("frame_idx")).as("start_frame"),
        max(col("frame_idx")).as("end_frame"),
        count(lit(1)).as("n_frames"),
        sum(col("energy")).as("energy_sum"))
      .drop("grp")
  }

  // ———— AVI video container — REAL, pure JVM (the RIFF chunk-walk
  // discipline of [[wavDecode]] applied to the video lane) ————

  /** Parsed AVI main header: frame geometry and count from `avih`,
    * the stream's fourcc from `strh` ('MJPG' for motion-JPEG, the
    * empty/zero fourcc for uncompressed BI_RGB DIB frames). */
  final case class AviMeta(width: Int, height: Int, nFrames: Int,
      usPerFrame: Int, fourcc: String)

  private def fcc(s: String): Array[Byte] = s.getBytes("US-ASCII")

  /** Encode frames into a minimal spec-correct AVI container:
    * RIFF('AVI ') → LIST('hdrl'){avih, LIST('strl'){strh, strf}} →
    * LIST('movi'){'00dc' frames, word-aligned} → 'idx1'. Frames are
    * opaque payloads: complete JPEGs for fourcc "MJPG" (the motion-
    * JPEG layout, each frame decodable by the S3 image kernel), or
    * raw bottom-up BGR DIB rasters (rows padded to 4 bytes) for
    * fourcc "" / BI_RGB. */
  def aviEncode(frames: Seq[Array[Byte]], w: Int, h: Int, fps: Int,
      fourcc: String): Array[Byte] = {
    require(frames.nonEmpty && w > 0 && h > 0 && fps > 0,
      s"need frames/w/h/fps positive, got ${frames.length}/$w/$h/$fps")
    val paddedLens = frames.map(f => f.length + (f.length & 1))
    val moviSize = 4 + paddedLens.map(_ + 8).sum
    val idx1Size = frames.length * 16
    val hdrlSize = 4 + (8 + 56) + (8 + 4 + (8 + 56) + (8 + 40))
    val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize) + (8 + idx1Size)
    val buf = java.nio.ByteBuffer.allocate(8 + riffSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put(fcc("RIFF")).putInt(riffSize).put(fcc("AVI "))
    buf.put(fcc("LIST")).putInt(hdrlSize).put(fcc("hdrl"))
    buf.put(fcc("avih")).putInt(56)
      .putInt(1000000 / fps).putInt(0).putInt(0).putInt(0)
      .putInt(frames.length).putInt(0).putInt(1).putInt(0)
      .putInt(w).putInt(h)
      .putInt(0).putInt(0).putInt(0).putInt(0)
    buf.put(fcc("LIST")).putInt(4 + (8 + 56) + (8 + 40))
      .put(fcc("strl"))
    buf.put(fcc("strh")).putInt(56)
      .put(fcc("vids"))
      .put(if (fourcc.length == 4) fcc(fourcc)
           else Array[Byte](0, 0, 0, 0))
      .putInt(0).putShort(0).putShort(0).putInt(0)
      .putInt(1).putInt(fps).putInt(0).putInt(frames.length)
      .putInt(0).putInt(-1).putInt(0)
      .putShort(0).putShort(0).putShort(w.toShort).putShort(h.toShort)
    buf.put(fcc("strf")).putInt(40)
      .putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      .put(if (fourcc == "MJPG") fcc("MJPG")
           else Array[Byte](0, 0, 0, 0)) // biCompression (BI_RGB = 0)
      .putInt(h * ((w * 3 + 3) & ~3)).putInt(0).putInt(0)
      .putInt(0).putInt(0)
    buf.put(fcc("LIST")).putInt(moviSize).put(fcc("movi"))
    val offsets = new Array[Int](frames.length)
    var off = 4 // idx1 offsets are relative to the 'movi' fourcc
    for ((f, i) <- frames.zipWithIndex) {
      offsets(i) = off
      buf.put(fcc("00dc")).putInt(f.length).put(f)
      if ((f.length & 1) == 1) buf.put(0.toByte)
      off += 8 + f.length + (f.length & 1)
    }
    buf.put(fcc("idx1")).putInt(idx1Size)
    for ((f, i) <- frames.zipWithIndex)
      buf.put(fcc("00dc")).putInt(0x10) // AVIIF_KEYFRAME
        .putInt(offsets(i)).putInt(f.length)
    buf.array()
  }

  /** True iff the blob starts with a RIFF/'AVI ' signature. */
  def isAvi(blob: Array[Byte]): Boolean =
    blob != null && blob.length >= 12 &&
      blob(0) == 'R' && blob(1) == 'I' && blob(2) == 'F' &&
      blob(3) == 'F' && blob(8) == 'A' && blob(9) == 'V' &&
      blob(10) == 'I' && blob(11) == ' '

  /** Walk an AVI container and return (meta, frame payloads in movi
    * order). Same hardened chunk discipline as [[wavDecode]]: sizes
    * are corruption-controlled, so every advance is bounds-checked
    * and word-aligned per the RIFF spec; '00dc'/'00db' chunks are
    * frames, everything else (including the optional idx1 and any
    * JUNK padding) is skipped by declared size. */
  def aviDecode(blob: Array[Byte]): (AviMeta, Seq[Array[Byte]]) = {
    require(isAvi(blob), "not a RIFF/AVI blob")
    val buf = java.nio.ByteBuffer.wrap(blob)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var width = -1; var height = -1; var nFrames = -1
    var usPerFrame = -1; var fourccS = ""
    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    def tag4(): String = new String(Array(buf.get(), buf.get(),
      buf.get(), buf.get()).map(_.toChar))
    def walk(end: Int): Unit = {
      while (buf.position() + 8 <= end) {
        val tag = tag4()
        val size = buf.getInt()
        require(size >= 0 && buf.position() + size <= end,
          s"malformed chunk '$tag': size $size at ${buf.position()}")
        val next = buf.position() + size + (size & 1)
        tag match {
          case "LIST" =>
            tag4() // list type ('hdrl'/'strl'/'movi'/…): recurse
            walk(buf.position() + size - 4)
          case "avih" =>
            require(size >= 40, s"avih too short: $size")
            usPerFrame = buf.getInt()
            buf.getInt(); buf.getInt(); buf.getInt()
            nFrames = buf.getInt()
            buf.getInt(); buf.getInt(); buf.getInt()
            width = buf.getInt(); height = buf.getInt()
          case "strh" =>
            require(size >= 8, s"strh too short: $size")
            val t = tag4()
            val h = tag4()
            if (t == "vids" && h.trim.nonEmpty && h != "    ")
              fourccS = h
          case "00dc" | "00db" =>
            val f = new Array[Byte](size)
            buf.get(f)
            frames += f
          case _ => () // strf/idx1/JUNK/…: skip by size
        }
        buf.position(next)
      }
    }
    buf.position(12)
    walk(blob.length)
    require(width > 0 && height > 0 && nFrames >= 0,
      "no avih header found")
    (AviMeta(width, height, nFrames, usPerFrame, fourccS), frames.toSeq)
  }

  /** Decode one raw BI_RGB DIB frame (bottom-up BGR rows, 4-byte row
    * padding — the uncompressed-AVI payload) to the kernel image
    * layout (row-major RGB floats in [0,1], top-down). */
  def dibDecode(frame: Array[Byte], w: Int, h: Int): ImageKernels.Img = {
    val rowBytes = (w * 3 + 3) & ~3
    require(frame.length >= rowBytes * h,
      s"DIB frame too short: ${frame.length} for ${w}x$h")
    val out = new Array[Float](h * w * 3)
    var y = 0
    while (y < h) {
      val src = (h - 1 - y) * rowBytes // bottom-up
      var x = 0
      while (x < w) {
        val b = src + x * 3
        val dst = (y * w + x) * 3
        out(dst) = (frame(b + 2) & 0xff) / 255f     // R
        out(dst + 1) = (frame(b + 1) & 0xff) / 255f // G
        out(dst + 2) = (frame(b) & 0xff) / 255f     // B
        x += 1
      }
      y += 1
    }
    ImageKernels.Img(out, h, w, 3)
  }

  /** Route one AVI frame payload to its decoder: JPEG/PNG magic →
    * the S3 image kernel (the MJPG path); otherwise raw DIB. */
  def decodeAviFrame(frame: Array[Byte], w: Int,
      h: Int): ImageKernels.Img =
    if (frame.length >= 2 && (frame(0) & 0xff) == 0xff &&
        (frame(1) & 0xff) == 0xd8) ImageKernels.decode(frame)
    else if (frame.length >= 4 && (frame(0) & 0xff) == 0x89 &&
        frame(1) == 'P' && frame(2) == 'N' && frame(3) == 'G')
      ImageKernels.decode(frame)
    else dibDecode(frame, w, h)

  /** Exact integer pixel-byte sum of a raw DIB frame (BGR bytes over
    * the true pixel area, padding excluded) — the bit-deterministic
    * per-frame feature the m10 oracle reproduces from the generating
    * formula, the video twin of the m4 energy discipline. */
  def dibPixelSum(frame: Array[Byte], w: Int, h: Int): Long = {
    val rowBytes = (w * 3 + 3) & ~3
    require(frame.length >= rowBytes * h,
      s"DIB frame too short: ${frame.length} for ${w}x$h")
    var s = 0L
    var y = 0
    while (y < h) {
      var i = y * rowBytes
      val end = i + w * 3
      while (i < end) { s += (frame(i) & 0xff); i += 1 }
      y += 1
    }
    s
  }

  /** Synthesize an AVI blob of `nf` raw-DIB gray frames from the pure
    * integer formula pix(id, f, p) = (id·31 + f·17 + p·7) mod 256 —
    * the m4 synth discipline on the video lane: the FULL
    * encode→container-walk→frame-decode→feature path becomes
    * hash-checkable, since the oracle recomputes features straight
    * from the formula. */
  val synthAviUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((mediaId: Long, nf: Int, w: Int, h: Int) => {
      val rowBytes = (w * 3 + 3) & ~3
      val frames = (0 until nf).map { f =>
        val frame = new Array[Byte](rowBytes * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val p = (h - 1 - y) * w + x // bottom-up: row y holds pixel row h-1-y
            val v = ((mediaId * 31L + f.toLong * 17L + p.toLong * 7L)
              % 256L).toByte
            val b = y * rowBytes + x * 3
            frame(b) = v; frame(b + 1) = v; frame(b + 2) = v
            x += 1
          }
          y += 1
        }
        frame
      }
      aviEncode(frames, w, h, fps = 25, fourcc = "")
    })

  /** Every-Nth-frame sampling over an AVI binary column — m3's
    * sampling semantics lifted from byte windows to REAL container
    * frames: walk the container once per row, keep frame_idx ≡ 0
    * (mod everyNth) up to maxFrames, and emit exact integer pixel
    * sums per kept frame. Scale shape: per-row kernel + bounded
    * posexplode, no shuffle — identical to [[sampleFrames]]. */
  def sampleAviFrames(df: DataFrame, idCol: Column, blobCol: Column,
      everyNth: Int, maxFrames: Int): DataFrame = {
    require(everyNth > 0 && maxFrames > 0,
      s"everyNth=$everyNth maxFrames=$maxFrames")
    val kernel = udf((blob: Array[Byte]) => {
      val (meta, frames) = aviDecode(blob)
      val kept = frames.zipWithIndex
        .filter(_._2 % everyNth == 0).take(maxFrames)
      (meta.width, meta.height, meta.nFrames,
        kept.map { case (f, i) =>
          (i.toLong, f.length.toLong,
            dibPixelSum(f, meta.width, meta.height))
        })
    })
    df.select(idCol.as("media_id"), kernel(blobCol).as("v"))
      .select(col("media_id"),
        col("v._1").as("width"), col("v._2").as("height"),
        col("v._3").cast("long").as("n_frames"),
        explode(col("v._4")).as("fr"))
      .select(col("media_id"), col("width"), col("height"),
        col("n_frames"), col("fr._1").as("frame_idx"),
        col("fr._2").as("frame_len"), col("fr._3").as("pix_sum"))
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
              case "audio" if isWav(blob) =>
                // REAL path: RIFF/WAVE decode, per-window RMS
                try {
                  val mono = monoSamples(wavDecode(blob))
                  val win = math.max(1, mono.length / 16)
                  wavWindowStats(mono, win).map(s =>
                    math.sqrt(s.energy.toDouble / win).toFloat).toArray
                } catch { case _: Exception => null }
              case "video" if isAvi(blob) =>
                // REAL path: AVI container walk, first frame through
                // the image kernel chain (MJPG via JPEG decode, raw
                // via DIB), 8×8 luminance — same feature shape as the
                // image modality
                try {
                  val (meta, frames) = aviDecode(blob)
                  val img = ImageKernels.resizeBilinear(
                    decodeAviFrame(frames.head, meta.width,
                      meta.height), 8, 8)
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
              case _ => null // unknown modality/container: no feature
            }
            Row(id, modality, blob.length.toLong, feat)
          }
        }
      }
    spark.createDataFrame(outRows, featureSchema)
  }
}
