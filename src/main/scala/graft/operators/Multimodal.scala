package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: treat image/audio/video payloads as opaque
  * `binary` columns with a typed metadata struct, and run decode /
  * feature-extract steps as partition-batched transforms.
  *
  * Image payloads are decoded for real with the JDK's own codecs
  * (`javax.imageio` ships PNG/JPEG/BMP/GIF readers — no external
  * dependency): width/height, exact integer mean luminance, and an 8-bin
  * luminance histogram feature. Audio payloads are decoded for real via
  * `javax.sound.sampled` (WAV/AIFF/AU PCM): sample rate, channels, frame
  * count, integer RMS. Video is decoded for real through two STANDARD
  * containers — uncompressed-DIB RIFF/AVI (`decodeAviFrames`, a full
  * chunk-grammar parse of the Microsoft RIFF AVI layout) and animated
  * GIF (`decodeGifFrames`, the JDK's own multi-frame codec) — plus the
  * in-repo GRV1 raw-frame interchange kept for the generic `decode()`
  * dispatch; any other video type, and any payload a codec rejects,
  * falls back to the clearly-marked deterministic `stubDecode`.
  * Compressed codecs (H.264 etc.) are explicitly out of engine scope:
  * at the ingest edge a production pipeline transcodes to raw frames
  * before feature extraction, and that transcode is an external tool's
  * job, not a query engine's.
  *
  * Scale notes: `mapPartitions` keeps per-batch codec state (decoder
  * initialized once per partition, not per row); the payload column stays
  * unprojected until the decode step, so column pruning keeps it off
  * every other operator's scan.
  */
object Multimodal {

  /** Metadata struct carried alongside every binary payload. */
  val mediaMetaType: StructType = StructType(Seq(
    StructField("media_type", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("digest", StringType, nullable = false)))

  val mediaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", mediaMetaType, nullable = false)))

  /** Wrap a text corpus as a binary media table (documents stand in for
    * undecodable payloads in this environment): payload = utf-8 bytes,
    * metadata derived in-plan (codegen'd, no UDF).
    */
  def asMediaTable(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    docs.select(
      col(idCol).cast("long").as("doc_id"),
      encode(col(textCol), "UTF-8").as("payload"),
      struct(
        lit("text/plain").as("media_type"),
        octet_length(col(textCol)).cast("long").as("n_bytes"),
        md5(col(textCol)).as("digest")).as("meta"))

  /** Extracted per-media features. */
  case class MediaFeatures(
      doc_id: Long,
      media_type: String,
      n_bytes: Long,
      width: Int,
      height: Int,
      frames: Int,
      mean_luma: Int,
      feature: Array[Float])

  /** One decoded payload: dimensions, frame count, exact integer mean
    * luminance (sum of per-pixel `(299r+587g+114b)/1000`, integer-divided
    * by pixel count — integer-valued end to end so it survives any
    * cross-engine rounding), and an 8-bin normalized luminance histogram.
    */
  case class Decoded(width: Int, height: Int, frames: Int, mean_luma: Int,
      feature: Array[Float])

  /** STUB decode: a real implementation would hand `bytes` to a codec.
    * Here it derives deterministic pseudo-dimensions and an 8-dim
    * byte-histogram feature so the pipeline shape is exercised end to
    * end. Marked clearly as a stand-in — used only for media types the
    * JVM has no codec for (see [[decode]]).
    */
  def stubDecode(bytes: Array[Byte]): (Int, Int, Int, Array[Float]) = {
    // stand-in for codec-less media types (audio PCM / video frame
    // sampling); image/* payloads take the real ImageIO path in decode()
    if (bytes == null || bytes.isEmpty) (0, 0, 0, Array.fill(8)(0f))
    else {
      val w = 16 + (bytes.length % 64)
      val h = 16 + ((bytes.length / 64) % 64)
      val hist = new Array[Float](8)
      var i = 0
      while (i < bytes.length) {
        hist((bytes(i) & 0xff) >> 5) += 1f
        i += 1
      }
      var b = 0
      while (b < 8) { hist(b) /= bytes.length; b += 1 }
      (w, h, 1, hist)
    }
  }

  /** Real image decode via the JDK's bundled readers (PNG/JPEG/BMP/GIF).
    * None when the payload is empty or no installed reader accepts it.
    */
  def decodeImage(bytes: Array[Byte]): Option[Decoded] = {
    if (bytes == null || bytes.isEmpty) return None
    // the try spans ONLY the codec call: ImageIO readers throw runtime
    // exceptions on malformed payloads (negative allocations from forged
    // dimensions, index errors in truncated frames), and any of them
    // must mean "codec rejected the bytes" — but a bug in our own
    // feature math below must stay a visible failure, not a silent
    // stub fallback
    val decoded =
      try Option(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes)))
      catch { case scala.util.control.NonFatal(_) => None }
    decoded.map { img =>
      val w = img.getWidth
      val h = img.getHeight
      // one bulk ARGB transfer instead of per-pixel getRGB calls
      val px = img.getRGB(0, 0, w, h, null, 0, w)
      val hist = new Array[Float](8)
      var lumaSum = 0L
      var i = 0
      while (i < px.length) {
        val rgb = px(i)
        val luma = (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff)
          + 114 * (rgb & 0xff)) / 1000
        hist(luma >> 5) += 1f
        lumaSum += luma
        i += 1
      }
      val n = w.toLong * h
      var b = 0
      while (b < 8) { hist(b) /= n; b += 1 }
      Decoded(w, h, 1, (lumaSum / n).toInt, hist)
    }
  }

  /** Decoded audio stats — all integer-valued so a SQL oracle can
    * recompute them closed-form for synthetic signals (see
    * [[syntheticWavTable]]): for a ±A square wave every sample squares
    * to A², so the RMS is exactly A.
    */
  case class AudioDecoded(sampleRate: Int, channels: Int, nSamples: Long,
      rms: Long, feature: Array[Float])

  /** Real audio decode via the JDK's bundled `javax.sound.sampled`
    * codecs (WAV/AIFF/AU). Supports 16-bit signed PCM, any channel
    * count and endianness; None when the payload is empty, no installed
    * reader accepts it, or the encoding isn't 16-bit PCM.
    *
    * `nSamples` counts sample FRAMES; `rms` is the root-mean-square over
    * all interleaved channel samples, rounded to the nearest integer
    * (exact for the synthetic square-wave fixtures: sumSq = n·A² is a
    * perfect square over n). The feature is an 8-bin normalized
    * histogram of |sample| (bin = |s| >> 12, the audio twin of the image
    * path's luminance histogram).
    */
  def decodeAudio(bytes: Array[Byte]): Option[AudioDecoded] = {
    if (bytes == null || bytes.isEmpty) return None
    val ais =
      try javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      catch { case scala.util.control.NonFatal(_) => return None }
    try {
      val fmt = ais.getFormat
      if (fmt.getEncoding !=
            javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
          fmt.getSampleSizeInBits != 16) return None
      val raw =
        try ais.readAllBytes()
        catch { case scala.util.control.NonFatal(_) => return None }
      val ch = fmt.getChannels
      val big = fmt.isBigEndian
      val total = raw.length / 2 // 16-bit samples across all channels
      if (total == 0)
        return Some(AudioDecoded(fmt.getSampleRate.toInt, ch, 0L, 0L,
          Array.fill(8)(0f)))
      // Long sum of squares: exact up to ~8.6e9 samples (x² <= 2^30) —
      // far past any per-row payload this operator should see
      var sumSq = 0L
      val hist = new Array[Float](8)
      var i = 0
      while (i < total) {
        val lo = raw(2 * i) & 0xff
        val hi = raw(2 * i + 1) & 0xff
        val s = (if (big) (lo << 8) | hi else (hi << 8) | lo).toShort.toInt
        sumSq += s.toLong * s
        hist(math.min(math.abs(s) >> 12, 7)) += 1f
        i += 1
      }
      var b = 0
      while (b < 8) { hist(b) /= total; b += 1 }
      val rms = math.rint(math.sqrt(sumSq.toDouble / total)).toLong
      Some(AudioDecoded(fmt.getSampleRate.toInt, ch, total.toLong / ch,
        rms, hist))
    } finally ais.close()
  }

  /** 16-bit mono PCM square wave (+A/−A alternating per sample) encoded
    * through the actual JDK WAV writer. Every sample squares to A², so
    * RMS == A exactly — the closed form the q65 oracle recomputes.
    */
  def encodeWav(nSamples: Int, amplitude: Int,
      sampleRate: Int = 8000): Array[Byte] = {
    require(amplitude >= 0 && amplitude <= Short.MaxValue,
      s"amplitude in [0, 32767]: $amplitude")
    val fmt = new javax.sound.sampled.AudioFormat(
      sampleRate.toFloat, 16, 1, true, false)
    val raw = new Array[Byte](nSamples * 2)
    var i = 0
    while (i < nSamples) {
      val s = if (i % 2 == 0) amplitude else -amplitude
      raw(2 * i) = (s & 0xff).toByte
      raw(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(raw), fmt, nSamples.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    try javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    finally ais.close()
    bos.toByteArray
  }

  /** Deterministic real-WAV media table derived from the fixture docs:
    * per doc, a square wave whose frame count and amplitude are
    * closed-form functions of doc_id (n = 800 + id%800 frames at 8 kHz,
    * A = 1 + id%30000), encoded through the actual JDK WAV writer — the
    * audio twin of [[syntheticPngTable]], so a SQL oracle can recompute
    * everything the real decoder must report.
    */
  def syntheticWavTable(docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.util.Spread.cpuBoundDs(docs
      .select(col(idCol).cast("long").as("doc_id"))
      .as[Long])
      .mapPartitions { ids =>
        ids.map { id =>
          val n = 800 + (id % 800).toInt
          val a = 1 + (id % 30000).toInt
          (id, encodeWav(n, a))
        }
      }
      .toDF("doc_id", "payload")
      .select(
        col("doc_id"),
        col("payload"),
        struct(
          lit("audio/wav").as("media_type"),
          octet_length(col("payload")).cast("long").as("n_bytes"),
          md5(col("payload")).as("digest")).as("meta"))
  }

  /** Partition-batched audio decode: one codec context per partition,
    * rows streamed through the real [[decodeAudio]] path. `duration_ms`
    * is integer-divided (frames·1000/rate) so any SQL engine recomputes
    * it exactly.
    */
  def audioFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, payload) =>
          val d = decodeAudio(payload)
            .getOrElse(AudioDecoded(0, 0, 0L, 0L, Array.fill(8)(0f)))
          val durMs =
            if (d.sampleRate > 0) d.nSamples * 1000L / d.sampleRate else 0L
          (id, d.sampleRate, d.channels, d.nSamples, durMs, d.rms)
        }
      }
      .toDF("doc_id", "sample_rate", "channels", "n_samples",
        "duration_ms", "rms")
  }

  /** Decode dispatch: image payloads go through the real [[decodeImage]]
    * codec path, audio through the real [[decodeAudio]] path, and
    * `video/grv` through the real [[decodeVideo]] container parse (stub
    * fallback only if the codec rejects the bytes); any OTHER video
    * container — the media family the JDK has no codec for — takes
    * [[stubDecode]] with the mean unsigned byte standing in for mean
    * luminance.
    *
    * Audio stats map onto the generic [[Decoded]] struct as: width →
    * sample rate, height → channel count, frames → sample frames,
    * mean_luma → integer RMS (documented here because [[MediaFeatures]]
    * keeps one schema across media families; [[audioFeatures]] is the
    * honestly-named audio surface).
    */
  def decode(mediaType: String, bytes: Array[Byte]): Decoded = {
    def stub: Decoded = {
      val (w, h, fr, feat) = stubDecode(bytes)
      val mean =
        if (bytes == null || bytes.isEmpty) 0
        else {
          var s = 0L; var i = 0
          while (i < bytes.length) { s += bytes(i) & 0xff; i += 1 }
          (s / bytes.length).toInt
        }
      Decoded(w, h, fr, mean, feat)
    }
    if (mediaType == null) stub
    else if (mediaType.startsWith("image/")) decodeImage(bytes).getOrElse(stub)
    else if (mediaType.startsWith("audio/"))
      decodeAudio(bytes)
        .map(a => Decoded(a.sampleRate, a.channels,
          math.min(a.nSamples, Int.MaxValue.toLong).toInt,
          math.min(a.rms, Int.MaxValue.toLong).toInt, a.feature))
        .getOrElse(stub)
    else if (mediaType == "video/grv") decodeVideo(bytes).getOrElse(stub)
    else stub
  }

  /** Partition-batched decode + feature extraction: one decoder context
    * per partition, rows streamed through it.
    */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .select(col("doc_id"), col("payload"), col("meta.media_type"),
        col("meta.n_bytes"))
      .as[(Long, Array[Byte], String, Long)]
      .mapPartitions { rows =>
        // ImageIO reader discovery happens once per JVM; per-partition
        // decoder state (e.g. a reusable native context) would init here
        rows.map { case (id, payload, mt, nb) =>
          val d = decode(mt, payload)
          MediaFeatures(id, mt, nb, d.width, d.height, d.frames,
            d.mean_luma, d.feature)
        }
      }
  }

  /** Deterministic real-PNG media table derived from the fixture docs:
    * per doc, a solid-gray image whose dimensions and gray level are
    * closed-form functions of doc_id (width 16+id%48, height 16+id%31,
    * gray id%256), encoded through the actual ImageIO PNG writer. Solid
    * gray makes mean luminance exactly the gray level, so a SQL oracle
    * can recompute everything the real decoder must report.
    */
  def syntheticPngTable(docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.util.Spread.cpuBoundDs(docs
      .select(col(idCol).cast("long").as("doc_id"))
      .as[Long])
      .mapPartitions { ids =>
        ids.map { id =>
          val w = 16 + (id % 48).toInt
          val h = 16 + (id % 31).toInt
          val g = (id % 256).toInt
          (id, encodePng(w, h, g))
        }
      }
      .toDF("doc_id", "payload")
      .select(
        col("doc_id"),
        col("payload"),
        struct(
          lit("image/png").as("media_type"),
          octet_length(col("payload")).cast("long").as("n_bytes"),
          md5(col("payload")).as("digest")).as("meta"))
  }

  /** Solid-gray PNG bytes via the JDK encoder (headless-safe). */
  def encodePng(width: Int, height: Int, gray: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (gray << 16) | (gray << 8) | gray
    val px = new Array[Int](width * height)
    java.util.Arrays.fill(px, rgb)
    img.setRGB(0, 0, width, height, px, 0, width)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Patterned gray PNG: gray(x, y) = (a·x + b·y) mod 256, with an
    * optional sparse perturbation (+16 on every 37th pixel) for
    * constructing near-duplicate twins whose perceptual hash stays
    * within a few bits. JDK encoder, headless-safe.
    */
  def encodePatternPng(width: Int, height: Int, a: Int, b: Int,
      noise: Boolean): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val px = new Array[Int](width * height)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val i = y * width + x
        var g = (a * x + b * y) % 256
        if (noise && i % 37 == 0) g = math.min(255, g + 16)
        px(i) = (g << 16) | (g << 8) | g
        x += 1
      }
      y += 1
    }
    img.setRGB(0, 0, width, height, px, 0, width)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** 64-bit average-hash (aHash) of an image payload — the classic
    * perceptual fingerprint LAION-scale image dedup starts from: decode,
    * block-average the luminance onto an 8×8 grid (exact integer sums
    * over each cell — no resampling library, no float drift), then one
    * bit per cell: 1 iff the cell is strictly brighter than the 64-cell
    * mean. Deterministic for a given payload; decode failures are None.
    */
  def perceptualHash(bytes: Array[Byte]): Option[Long] = {
    if (bytes == null || bytes.isEmpty) return None
    val decoded = // same codec-only exception scope as decodeImage
      try Option(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes)))
      catch { case scala.util.control.NonFatal(_) => None }
    decoded.map { img =>
      val w = img.getWidth
      val h = img.getHeight
      val px = img.getRGB(0, 0, w, h, null, 0, w)
      val cells = new Array[Long](64)
      val counts = new Array[Long](64)
      var y = 0
      while (y < h) {
        val cy = math.min(7, y * 8 / h)
        var x = 0
        while (x < w) {
          val cx = math.min(7, x * 8 / w)
          val rgb = px(y * w + x)
          // integer luminance, same weights as decodeImage's features
          val lum = (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff)
            + 114 * (rgb & 0xff)) / 1000
          cells(cy * 8 + cx) += lum
          counts(cy * 8 + cx) += 1
          x += 1
        }
        y += 1
      }
      val avgs = Array.tabulate(64)(i =>
        if (counts(i) == 0) 0L else cells(i) / counts(i))
      val mean = avgs.sum / 64
      avgs.zipWithIndex.foldLeft(0L) { case (acc, (v, i)) =>
        if (v > mean) acc | (1L << i) else acc
      }
    }
  }

  /** Image near-duplicate pairs by perceptual-hash Hamming distance ≤
    * `maxDist`: one map-only decode+hash pass (localCheckpoint'ed so
    * both sides of the candidate join reuse it), then the shared
    * pigeonhole pairer [[Dedup.hammingPairs]].
    */
  def imageDupPairs(media: DataFrame, maxDist: Int = 6,
      idCol: String = "doc_id",
      payloadCol: String = "payload"): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val hashes = media
      .select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        perceptualHash(bytes).map(id -> _)
      })
      .toDF("id", "hash")
      .localCheckpoint(true)
    Dedup.hammingPairs(hashes, maxDist)
  }

  /** 64-bit audio fingerprint: the energy-envelope hash (the shape a
    * Shazam-style landmark scheme reduces to for coarse dedup) — decode
    * 16-bit PCM, split the samples into 64 equal frames, exact integer
    * mean |sample| per frame, one bit per frame: 1 iff the frame is
    * strictly louder than the whole clip's mean frame energy.
    * Deterministic per payload; non-PCM-16 or undecodable payloads are
    * None (same codec hygiene as [[decodeAudio]]).
    */
  def audioFingerprint(bytes: Array[Byte]): Option[Long] = {
    if (bytes == null || bytes.isEmpty) return None
    val ais =
      try javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      catch { case scala.util.control.NonFatal(_) => return None }
    try {
      val fmt = ais.getFormat
      if (fmt.getEncoding !=
            javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
          fmt.getSampleSizeInBits != 16) return None
      val raw =
        try ais.readAllBytes()
        catch { case scala.util.control.NonFatal(_) => return None }
      val big = fmt.isBigEndian
      val total = raw.length / 2
      if (total < 64) return None // too short for a 64-frame envelope
      val sums = new Array[Long](64)
      val counts = new Array[Long](64)
      var i = 0
      while (i < total) {
        val lo = raw(2 * i) & 0xff
        val hi = raw(2 * i + 1) & 0xff
        val s = (if (big) (lo << 8) | hi else (hi << 8) | lo).toShort.toInt
        val f = math.min(63, i * 64 / total)
        sums(f) += math.abs(s)
        counts(f) += 1
        i += 1
      }
      val frames = Array.tabulate(64)(f =>
        if (counts(f) == 0) 0L else sums(f) / counts(f))
      val mean = frames.sum / 64
      Some(frames.zipWithIndex.foldLeft(0L) { case (acc, (v, f)) =>
        if (v > mean) acc | (1L << f) else acc
      })
    } finally ais.close()
  }

  /** Audio near-duplicate pairs by fingerprint Hamming distance —
    * identical machinery to [[imageDupPairs]], over
    * [[audioFingerprint]].
    */
  def audioDupPairs(media: DataFrame, maxDist: Int = 6,
      idCol: String = "doc_id",
      payloadCol: String = "payload"): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val hashes = media
      .select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        audioFingerprint(bytes).map(id -> _)
      })
      .toDF("id", "hash")
      .localCheckpoint(true)
    Dedup.hammingPairs(hashes, maxDist)
  }

  /** 16-bit mono PCM wave with a per-frame amplitude ENVELOPE (64
    * frames of `frameLen` samples; frame f's square-wave amplitude =
    * 500 + ((a·f + b) mod 29)·1000, with an optional +400 perturbation
    * on every 5th frame for near-duplicate twins) — the patterned-PNG
    * analogue for fingerprint testing: distinct (a, b) give distinct
    * envelopes, a noised twin stays within a few envelope bits.
    */
  def encodeEnvelopeWav(a: Int, b: Int, noise: Boolean,
      frameLen: Int = 40, sampleRate: Int = 8000): Array[Byte] = {
    val n = 64 * frameLen
    val fmt = new javax.sound.sampled.AudioFormat(
      sampleRate.toFloat, 16, 1, true, false)
    val raw = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val f = i / frameLen
      var amp = 500 + ((a * f + b) % 29) * 1000
      if (noise && f % 5 == 0) amp = math.min(Short.MaxValue.toInt, amp + 400)
      val s = if (i % 2 == 0) amp else -amp
      raw(2 * i) = (s & 0xff).toByte
      raw(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(raw), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    try javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    finally ais.close()
    bos.toByteArray
  }

  /** Deterministic "frame sample" over a payload: every strideth byte,
    * standing in for video frame sampling; keeps the batched-binary
    * plumbing honest (offsets, bounds, empty payloads).
    */
  def sampleFrames(media: DataFrame, stride: Int = 1024): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, payload) =>
        if (payload == null) Iterator.empty
        else payload.indices.by(stride).map(off =>
          (id, off, payload(off) & 0xff))
      }
      .toDF("doc_id", "frame_offset", "frame_value")
  }

  // ------------------------------------------------------------------
  // Image resize (thumbnailing for perceptual pipelines)
  // ------------------------------------------------------------------

  /** Exact integer area-average downscale to `tw`×`th`, re-encoded as
    * PNG. Every source pixel lands in exactly ONE target cell (cx =
    * x·tw/w — the same integer binning as [[perceptualHash]]; for tw ≤ w
    * the mapping is surjective, so no cell is empty), and each RGB
    * channel is the floor-divided mean over the cell's pixels — integer
    * end to end, so the result is bit-identical on every JVM (no float
    * resampling kernel, no rounding-mode drift). Solid-color inputs stay
    * solid under ANY correct averaging, which is what gives the q138
    * oracle its closed form.
    *
    * Downscale only by contract: None when either target dimension
    * exceeds the source (an area average with empty cells is undefined),
    * when the payload is empty, or when no installed codec accepts it.
    */
  def resizeImage(bytes: Array[Byte], tw: Int, th: Int): Option[Array[Byte]] = {
    require(tw > 0 && th > 0, s"target dims must be positive: ${tw}x$th")
    if (bytes == null || bytes.isEmpty) return None
    val decoded = // same codec-only exception scope as decodeImage
      try Option(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes)))
      catch { case scala.util.control.NonFatal(_) => None }
    decoded.flatMap { img =>
      val w = img.getWidth
      val h = img.getHeight
      if (tw > w || th > h) None
      else {
        val px = img.getRGB(0, 0, w, h, null, 0, w)
        val n = tw * th
        val rs = new Array[Long](n)
        val gs = new Array[Long](n)
        val bs = new Array[Long](n)
        val cnt = new Array[Long](n)
        var y = 0
        while (y < h) {
          val cy = math.min(th - 1, (y.toLong * th / h).toInt)
          var x = 0
          while (x < w) {
            val cx = math.min(tw - 1, (x.toLong * tw / w).toInt)
            val i = cy * tw + cx
            val rgb = px(y * w + x)
            rs(i) += (rgb >> 16) & 0xff
            gs(i) += (rgb >> 8) & 0xff
            bs(i) += rgb & 0xff
            cnt(i) += 1
            x += 1
          }
          y += 1
        }
        val out = new java.awt.image.BufferedImage(
          tw, th, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val opx = new Array[Int](n)
        var i = 0
        while (i < n) {
          val c = cnt(i) // never 0: the binning is surjective for tw <= w
          opx(i) = (((rs(i) / c).toInt) << 16) |
            (((gs(i) / c).toInt) << 8) | (bs(i) / c).toInt
          i += 1
        }
        out.setRGB(0, 0, tw, th, opx, 0, tw)
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        Some(bos.toByteArray)
      }
    }
  }

  /** Partition-batched resize over a media table: decode → area-average
    * → re-encode, one codec context per partition; payloads the codec
    * rejects (or that are smaller than the target) are dropped rather
    * than passed through mis-sized. Output keeps the standard media
    * schema so every downstream operator (feature extraction,
    * perceptual-hash dedup) composes unchanged on thumbnails.
    */
  def resizeImages(media: DataFrame, targetW: Int, targetH: Int,
      idCol: String = "doc_id",
      payloadCol: String = "payload"): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        resizeImage(bytes, targetW, targetH).map(id -> _)
      })
      .toDF("doc_id", "payload")
      .select(
        col("doc_id"),
        col("payload"),
        struct(
          lit("image/png").as("media_type"),
          octet_length(col("payload")).cast("long").as("n_bytes"),
          md5(col("payload")).as("digest")).as("meta"))
  }

  // ------------------------------------------------------------------
  // Raw-video container (GRV1) + frame sampling
  // ------------------------------------------------------------------
  // The JDK ships no video codec, so video gets a REAL in-repo container
  // instead of a stub: "GRV1" magic, big-endian int32 width / height /
  // frame count, then nFrames contiguous width·height 8-bit grayscale
  // frames. The total length is checked exactly on decode, so truncated
  // payloads and forged headers are rejected, never mis-sliced.

  case class VideoHeader(width: Int, height: Int, nFrames: Int)

  /** Encode grayscale frames into the GRV1 container. */
  def encodeRawVideo(width: Int, height: Int,
      frames: Seq[Array[Byte]]): Array[Byte] = {
    require(width > 0 && height > 0, s"dims must be positive: ${width}x$height")
    // Long arithmetic throughout: w·h for large frames overflows Int,
    // which would corrupt BOTH the per-frame check and the allocation
    val frameLen = width.toLong * height
    val total = 16L + frames.length.toLong * frameLen
    require(total <= Int.MaxValue,
      s"container too large for one payload: $total bytes")
    require(frames.forall(f => f != null && f.length.toLong == frameLen),
      s"every frame must hold exactly $frameLen gray bytes")
    val bb = java.nio.ByteBuffer.allocate(total.toInt)
    bb.put("GRV1".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    bb.putInt(width).putInt(height).putInt(frames.length)
    frames.foreach(bb.put)
    bb.array()
  }

  /** Parse + validate a GRV1 header. None on short payloads, wrong
    * magic, non-positive dimensions, or a length that disagrees with
    * width·height·nFrames (truncated/forged containers).
    */
  def decodeVideoHeader(bytes: Array[Byte]): Option[VideoHeader] = {
    if (bytes == null || bytes.length < 16) return None
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val magic = new Array[Byte](4)
    bb.get(magic)
    if (!java.util.Arrays.equals(magic,
        "GRV1".getBytes(java.nio.charset.StandardCharsets.US_ASCII)))
      return None
    val w = bb.getInt
    val h = bb.getInt
    val nf = bb.getInt
    if (w <= 0 || h <= 0 || nf < 0) return None
    if (bytes.length.toLong != 16L + w.toLong * h * nf) return None
    Some(VideoHeader(w, h, nf))
  }

  /** Whole-clip decode for the generic [[decode]] dispatch: frames =
    * container frame count, mean_luma = exact integer mean gray over
    * every pixel of every frame, feature = the 8-bin gray histogram
    * (bin = gray >> 5, the image path's binning).
    */
  def decodeVideo(bytes: Array[Byte]): Option[Decoded] =
    decodeVideoHeader(bytes).map { hd =>
      val total = bytes.length - 16
      val hist = new Array[Float](8)
      var sum = 0L
      var i = 16
      while (i < bytes.length) {
        val g = bytes(i) & 0xff
        hist(g >> 5) += 1f
        sum += g
        i += 1
      }
      val mean = if (total == 0) 0 else (sum / total).toInt
      var b = 0
      while (b < 8) { hist(b) /= math.max(1, total); b += 1 }
      Decoded(hd.width, hd.height, hd.nFrames, mean, hist)
    }

  /** Deterministic GRV1 media table derived from the fixture docs: per
    * doc, a clip whose dimensions, frame count and per-frame solid gray
    * level are closed-form functions of doc_id (w = 16+id%16,
    * h = 16+id%8, nFrames = 8+id%8, frame f gray = (id+7·f)%256) — the
    * video twin of [[syntheticPngTable]]/[[syntheticWavTable]], so a SQL
    * oracle can recompute everything the frame sampler must report.
    */
  def syntheticVideoTable(docs: DataFrame,
      idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.util.Spread.cpuBoundDs(docs
      .select(col(idCol).cast("long").as("doc_id"))
      .as[Long])
      .mapPartitions { ids =>
        ids.map { id =>
          val w = 16 + (id % 16).toInt
          val h = 16 + (id % 8).toInt
          val nf = 8 + (id % 8).toInt
          val frames = (0 until nf).map { f =>
            val g = ((id + 7L * f) % 256).toByte
            val a = new Array[Byte](w * h)
            java.util.Arrays.fill(a, g)
            a
          }
          (id, encodeRawVideo(w, h, frames))
        }
      }
      .toDF("doc_id", "payload")
      .select(
        col("doc_id"),
        col("payload"),
        struct(
          lit("video/grv").as("media_type"),
          octet_length(col("payload")).cast("long").as("n_bytes"),
          md5(col("payload")).as("digest")).as("meta"))
  }

  /** Real video frame sampling: parse the GRV1 container and emit every
    * `stride`-th frame (indices 0, stride, 2·stride, …) with its exact
    * integer mean gray — ONE flatMap, fan-out bounded per clip by
    * nFrames/stride, payloads the header check rejects dropped. This is
    * the temporal-subsampling step a frame-level perceptual pipeline
    * (dedup, caption alignment) starts from; downstream per-frame
    * operators compose on the emitted rows.
    */
  def videoFrameSample(media: DataFrame, stride: Int = 3,
      idCol: String = "doc_id",
      payloadCol: String = "payload"): DataFrame = {
    require(stride > 0, s"stride must be positive: $stride")
    val spark = media.sparkSession
    import spark.implicits._
    media
      .select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        decodeVideoHeader(bytes).iterator.flatMap { hd =>
          val frameLen = hd.width * hd.height
          (0 until hd.nFrames by stride).iterator.map { f =>
            val off = 16 + f * frameLen
            var sum = 0L
            var i = off
            while (i < off + frameLen) {
              sum += bytes(i) & 0xff
              i += 1
            }
            (id, f, hd.width, hd.height, hd.nFrames,
              (sum / frameLen).toInt)
          }
        }
      })
      .toDF("doc_id", "frame_idx", "width", "height", "n_frames",
        "mean_luma")
  }

  // ------------------------------------------------------------------
  // Animated GIF: the one real multi-frame container the JDK ships a
  // full codec for (ImageIO's "gif" plugin, with sequence write
  // support) — the public-format twin of the bespoke GRV1 path above,
  // so the temporal-subsampling operator is exercised against a format
  // any external tool can produce and inspect.

  /** Encode solid-gray frames as an animated GIF through the standard
    * ImageIO sequence writer. A solid frame is a single palette color,
    * so the palettizing encoder is exactly lossless for this input and
    * the decoded mean luma stays closed-form ((299+587+114)·g / 1000
    * = g).
    */
  def encodeAnimatedGif(width: Int, height: Int,
      grays: Seq[Int]): Array[Byte] = {
    require(width > 0 && height > 0, s"dims must be positive: ${width}x$height")
    require(grays.nonEmpty, "need at least one frame")
    val writers = javax.imageio.ImageIO.getImageWritersByFormatName("gif")
    require(writers.hasNext, "no GIF writer installed")
    val w = writers.next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      w.setOutput(ios)
      w.prepareWriteSequence(null)
      grays.foreach { g =>
        val img = new java.awt.image.BufferedImage(
          width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val rgb = (g & 0xff) * 0x010101
        val px = Array.fill(width * height)(rgb)
        img.setRGB(0, 0, width, height, px, 0, width)
        w.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
      }
      w.endWriteSequence()
    } finally {
      w.dispose()
      ios.close()
    }
    bos.toByteArray
  }

  private def decodedOf(img: java.awt.image.BufferedImage): Decoded = {
    val fw = img.getWidth
    val fh = img.getHeight
    val px = img.getRGB(0, 0, fw, fh, null, 0, fw)
    val hist = new Array[Float](8)
    var lumaSum = 0L
    var i = 0
    while (i < px.length) {
      val rgb = px(i)
      val luma = (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff)
        + 114 * (rgb & 0xff)) / 1000
      hist(luma >> 5) += 1f
      lumaSum += luma
      i += 1
    }
    var b = 0
    while (b < 8) { hist(b) /= px.length; b += 1 }
    Decoded(fw, fh, 1, (lumaSum / px.length).toInt, hist)
  }

  /** Decode every `stride`-th frame of a GIF through the ImageIO
    * reader, returning (total frame count, decoded kept frames with
    * their indices) — skipped frames are never pixel-decoded. None when
    * the codec rejects the payload (same codec-only exception scope as
    * [[decodeImage]]); each frame reports its dimensions and the exact
    * integer 299/587/114 mean luma [[decodeImage]] uses.
    */
  def decodeGifFramesStrided(bytes: Array[Byte],
      stride: Int): Option[(Int, Seq[(Int, Decoded)])] = {
    require(stride > 0, s"stride must be positive: $stride")
    if (bytes == null || bytes.isEmpty) return None
    val readers = javax.imageio.ImageIO.getImageReadersByFormatName("gif")
    if (!readers.hasNext) return None
    val reader = readers.next()
    try {
      val frames =
        try {
          val iis = javax.imageio.ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(bytes))
          reader.setInput(iis, false) // random access: getNumImages needs it
          val n = reader.getNumImages(true)
          if (n <= 0) return None
          (n, (0 until n by stride).map(f => (f, reader.read(f))))
        } catch { case scala.util.control.NonFatal(_) => return None }
      Some((frames._1, frames._2.map { case (f, img) => (f, decodedOf(img)) }))
    } finally reader.dispose()
  }

  /** Parse + decode every frame (spec/round-trip surface). */
  def decodeGifFrames(bytes: Array[Byte]): Option[Seq[Decoded]] =
    decodeGifFramesStrided(bytes, 1).map(_._2.map(_._2))

  /** Deterministic animated-GIF media table — the same closed-form
    * construction as [[syntheticVideoTable]] (w = 16+id%16, h = 16+id%8,
    * nFrames = 8+id%8, frame f solid gray (id+7·f)%256), but encoded
    * through the real public GIF codec instead of the in-repo GRV1
    * container.
    */
  def syntheticGifTable(docs: DataFrame,
      idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.util.Spread.cpuBoundDs(docs
      .select(col(idCol).cast("long").as("doc_id"))
      .as[Long])
      .mapPartitions { ids =>
        ids.map { id =>
          val w = 16 + (id % 16).toInt
          val h = 16 + (id % 8).toInt
          val nf = 8 + (id % 8).toInt
          val grays = (0 until nf).map(f => ((id + 7L * f) % 256).toInt)
          (id, encodeAnimatedGif(w, h, grays))
        }
      }
      .toDF("doc_id", "payload")
      .select(
        col("doc_id"),
        col("payload"),
        struct(
          lit("image/gif").as("media_type"),
          octet_length(col("payload")).cast("long").as("n_bytes"),
          md5(col("payload")).as("digest")).as("meta"))
  }

  /** [[videoFrameSample]] over animated GIFs: decode through the public
    * ImageIO codec, emitting ONLY every `stride`-th frame (skipped
    * frames are never pixel-decoded) with its exact integer mean luma.
    * Payloads the codec rejects are dropped, identical contract to the
    * AVI path — one flatMap, fan-out bounded per clip by nFrames/stride.
    */
  def gifFrameSample(media: DataFrame, stride: Int = 3,
      idCol: String = "doc_id",
      payloadCol: String = "payload"): DataFrame = {
    require(stride > 0, s"stride must be positive: $stride")
    val spark = media.sparkSession
    import spark.implicits._
    media
      .select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        decodeGifFramesStrided(bytes, stride).iterator.flatMap {
          case (nf, kept) =>
            kept.iterator.map { case (f, d) =>
              (id, f, d.width, d.height, nf, d.mean_luma)
            }
        }
      })
      .toDF("doc_id", "frame_idx", "width", "height", "n_frames",
        "mean_luma")
  }

  // ------------------------------------------------------------------
  // RIFF/AVI container (round 13, VERDICT r12 #6): uncompressed 8-bit
  // DIB video in the standard Microsoft RIFF AVI layout — RIFF('AVI ')
  // -> LIST(hdrl){avih, LIST(strl){strh('vids'/'DIB '), strf(BITMAP-
  // INFOHEADER + 256-entry grayscale palette)}} -> LIST(movi){'00db'
  // frames, bottom-up 4-byte-padded rows} -> idx1. Any external tool
  // (ffmpeg, a media player) reads these payloads; the engine's parser
  // walks the real chunk grammar with exact-size validation, so
  // truncated or forged containers are rejected, never mis-sliced.
  // GRV1 remains only as the internal raw-frame interchange for the
  // generic decode() dispatch; the ingest-facing video path is THIS one.

  private val Fourcc = java.nio.charset.StandardCharsets.US_ASCII

  private def fcc(s: String): Int = {
    val b = s.getBytes(Fourcc)
    (b(0) & 0xff) | ((b(1) & 0xff) << 8) | ((b(2) & 0xff) << 16) |
      ((b(3) & 0xff) << 24)
  }

  /** Encode 8-bit grayscale frames (width·height bytes each, the GRV1
    * frame layout) as an uncompressed palettized AVI. Deterministic:
    * fixed 10 fps timing, fixed header fields, no encoder state.
    */
  def encodeAvi(width: Int, height: Int,
      frames: Seq[Array[Byte]]): Array[Byte] = {
    require(width > 0 && height > 0, s"dims must be positive: ${width}x$height")
    val frameLen = width.toLong * height
    require(frames.forall(f => f != null && f.length.toLong == frameLen),
      s"every frame must hold exactly $frameLen gray bytes")
    val rowStride = (width + 3) & ~3
    val fds = rowStride * height // frame data size, already 4-aligned
    val nf = frames.length
    val strfSize = 40 + 256 * 4
    val strlSize = 4 + (8 + 56) + (8 + strfSize)
    val hdrlSize = 4 + (8 + 56) + (8 + strlSize)
    val moviSize = 4 + nf.toLong * (8 + fds)
    val idx1Size = nf.toLong * 16
    val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize) + (8 + idx1Size)
    require(8 + riffSize <= Int.MaxValue,
      s"container too large for one payload: ${8 + riffSize} bytes")
    val bb = java.nio.ByteBuffer.allocate((8 + riffSize).toInt)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(fcc("RIFF")).putInt(riffSize.toInt).putInt(fcc("AVI "))
    // LIST hdrl
    bb.putInt(fcc("LIST")).putInt(hdrlSize).putInt(fcc("hdrl"))
    // avih: MainAVIHeader (56 bytes)
    bb.putInt(fcc("avih")).putInt(56)
    bb.putInt(100000) // dwMicroSecPerFrame (10 fps)
    bb.putInt(fds * 10) // dwMaxBytesPerSec
    bb.putInt(0) // dwPaddingGranularity
    bb.putInt(0x10) // dwFlags = AVIF_HASINDEX
    bb.putInt(nf) // dwTotalFrames
    bb.putInt(0) // dwInitialFrames
    bb.putInt(1) // dwStreams
    bb.putInt(fds + 8) // dwSuggestedBufferSize
    bb.putInt(width).putInt(height)
    bb.putInt(0).putInt(0).putInt(0).putInt(0) // dwReserved[4]
    // LIST strl
    bb.putInt(fcc("LIST")).putInt(strlSize).putInt(fcc("strl"))
    // strh: AVIStreamHeader (56 bytes)
    bb.putInt(fcc("strh")).putInt(56)
    bb.putInt(fcc("vids")).putInt(fcc("DIB "))
    bb.putInt(0) // dwFlags
    bb.putInt(0) // wPriority + wLanguage
    bb.putInt(0) // dwInitialFrames
    bb.putInt(1) // dwScale
    bb.putInt(10) // dwRate -> 10 fps
    bb.putInt(0) // dwStart
    bb.putInt(nf) // dwLength
    bb.putInt(fds + 8) // dwSuggestedBufferSize
    bb.putInt(-1) // dwQuality (default)
    bb.putInt(0) // dwSampleSize
    bb.putShort(0).putShort(0) // rcFrame left, top
    bb.putShort(width.toShort).putShort(height.toShort) // right, bottom
    // strf: BITMAPINFOHEADER + grayscale palette
    bb.putInt(fcc("strf")).putInt(strfSize)
    bb.putInt(40).putInt(width).putInt(height) // biSize, biWidth, +biHeight = bottom-up
    bb.putShort(1).putShort(8) // biPlanes, biBitCount
    bb.putInt(0) // biCompression = BI_RGB
    bb.putInt(fds) // biSizeImage
    bb.putInt(0).putInt(0) // biXPelsPerMeter, biYPelsPerMeter
    bb.putInt(256).putInt(0) // biClrUsed, biClrImportant
    var c = 0
    while (c < 256) { // RGBQUAD: blue, green, red, reserved
      bb.put(c.toByte).put(c.toByte).put(c.toByte).put(0.toByte)
      c += 1
    }
    // LIST movi
    bb.putInt(fcc("LIST")).putInt(moviSize.toInt).putInt(fcc("movi"))
    frames.foreach { f =>
      bb.putInt(fcc("00db")).putInt(fds)
      var y = height - 1 // DIB rows are bottom-up
      while (y >= 0) {
        bb.put(f, y * width, width)
        var p = width
        while (p < rowStride) { bb.put(0.toByte); p += 1 }
        y -= 1
      }
    }
    // idx1: offsets relative to the movi list's 'movi' fourcc
    bb.putInt(fcc("idx1")).putInt(idx1Size.toInt)
    var i = 0
    while (i < nf) {
      bb.putInt(fcc("00db")).putInt(0x10) // AVIIF_KEYFRAME
      bb.putInt(4 + i * (8 + fds)).putInt(fds)
      i += 1
    }
    bb.array()
  }

  /** Parsed, fully validated AVI structure: dimensions, codec
    * (BI_RGB 8-bit DIB or MJPG), resolved palette (DIB only), and every
    * frame chunk's payload (offset, size) — pixel work deferred to
    * [[decodeAviFrameOpt]] so samplers decode only the frames they
    * keep.
    */
  case class AviClip(width: Int, height: Int, codec: Int,
      palette: Array[Int], frames: IndexedSeq[(Int, Int)]) {
    def nFrames: Int = frames.length
  }

  /** strf biCompression values this parser accepts: 0 = BI_RGB
    * (uncompressed 8-bit palettized DIB) and the 'MJPG' fourcc
    * (Motion JPEG: each frame chunk is one complete JPEG image,
    * decoded by the same ImageIO codec as the still-image path —
    * round 14, VERDICT r13 #5, the first compressed video codec at
    * the ingest edge).
    */
  val CodecDib: Int = 0
  val CodecMjpg: Int = fcc("MJPG")

  /** The RIFF grammar only nests LIST(hdrl) > LIST(strl); anything
    * deeper is a forged container and must be REJECTED, not recursed
    * into — an unbounded walk would turn a payload of nested LIST
    * shells into a StackOverflowError (an Error no tolerant decode
    * catches) instead of a None.
    */
  private val MaxRiffDepth = 4

  /** Parse and validate an uncompressed 8-bit-DIB AVI: RIFF magic and
    * exact size, chunk walk (depth-capped), avih/strf header fields,
    * palette, per-frame chunk sizes, frame count vs avih. None on
    * anything malformed — wrong magic, truncated RIFF size, missing
    * headers, non-8-bit or compressed streams, frame-size mismatches,
    * over-deep nesting, or a frame count that disagrees with avih.
    */
  def parseAvi(bytes: Array[Byte]): Option[AviClip] = {
    if (bytes == null || bytes.length < 12) return None
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    if (bb.getInt(0) != fcc("RIFF")) return None
    val riffSize = bb.getInt(4)
    if (riffSize < 4 || 8L + riffSize != bytes.length.toLong) return None
    if (bb.getInt(8) != fcc("AVI ")) return None

    var width = 0
    var height = 0
    var totalFrames = -1
    var bitCount = -1
    var compression = -1
    var strfWidth = -1
    var strfHeight = -1
    var palette: Array[Int] = null // packed rgb per index
    val frameOffsets = IndexedSeq.newBuilder[(Int, Int)] // (offset, size)

    // tolerant chunk walk; `end` bounds every read so a forged size can
    // never index past the payload, `depth` bounds recursion
    def walk(from: Int, end: Int, depth: Int): Boolean = {
      if (depth > MaxRiffDepth) return false
      var off = from
      while (off + 8 <= end) {
        val id = bb.getInt(off)
        val size = bb.getInt(off + 4)
        if (size < 0 || off + 8 + size.toLong > end) return false
        if (id == fcc("LIST")) {
          if (size < 4) return false
          val listType = bb.getInt(off + 8)
          if (listType == fcc("hdrl") || listType == fcc("strl") ||
              listType == fcc("movi")) {
            if (!walk(off + 12, off + 8 + size, depth + 1)) return false
          }
        } else if (id == fcc("avih")) {
          if (size < 56) return false
          totalFrames = bb.getInt(off + 8 + 16)
          width = bb.getInt(off + 8 + 32)
          height = bb.getInt(off + 8 + 36)
        } else if (id == fcc("strf")) {
          if (size < 40) return false
          strfWidth = bb.getInt(off + 8 + 4)
          strfHeight = bb.getInt(off + 8 + 8)
          bitCount = bb.getShort(off + 8 + 14).toInt
          compression = bb.getInt(off + 8 + 16)
          if (bitCount == 8) {
            if (size < 40 + 256 * 4) return false
            palette = Array.tabulate(256) { k =>
              val p = off + 8 + 40 + k * 4
              val b = bytes(p) & 0xff
              val g = bytes(p + 1) & 0xff
              val r = bytes(p + 2) & 0xff
              (r << 16) | (g << 8) | b
            }
          }
        } else if (id == fcc("00db") || id == fcc("00dc")) {
          frameOffsets += ((off + 8, size))
        }
        off += 8 + size + (size & 1) // RIFF chunks are word-aligned
      }
      true
    }
    if (!walk(12, bytes.length, 1)) return None

    if (width <= 0 || height <= 0 || totalFrames < 0) return None
    // strf carries its own biWidth/biHeight — a forged container whose
    // stream header disagrees with avih is rejected, not mis-sliced
    if (strfWidth != width || strfHeight != height) return None
    val frames = frameOffsets.result()
    if (frames.size != totalFrames) return None
    if (compression == CodecDib) {
      if (bitCount != 8 || palette == null) return None
      // frame-size arithmetic in Long: a forged avih with huge dims must
      // not Int-overflow fds to a small value that then passes the
      // chunk-size check and crashes the decode on negative offsets
      // (ADVICE r13). fds <= Int.MaxValue also bounds every later Int
      // computation ((height-1)*rowStride, width*height).
      val rowStrideL = (width.toLong + 3L) & ~3L
      val fds = rowStrideL * height.toLong
      if (fds <= 0L || fds > Int.MaxValue.toLong) return None
      if (frames.exists(_._2.toLong != fds)) return None
      Some(AviClip(width, height, CodecDib, palette, frames))
    } else if (compression == CodecMjpg) {
      if (bitCount != 24) return None
      if (width.toLong * height > Int.MaxValue) return None
      // every frame chunk must be one complete JPEG: SOI magic leading,
      // EOI trailing — a chunk that is not a self-contained image is a
      // forged container, rejected here rather than handed to the codec
      val jpegOk = frames.forall { case (off, size) =>
        size >= 4 &&
          (bytes(off) & 0xff) == 0xff && (bytes(off + 1) & 0xff) == 0xd8 &&
          (bytes(off + size - 2) & 0xff) == 0xff &&
          (bytes(off + size - 1) & 0xff) == 0xd9
      }
      if (!jpegOk) return None
      Some(AviClip(width, height, CodecMjpg, null, frames))
    } else None
  }

  /** Decode one frame of a parsed clip. DIB frames decode exactly
    * (palette-resolved 299/587/114, the [[decodeImage]] formula) and
    * can never fail after [[parseAvi]]'s size validation; MJPG frames
    * go through the ImageIO JPEG codec, whose rejection of a
    * malformed-but-well-delimited chunk surfaces as None (samplers
    * then drop the whole payload — a clip with one undecodable frame
    * is a corrupt clip, not a shorter one).
    */
  def decodeAviFrameOpt(bytes: Array[Byte], clip: AviClip,
      f: Int): Option[Decoded] =
    if (clip.codec == CodecMjpg) {
      val (off, size) = clip.frames(f)
      val slice = java.util.Arrays.copyOfRange(bytes, off, off + size)
      decodeImage(slice).filter(d =>
        d.width == clip.width && d.height == clip.height)
    } else Some(decodeAviFrame(bytes, clip, f))

  /** Exact decode of one DIB frame — see [[decodeAviFrameOpt]]. */
  def decodeAviFrame(bytes: Array[Byte], clip: AviClip, f: Int): Decoded = {
    require(clip.codec == CodecDib, "decodeAviFrame is the DIB path")
    val rowStride = (clip.width + 3) & ~3
    val off = clip.frames(f)._1
    val hist = new Array[Float](8)
    var lumaSum = 0L
    var y = 0
    while (y < clip.height) {
      val rowOff = off + (clip.height - 1 - y) * rowStride // bottom-up
      var x = 0
      while (x < clip.width) {
        val rgb = clip.palette(bytes(rowOff + x) & 0xff)
        val luma = (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff)
          + 114 * (rgb & 0xff)) / 1000
        hist(luma >> 5) += 1f
        lumaSum += luma
        x += 1
      }
      y += 1
    }
    val n = clip.width * clip.height
    var b = 0
    while (b < 8) { hist(b) /= n; b += 1 }
    Decoded(clip.width, clip.height, 1, (lumaSum / n).toInt, hist)
  }

  /** Parse + decode every frame (spec/round-trip surface; samplers use
    * [[parseAvi]] + [[decodeAviFrameOpt]] to decode only kept frames).
    * None when the container is malformed OR any frame fails its
    * codec — all-or-nothing, like the samplers.
    */
  def decodeAviFrames(bytes: Array[Byte]): Option[Seq[Decoded]] =
    parseAvi(bytes).flatMap { clip =>
      val ds = (0 until clip.nFrames)
        .map(decodeAviFrameOpt(bytes, clip, _))
      if (ds.forall(_.isDefined)) Some(ds.map(_.get)) else None
    }

  /** Deterministic AVI media table — the same closed-form construction
    * as [[syntheticVideoTable]]/[[syntheticGifTable]] (w = 16+id%16,
    * h = 16+id%8, nFrames = 8+id%8, frame f solid gray (id+7·f)%256),
    * encoded as standard RIFF AVI payloads any external tool can read.
    */
  def syntheticAviTable(docs: DataFrame,
      idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.util.Spread.cpuBoundDs(docs
      .select(col(idCol).cast("long").as("doc_id"))
      .as[Long])
      .mapPartitions { ids =>
        ids.map { id =>
          val w = 16 + (id % 16).toInt
          val h = 16 + (id % 8).toInt
          val nf = 8 + (id % 8).toInt
          val frames = (0 until nf).map { f =>
            val g = ((id + 7L * f) % 256).toByte
            val a = new Array[Byte](w * h)
            java.util.Arrays.fill(a, g)
            a
          }
          (id, encodeAvi(w, h, frames))
        }
      }
      .toDF("doc_id", "payload")
      .select(
        col("doc_id"),
        col("payload"),
        struct(
          lit("video/x-msvideo").as("media_type"),
          octet_length(col("payload")).cast("long").as("n_bytes"),
          md5(col("payload")).as("digest")).as("meta"))
  }

  /** [[videoFrameSample]] over standard AVI payloads: parse the RIFF
    * grammar, decode and emit ONLY every `stride`-th frame (skipped
    * frames cost a validated chunk offset, never a pixel pass) with its
    * exact integer mean luma. Payloads the parser rejects are dropped —
    * one flatMap, fan-out bounded per clip by nFrames/stride.
    */
  def aviFrameSample(media: DataFrame, stride: Int = 3,
      idCol: String = "doc_id",
      payloadCol: String = "payload"): DataFrame = {
    require(stride > 0, s"stride must be positive: $stride")
    val spark = media.sparkSession
    import spark.implicits._
    media
      .select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        parseAvi(bytes).iterator.flatMap { clip =>
          // all-or-nothing per clip: a kept MJPG frame the codec
          // rejects drops the whole payload, never a silently shorter
          // sample (DIB decodes never fail post-validation)
          val kept = (0 until clip.nFrames by stride)
            .map(f => (f, decodeAviFrameOpt(bytes, clip, f)))
          if (kept.exists(_._2.isEmpty)) Iterator.empty
          else kept.iterator.map { case (f, d0) =>
            val d = d0.get
            (id, f, d.width, d.height, clip.nFrames, d.mean_luma)
          }
        }
      })
      .toDF("doc_id", "frame_idx", "width", "height", "n_frames",
        "mean_luma")
  }

  /** Encode JPEG frames (each a complete SOI..EOI image) as a standard
    * Motion-JPEG AVI: the [[encodeAvi]] container layout with
    * strh('vids'/'MJPG'), strf(biCompression='MJPG', 24-bit, no
    * palette) and one '00dc' chunk per frame (word-aligned, sizes
    * vary). Deterministic — fixed 10 fps timing, no encoder state.
    */
  def encodeAviMjpeg(width: Int, height: Int,
      frames: Seq[Array[Byte]]): Array[Byte] = {
    require(width > 0 && height > 0, s"dims must be positive: ${width}x$height")
    require(frames.forall(f => f != null && f.length >= 4 &&
      (f(0) & 0xff) == 0xff && (f(1) & 0xff) == 0xd8),
      "every frame must be a complete JPEG (SOI magic)")
    val nf = frames.length
    val strfSize = 40
    val strlSize = 4 + (8 + 56) + (8 + strfSize)
    val hdrlSize = 4 + (8 + 56) + (8 + strlSize)
    val chunk = frames.map(f => 8L + f.length + (f.length & 1))
    val moviSize = 4 + chunk.sum
    val idx1Size = nf.toLong * 16
    val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize) + (8 + idx1Size)
    require(8 + riffSize <= Int.MaxValue,
      s"container too large for one payload: ${8 + riffSize} bytes")
    val maxFrame = if (nf == 0) 0 else frames.map(_.length).max
    val bb = java.nio.ByteBuffer.allocate((8 + riffSize).toInt)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(fcc("RIFF")).putInt(riffSize.toInt).putInt(fcc("AVI "))
    bb.putInt(fcc("LIST")).putInt(hdrlSize).putInt(fcc("hdrl"))
    bb.putInt(fcc("avih")).putInt(56)
    bb.putInt(100000) // dwMicroSecPerFrame (10 fps)
    bb.putInt(maxFrame * 10) // dwMaxBytesPerSec
    bb.putInt(0) // dwPaddingGranularity
    bb.putInt(0x10) // dwFlags = AVIF_HASINDEX
    bb.putInt(nf) // dwTotalFrames
    bb.putInt(0) // dwInitialFrames
    bb.putInt(1) // dwStreams
    bb.putInt(maxFrame + 8) // dwSuggestedBufferSize
    bb.putInt(width).putInt(height)
    bb.putInt(0).putInt(0).putInt(0).putInt(0) // dwReserved[4]
    bb.putInt(fcc("LIST")).putInt(strlSize).putInt(fcc("strl"))
    bb.putInt(fcc("strh")).putInt(56)
    bb.putInt(fcc("vids")).putInt(fcc("MJPG"))
    bb.putInt(0) // dwFlags
    bb.putInt(0) // wPriority + wLanguage
    bb.putInt(0) // dwInitialFrames
    bb.putInt(1) // dwScale
    bb.putInt(10) // dwRate -> 10 fps
    bb.putInt(0) // dwStart
    bb.putInt(nf) // dwLength
    bb.putInt(maxFrame + 8) // dwSuggestedBufferSize
    bb.putInt(-1) // dwQuality (default)
    bb.putInt(0) // dwSampleSize
    bb.putShort(0).putShort(0) // rcFrame left, top
    bb.putShort(width.toShort).putShort(height.toShort) // right, bottom
    bb.putInt(fcc("strf")).putInt(strfSize)
    bb.putInt(40).putInt(width).putInt(height) // biSize, biWidth, biHeight
    bb.putShort(1).putShort(24) // biPlanes, biBitCount
    bb.putInt(CodecMjpg) // biCompression = 'MJPG'
    bb.putInt(0) // biSizeImage (varies per frame)
    bb.putInt(0).putInt(0) // biXPelsPerMeter, biYPelsPerMeter
    bb.putInt(0).putInt(0) // biClrUsed, biClrImportant
    bb.putInt(fcc("LIST")).putInt(moviSize.toInt).putInt(fcc("movi"))
    frames.foreach { f =>
      bb.putInt(fcc("00dc")).putInt(f.length)
      bb.put(f)
      if ((f.length & 1) == 1) bb.put(0.toByte) // RIFF word alignment
    }
    bb.putInt(fcc("idx1")).putInt(idx1Size.toInt)
    var i = 0
    var off = 4L
    while (i < nf) {
      bb.putInt(fcc("00dc")).putInt(0x10) // AVIIF_KEYFRAME
      bb.putInt(off.toInt).putInt(frames(i).length)
      off += chunk(i)
      i += 1
    }
    bb.array()
  }

  /** Solid-gray JPEG at ImageIO quality 1.0 — the all-ones
    * quantization tables make a constant gray image roundtrip
    * BIT-EXACTLY (gray -> Y = gray, Cb = Cr = 128, DC-only blocks,
    * probed across all 256 grays and odd dimensions), which is what
    * lets [[syntheticMjpegAviTable]] share q139's closed-form oracle.
    */
  def encodeJpegGray(width: Int, height: Int, gray: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (gray << 16) | (gray << 8) | gray
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val writer = javax.imageio.ImageIO
      .getImageWritersByFormatName("jpeg").next()
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(1.0f)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    ios.close()
    writer.dispose()
    bos.toByteArray
  }

  /** Deterministic Motion-JPEG media table — the same closed-form
    * construction as [[syntheticAviTable]] (w = 16+id%16, h = 16+id%8,
    * nFrames = 8+id%8, frame f solid gray (id+7·f)%256), each frame a
    * real ImageIO JPEG, the container a standard MJPG AVI any external
    * tool plays. Solid-gray JPEG roundtrips exactly at quality 1.0, so
    * the q139 oracle covers this table verbatim (q165).
    */
  def syntheticMjpegAviTable(docs: DataFrame,
      idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.util.Spread.cpuBoundDs(docs
      .select(col(idCol).cast("long").as("doc_id"))
      .as[Long])
      .mapPartitions { ids =>
        ids.map { id =>
          val w = 16 + (id % 16).toInt
          val h = 16 + (id % 8).toInt
          val nf = 8 + (id % 8).toInt
          val frames = (0 until nf).map { f =>
            encodeJpegGray(w, h, ((id + 7L * f) % 256).toInt)
          }
          (id, encodeAviMjpeg(w, h, frames))
        }
      }
      .toDF("doc_id", "payload")
      .select(
        col("doc_id"),
        col("payload"),
        struct(
          lit("video/x-msvideo").as("media_type"),
          octet_length(col("payload")).cast("long").as("n_bytes"),
          md5(col("payload")).as("digest")).as("meta"))
  }
}
