package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing (SURVEY §2.9 / builder
  * mandate): media travel as opaque `binary` columns with typed metadata;
  * decode / feature-extract / resize / frame-sample run partition-wise over
  * batches so a real codec drops in without changing the plan shape.
  *
  * IMAGE decode is REAL — the JDK ships PNG/JPEG/BMP/GIF readers in
  * `javax.imageio`, no external deps — computing pixel-level features
  * (luminance histogram + mean brightness). AUDIO decode is REAL for WAV —
  * the JDK ships PCM WAV/AIFF/AU readers in `javax.sound.sampled` —
  * computing sample-level features (amplitude histogram + RMS). VIDEO demux
  * + decode is REAL for MJPEG (concatenated JPEG frames, split on the SOI
  * marker, each frame ImageIO-decoded); other video codecs do not ship with
  * the JDK, so those payloads fall back to a deterministic byte-level STUB
  * (clearly marked below), as does any undecodable image/audio/video
  * payload. Everything around the stub is real: schema, encoders,
  * mapPartitions batch shape, partitioning behavior. At 100 TB the per-asset work is
  * embarrassingly parallel; the only sizing concern is
  * `spark.sql.files.maxPartitionBytes` vs. asset size, because one task
  * holds one batch of raw bytes at a time.
  */
object Multimodal {

  /** One media asset: opaque payload + typed metadata. */
  final case class Asset(
      asset_id: Long, kind: String, data: Array[Byte],
      width: Int, height: Int, sample_rate: Int, duration_ms: Int)

  final case class AssetFeatures(
      asset_id: Long, kind: String, n_bytes: Long,
      byte_hist: Array[Long], brightness: Double)

  final case class Frame(asset_id: Long, frame_no: Int, data: Array[Byte])

  /** Build a deterministic asset table from `documents` (text bytes stand in
    * for media payloads; kind cycles by doc_id). Real pipelines point this at
    * a binary-file source instead. */
  def assetsFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[Asset] = {
    import spark.implicits._
    docs.select(
      col("doc_id").as("asset_id"),
      element_at(lit(Array("image", "audio", "video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("data"),
      (col("n_chars") % 640 + 1).cast("int").as("width"),
      (col("n_chars") % 480 + 1).cast("int").as("height"),
      lit(16000).as("sample_rate"),
      (col("n_chars") * 10).cast("int").as("duration_ms"))
      .as[Asset]
  }

  /** STUB decode: a real implementation hands `a.data` to a codec here.
    * The deterministic fake treats the payload as "pixels": a 16-bin byte
    * histogram and a mean-byte "brightness". */
  private def decodeStub(a: Asset): AssetFeatures = {
    val hist = new Array[Long](16)
    var sum = 0L
    a.data.foreach { b =>
      val v = b & 0xff
      hist(v / 16) += 1
      sum += v
    }
    AssetFeatures(a.asset_id, a.kind, a.data.length.toLong, hist,
      if (a.data.isEmpty) 0.0 else sum.toDouble / a.data.length)
  }

  /** REAL image decode via the JDK's `javax.imageio`: 16-bin luminance
    * histogram (ITU-R 601 integer weights, engine-deterministic) and mean
    * luminance over the decoded pixels. Returns None when the payload is
    * not a decodable image. */
  private[operators] def decodeImage(a: Asset): Option[AssetFeatures] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(a.data))
      if (img == null || img.getWidth == 0 || img.getHeight == 0) None
      else {
        val hist = new Array[Long](16)
        var sum = 0L
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            val rgb = img.getRGB(x, y)
            val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
              (rgb & 0xff) * 114) / 1000
            hist(lum / 16) += 1
            sum += lum
            x += 1
          }
          y += 1
        }
        val n = img.getWidth.toLong * img.getHeight
        Some(AssetFeatures(a.asset_id, a.kind, a.data.length.toLong, hist,
          sum.toDouble / n))
      }
    } catch { case _: Exception => None }

  /** Sample-level audio features: per-channel-interleaved PCM samples
    * normalized to [-1, 1]. Kept separate from [[AssetFeatures]] so the
    * generic feature row stays kind-agnostic. */
  final case class AudioFeatures(
      asset_id: Long, sample_rate: Int, channels: Int, duration_ms: Double,
      rms: Double, amp_hist: Array[Long])

  /** REAL audio decode via the JDK's `javax.sound.sampled` (PCM WAV — no
    * external deps): sample rate, channel count, duration, RMS amplitude,
    * and a 16-bin |amplitude| histogram over normalized samples. Returns
    * None when the payload is not decodable audio. */
  private[operators] def decodeWav(a: Asset): Option[AudioFeatures] =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(a.data))
      try {
        val fmt = ais.getFormat
        val bits = fmt.getSampleSizeInBits
        if (fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
            (bits != 16 && bits != 8) || ais.getFrameLength <= 0) None
        else {
          val bytes = ais.readAllBytes()
          val bytesPerSample = bits / 8
          val n = bytes.length / bytesPerSample
          val hist = new Array[Long](16)
          var sumSq = 0.0
          var i = 0
          while (i < n) {
            val off = i * bytesPerSample
            // WAV is little-endian; 16-bit signed or 8-bit signed PCM
            val raw =
              if (bits == 16)
                (((bytes(off + 1).toInt << 8) | (bytes(off) & 0xff)).toShort).toInt
              else bytes(off).toInt
            val s = raw.toDouble / (if (bits == 16) 32768.0 else 128.0)
            sumSq += s * s
            hist(math.min(15, (math.abs(s) * 16).toInt)) += 1
            i += 1
          }
          Some(AudioFeatures(a.asset_id, fmt.getSampleRate.toInt, fmt.getChannels,
            ais.getFrameLength * 1000.0 / fmt.getSampleRate,
            math.sqrt(sumSq / math.max(1, n)), hist))
        }
      } finally ais.close()
    } catch { case _: Exception => None }

  private def decode(a: Asset): AssetFeatures =
    if (a.kind == "image") decodeImage(a).getOrElse(decodeStub(a))
    else if (a.kind == "audio")
      decodeWav(a).map(f => AssetFeatures(a.asset_id, a.kind,
        a.data.length.toLong, f.amp_hist, f.rms)).getOrElse(decodeStub(a))
    else if (a.kind == "video") {
      // MJPEG: key-frame (first frame) luminance features over real pixels;
      // n_bytes stays the full payload size
      val frames = mjpegFrameOffsets(a.data)
      frames.headOption
        .flatMap { case (s, e) => decodeImage(a.copy(data = a.data.slice(s, e))) }
        .map(_.copy(n_bytes = a.data.length.toLong))
        .getOrElse(decodeStub(a))
    } else decodeStub(a)

  /** Typed audio-feature extraction for `kind = "audio"` assets — same
    * partition-wise batch shape as [[extractFeatures]]; undecodable
    * payloads are dropped (a pipeline routes them to quarantine). */
  def extractAudioFeatures(assets: Dataset[Asset]): Dataset[AudioFeatures] = {
    import assets.sparkSession.implicits._
    assets.filter(col("kind") === "audio").as[Asset]
      .mapPartitions(_.flatMap(a => decodeWav(a)))
  }

  /** REAL video demux for MJPEG payloads (the one video container the JDK
    * can fully decode: it is a concatenation of JPEG frames, and
    * `javax.imageio` ships a JPEG reader). Frames are found by WALKING the
    * marker segments, not by scanning raw bytes for `FF D8 FF`: APPn/COM
    * marker payloads are raw bytes that may embed a complete JPEG of their
    * own (an EXIF thumbnail carries its own SOI), so a raw scan would
    * false-split mid-frame. The walk skips every length-bearing segment by
    * its 2-byte length field, and inside entropy-coded scan data treats
    * `FF 00` (stuffing) and `FF D0-D7` (restart) as data — a frame ends at
    * its EOI (or at the next frame's SOI for encoders that omit EOI). A
    * frame whose structure cannot be parsed is returned as one conservative
    * range to the payload end rather than guessed at. Returns Nil when the
    * payload has no leading SOI (not MJPEG). */
  private[operators] def mjpegFrameOffsets(data: Array[Byte]): Seq[(Int, Int)] = {
    val n = data.length
    def u8(i: Int): Int = data(i) & 0xff
    def isSoi(i: Int): Boolean = i + 1 < n && u8(i) == 0xff && u8(i + 1) == 0xd8
    if (n < 4 || !isSoi(0) || u8(2) != 0xff) return Nil
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var pos = 0
    while (pos < n && isSoi(pos)) {
      val start = pos
      var i = pos + 2 // first marker after SOI
      var end = -1
      var ok = true
      while (ok && end < 0 && i < n) {
        if (u8(i) != 0xff) ok = false
        else {
          var j = i + 1
          while (j < n && u8(j) == 0xff) j += 1 // fill bytes
          if (j >= n) ok = false
          else u8(j) match {
            case 0xd9 => end = j + 1 // EOI
            case 0xd8 => end = i     // bare SOI: previous frame had no EOI
            case m if m == 0x01 || (m >= 0xd0 && m <= 0xd7) => i = j + 1 // standalone
            case 0xda => // SOS: skip its header, then the entropy-coded data
              if (j + 2 >= n) ok = false
              else {
                var k = j + 1 + ((u8(j + 1) << 8) | u8(j + 2))
                var done = false
                while (!done && k < n - 1) {
                  if (u8(k) == 0xff) {
                    val m2 = u8(k + 1)
                    if (m2 == 0x00 || (m2 >= 0xd0 && m2 <= 0xd7)) k += 2
                    else { i = k; done = true } // a real marker (EOI, next SOS…)
                  } else k += 1
                }
                if (!done) ok = false
              }
            case _ => // length-bearing segment: APPn, COM, DQT, DHT, SOF…
              if (j + 2 >= n) ok = false
              else {
                val len = (u8(j + 1) << 8) | u8(j + 2)
                if (len < 2) ok = false else i = j + 1 + len
              }
          }
        }
      }
      if (!ok || end < 0) { out += ((start, n)); pos = n }
      else { out += ((start, end)); pos = end }
    }
    out.toSeq
  }

  /** Feature extraction: partition-wise batches over the asset Dataset —
    * the mapPartitions shape a vectorized codec (or JNI batch call) needs.
    * Images, WAV audio, and MJPEG video decode for real (see
    * [[decodeImage]], [[decodeWav]], [[mjpegFrameOffsets]]); other payloads
    * hit the stub. */
  def extractFeatures(assets: Dataset[Asset]): Dataset[AssetFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.map(decode))
  }

  /** Bilinear `Graphics2D` scale, never upscaling past the source. */
  private def scaleImage(img: java.awt.image.BufferedImage,
                         w: Int, h: Int): java.awt.image.BufferedImage = {
    val out = new java.awt.image.BufferedImage(
      w.min(img.getWidth.max(1)), h.min(img.getHeight.max(1)),
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = out.createGraphics()
    g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
      java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
    g.drawImage(img, 0, 0, out.getWidth, out.getHeight, null)
    g.dispose()
    out
  }

  /** REAL resize for decodable payloads: images scale + PNG re-encode,
    * MJPEG video scales EVERY frame and re-encodes the stream (JPEG
    * frames back-to-back — still valid MJPEG). Other/undecodable payloads
    * keep the byte-level stand-in (proportional truncation) so the plan
    * shape — a narrow map that shrinks payloads BEFORE any shuffle —
    * holds for every kind. */
  def resize(assets: Dataset[Asset], maxW: Int, maxH: Int): Dataset[Asset] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.map { a =>
      if (a.width <= maxW && a.height <= maxH) a
      else {
        val scale = math.min(maxW.toDouble / a.width, maxH.toDouble / a.height)
        val (w, h) = ((a.width * scale).toInt.max(1), (a.height * scale).toInt.max(1))
        val realVideo: Option[Asset] =
          if (a.kind != "video") None
          else try {
            val frames = mjpegFrameOffsets(a.data)
            if (frames.isEmpty) None
            else {
              val bos = new java.io.ByteArrayOutputStream()
              val ok = frames.forall { case (s, e) =>
                val img = javax.imageio.ImageIO.read(
                  new java.io.ByteArrayInputStream(a.data.slice(s, e)))
                img != null && javax.imageio.ImageIO.write(scaleImage(img, w, h), "jpg", bos)
              }
              if (ok) Some(a.copy(width = w, height = h, data = bos.toByteArray))
              else None
            }
          } catch { case _: Exception => None }
        val realImage: Option[Asset] =
          if (a.kind != "image") None
          else try {
            val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(a.data))
            if (img == null) None
            else {
              val out = scaleImage(img, w, h)
              val bos = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(out, "png", bos)
              Some(a.copy(width = out.getWidth, height = out.getHeight,
                data = bos.toByteArray))
            }
          } catch { case _: Exception => None }
        realVideo.orElse(realImage).getOrElse {
          // STUB path (audio, non-MJPEG video, undecodable payloads):
          // proportional payload truncation stands in for a codec re-encode.
          val newLen = math.max(1, (a.data.length * scale * scale).toInt)
          a.copy(width = w, height = h, data = a.data.take(newLen))
        }
      }
    })
  }

  /** Frame sampling for video assets, every `stride`-th frame. REAL for
    * MJPEG payloads — [[mjpegFrameOffsets]] demuxes genuine codec frames
    * (each an ImageIO-decodable JPEG). Non-MJPEG payloads keep the
    * byte-window STUB (fixed-size chunks standing in for codec frames), so
    * the plan shape holds for every container. flatMap keeps it
    * streaming — no per-asset materialization. */
  def sampleFrames(assets: Dataset[Asset], frameBytes: Int, stride: Int): Dataset[Frame] = {
    import assets.sparkSession.implicits._
    assets.filter(col("kind") === "video").as[Asset].mapPartitions(_.flatMap { a =>
      val mjpeg = mjpegFrameOffsets(a.data)
      val chunks =
        if (mjpeg.nonEmpty) mjpeg.iterator.map { case (s, e) => a.data.slice(s, e) }
        else a.data.grouped(frameBytes)
      chunks.zipWithIndex.collect {
        case (chunk, i) if i % stride == 0 => Frame(a.asset_id, i, chunk)
      }
    })
  }
}
