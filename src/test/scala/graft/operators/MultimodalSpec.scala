package graft.operators

import graft.{SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The codec is a stub; what these tests pin is the REAL plumbing — schema,
  * encoders, partition-wise batch shape, determinism, payload-size behavior. */
class MultimodalSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private lazy val assets =
    Multimodal.assetsFromDocuments(spark,
      Tables.documents(spark, "/root/testdata/sf0.001")).cache()

  test("asset schema: opaque binary payload + typed metadata") {
    val sch = assets.schema
    assert(sch("data").dataType.typeName == "binary")
    assert(Seq("asset_id", "kind", "width", "height", "sample_rate", "duration_ms")
      .forall(sch.fieldNames.contains))
    assert(assets.select($"kind").distinct().as[String].collect().toSet ==
      Set("image", "audio", "video"))
  }

  test("feature extraction: histogram mass equals byte count; deterministic") {
    val f = Multimodal.extractFeatures(assets)
    val rows = f.limit(50).collect()
    assert(rows.forall(r => r.byte_hist.sum == r.n_bytes))
    assert(rows.forall(r => r.brightness > 0 && r.brightness < 256))
    val again = Multimodal.extractFeatures(assets).limit(50).collect()
    assert(rows.map(_.brightness).toSeq == again.map(_.brightness).toSeq)
  }

  test("resize caps dimensions and shrinks payloads, never upscales") {
    val resized = Multimodal.resize(assets, maxW = 100, maxH = 100).collect()
    assert(resized.forall(a => a.width <= 100 && a.height <= 100))
    val orig = assets.collect().map(a => a.asset_id -> a).toMap
    resized.foreach { a =>
      assert(a.data.length <= orig(a.asset_id).data.length)
    }
  }

  test("image decode is real: known PNG pixels give exact luminance features") {
    // Synthesize a genuine 2×2 PNG with the JDK encoder: black, white,
    // pure red, pure green — luminances 0, 255, 76, 149 (ITU-R 601 integer).
    val img = new java.awt.image.BufferedImage(2, 2,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0x000000); img.setRGB(1, 0, 0xffffff)
    img.setRGB(0, 1, 0xff0000); img.setRGB(1, 1, 0x00ff00)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val png = bos.toByteArray
    val asset = Multimodal.Asset(7L, "image", png, 2, 2, 0, 0)

    // distributed path: one-row Dataset through extractFeatures
    val feats = Multimodal.extractFeatures(
      spark.createDataset(Seq(asset))).collect().head
    val expLums = Seq(0, 255, (255 * 299) / 1000, (255 * 587) / 1000)
    assert(feats.brightness == expLums.sum.toDouble / 4)
    val expHist = new Array[Long](16)
    expLums.foreach(l => expHist(l / 16) += 1)
    assert(feats.byte_hist.toSeq == expHist.toSeq)
    // pixel features, not payload-byte features: mass = pixels, not bytes
    assert(feats.byte_hist.sum == 4 && feats.n_bytes == png.length)
  }

  test("image resize decodes, scales, and re-encodes real pixels") {
    // uniform mid-gray 8×8 → bilinear 4×4 stays uniform mid-gray
    val img = new java.awt.image.BufferedImage(8, 8,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 8).foreach(y => (0 until 8).foreach(x => img.setRGB(x, y, 0x808080)))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val asset = Multimodal.Asset(9L, "image", bos.toByteArray, 8, 8, 0, 0)
    val resized = Multimodal.resize(
      spark.createDataset(Seq(asset)), maxW = 4, maxH = 4).collect().head
    assert(resized.width == 4 && resized.height == 4)
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(resized.data))
    assert(back.getWidth == 4 && back.getHeight == 4)
    assert((0 until 4).forall(y => (0 until 4).forall(x =>
      (back.getRGB(x, y) & 0xffffff) == 0x808080)))
  }

  test("undecodable image payloads fall back to the byte-level stand-in") {
    val junk = Multimodal.Asset(8L, "image", Array[Byte](1, 2, 3, 4), 1, 1, 0, 0)
    val f = Multimodal.extractFeatures(spark.createDataset(Seq(junk))).collect().head
    assert(f.byte_hist.sum == 4 && f.n_bytes == 4)
  }

  /** A genuine 16-bit mono PCM WAV through the JDK encoder. */
  private def wavBytes(samples: Array[Short], sampleRate: Float = 16000f): Array[Byte] = {
    val data = new Array[Byte](samples.length * 2)
    samples.indices.foreach { i => // little-endian
      data(2 * i) = (samples(i) & 0xff).toByte
      data(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, samples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("audio decode is real: known WAV samples give exact sample features") {
    // 1 s of constant amplitude 16384 (= 0.5 normalized) at 16 kHz
    val wav = wavBytes(Array.fill[Short](16000)(16384))
    val asset = Multimodal.Asset(11L, "audio", wav, 0, 0, 16000, 1000)
    val f = Multimodal.extractAudioFeatures(
      spark.createDataset(Seq(asset))).collect().head
    assert(f.sample_rate == 16000 && f.channels == 1)
    assert(f.duration_ms == 1000.0)
    assert(f.rms == 0.5) // sqrt(mean(0.25)) exactly
    val expHist = new Array[Long](16)
    expHist(8) = 16000 // |0.5| * 16 = bin 8
    assert(f.amp_hist.toSeq == expHist.toSeq)
  }

  test("audio decode: silence and full-scale land in the extreme bins") {
    val samples = Array.fill[Short](500)(0) ++ Array.fill[Short](500)(Short.MinValue)
    val f = Multimodal.extractAudioFeatures(spark.createDataset(Seq(
      Multimodal.Asset(12L, "audio", wavBytes(samples, 8000f), 0, 0, 8000, 125))))
      .collect().head
    assert(f.sample_rate == 8000 && f.duration_ms == 125.0)
    assert(f.amp_hist(0) == 500 && f.amp_hist(15) == 500)
    assert(f.rms == math.sqrt(0.5)) // half silence, half |-1.0|
  }

  test("kind=audio with a valid WAV payload does not hit the byte-level stub") {
    val wav = wavBytes(Array.fill[Short](1000)(16384))
    val f = Multimodal.extractFeatures(spark.createDataset(Seq(
      Multimodal.Asset(13L, "audio", wav, 0, 0, 16000, 62)))).collect().head
    // sample features, not payload-byte features: histogram mass = samples
    // (not bytes) and brightness carries the RMS
    assert(f.byte_hist.sum == 1000 && f.n_bytes == wav.length)
    assert(f.brightness == 0.5)
    // undecodable audio payload still falls back to the stub
    val junk = Multimodal.extractFeatures(spark.createDataset(Seq(
      Multimodal.Asset(14L, "audio", Array[Byte](9, 9, 9), 0, 0, 0, 0)))).collect().head
    assert(junk.byte_hist.sum == 3 && junk.n_bytes == 3)
  }

  /** A genuine MJPEG stream: `n` solid-color JPEG frames concatenated. */
  private def mjpegBytes(dims: Seq[Int]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    dims.foreach { d =>
      val img = new java.awt.image.BufferedImage(d, d,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until d).foreach(y => (0 until d).foreach(x => img.setRGB(x, y, 0x808080)))
      javax.imageio.ImageIO.write(img, "jpg", bos)
    }
    bos.toByteArray
  }

  test("video demux is real: MJPEG splits into ImageIO-decodable codec frames") {
    val mjpeg = mjpegBytes(Seq(4, 6, 8))
    val asset = Multimodal.Asset(15L, "video", mjpeg, 8, 8, 0, 0)
    val frames = Multimodal.sampleFrames(
      spark.createDataset(Seq(asset)), frameBytes = 32, stride = 1).collect()
      .sortBy(_.frame_no)
    assert(frames.length == 3)
    assert(frames.map(_.frame_no).toSeq == Seq(0, 1, 2))
    val sizes = frames.map { f =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(f.data))
      assert(img != null, s"frame ${f.frame_no} must be a decodable JPEG")
      img.getWidth
    }
    assert(sizes.toSeq == Seq(4, 6, 8))
    // stride applies to real frames too
    val strided = Multimodal.sampleFrames(
      spark.createDataset(Seq(asset)), frameBytes = 32, stride = 2).collect()
    assert(strided.map(_.frame_no).sorted.toSeq == Seq(0, 2))
  }

  test("demux walks marker segments: an embedded EXIF-thumbnail JPEG never splits a frame") {
    // Frame 1 carries an APP1 segment whose PAYLOAD is a complete JPEG (its
    // own SOI and all) — the EXIF-thumbnail shape. A raw FF D8 FF byte scan
    // would split inside the segment and emit an undecodable garbage frame;
    // the marker walk skips the segment by its length field.
    def jpeg(d: Int): Array[Byte] = mjpegBytes(Seq(d))
    val thumb = jpeg(4)
    val host = jpeg(8)
    val app1 = Array[Byte](0xff.toByte, 0xe1.toByte,
      (((thumb.length + 2) >> 8) & 0xff).toByte, ((thumb.length + 2) & 0xff).toByte) ++ thumb
    // SOI | APP1(thumbnail) | rest of the host frame | plain second frame
    val frame1 = host.take(2) ++ app1 ++ host.drop(2)
    val frame2 = jpeg(6)
    val stream = frame1 ++ frame2
    val offs = Multimodal.mjpegFrameOffsets(stream)
    assert(offs == Seq((0, frame1.length), (frame1.length, stream.length)),
      s"expected 2 frames at exact boundaries, got $offs")
    // both demuxed frames decode, at the HOST dimensions (4 would mean the
    // thumbnail was mistaken for a frame)
    val dims = offs.map { case (s, e) =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(stream.slice(s, e)))
      assert(img != null, s"frame at ($s,$e) must decode")
      img.getWidth
    }
    assert(dims == Seq(8, 6))
  }

  test("video features come from real key-frame pixels for MJPEG; stub otherwise") {
    val mjpeg = mjpegBytes(Seq(4, 6))
    val f = Multimodal.extractFeatures(spark.createDataset(Seq(
      Multimodal.Asset(16L, "video", mjpeg, 4, 4, 0, 0)))).collect().head
    // pixel features of the 4×4 first frame, payload-level byte count
    assert(f.byte_hist.sum == 16, s"hist mass must be first-frame pixels: ${f.byte_hist.toSeq}")
    assert(f.n_bytes == mjpeg.length)
    assert(f.brightness > 0 && f.brightness < 256)
    // non-MJPEG video payload still falls back to the byte-level stub
    val junk = Multimodal.extractFeatures(spark.createDataset(Seq(
      Multimodal.Asset(17L, "video", Array[Byte](1, 2, 3, 4, 5), 1, 1, 0, 0)))).collect().head
    assert(junk.byte_hist.sum == 5 && junk.n_bytes == 5)
  }

  test("video resize scales every MJPEG frame and re-encodes a valid stream") {
    val mjpeg = mjpegBytes(Seq(8, 8, 8))
    val asset = Multimodal.Asset(18L, "video", mjpeg, 8, 8, 0, 0)
    val resized = Multimodal.resize(
      spark.createDataset(Seq(asset)), maxW = 4, maxH = 4).collect().head
    assert(resized.width == 4 && resized.height == 4)
    val frames = Multimodal.sampleFrames(
      spark.createDataset(Seq(resized)), frameBytes = 32, stride = 1).collect()
    assert(frames.length == 3, "resized stream must still demux into 3 frames")
    frames.foreach { f =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(f.data))
      assert(img != null && img.getWidth == 4 && img.getHeight == 4)
    }
  }

  test("WAV decode property: features equal direct computation on random samples") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val gen = Gen.nonEmptyListOf(Gen.chooseNum(Short.MinValue, Short.MaxValue))
      .map(_.take(2000).toArray)
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20),
      Prop.forAll(gen) { samples =>
        val f = Multimodal.extractAudioFeatures(spark.createDataset(Seq(
          Multimodal.Asset(19L, "audio", wavBytes(samples), 0, 0, 16000, 0))))
          .collect().head
        val norm = samples.map(_.toDouble / 32768.0)
        val expRms = math.sqrt(norm.map(s => s * s).sum / norm.length)
        val expHist = new Array[Long](16)
        norm.foreach(s => expHist(math.min(15, (math.abs(s) * 16).toInt)) += 1)
        f.rms == expRms && f.amp_hist.toSeq == expHist.toSeq &&
          f.sample_rate == 16000 && f.channels == 1
      })
    assert(res.passed, res.status.toString)
  }

  test("frame sampling emits every stride-th fixed-size window, video only") {
    val frames = Multimodal.sampleFrames(assets, frameBytes = 32, stride = 2).collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.frame_no % 2 == 0))
    val kinds = assets.filter($"kind" === "video").select($"asset_id")
      .as[Long].collect().toSet
    assert(frames.map(_.asset_id).toSet.subsetOf(kinds))
    assert(frames.filter(_.frame_no == 0).forall(_.data.length == 32))
  }
}
