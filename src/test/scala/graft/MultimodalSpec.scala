package graft

import org.apache.spark.sql.functions._
import graft.ops.Multimodal
import graft.util.Tables

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  lazy val media = Multimodal.mediaTable(
    Tables.documents(spark, sfDir), "doc_id", "text").cache()

  test("media table carries binary payloads with typed metadata") {
    val n = Tables.documents(spark, sfDir).count()
    assert(media.count() == n)
    val row = media.filter(_.mediaId == 0L).head()
    assert(row.payload.nonEmpty)
    assert(row.meta.width > 0 && row.meta.height > 0)
    val kinds = media.map(_.kind).distinct().collect().toSet
    assert(kinds == Set("image", "audio", "video"))
  }

  test("feature extraction is deterministic, batched, fixed-dimension") {
    val f1 = Multimodal.extractFeatures(media).collect().map(f => f.mediaId -> f.features.toSeq).toMap
    val f2 = Multimodal.extractFeatures(media.repartition(7)).collect().map(f => f.mediaId -> f.features.toSeq).toMap
    assert(f1 == f2, "features must not depend on partitioning")
    assert(f1.values.forall(_.size == Multimodal.featureDim))
  }

  /** A real PNG: left half black, right half white, `w`×`h`. */
  private def pngBytes(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, if (x < w / 2) 0x000000 else 0xffffff)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  test("real PNG payloads decode to true dimensions and luminance features") {
    val rows = Seq(
      Multimodal.MediaRow(1L, "image", pngBytes(32, 16),
        Multimodal.MediaMeta("image/png", 0, 0, 0L)),
      Multimodal.MediaRow(2L, "image", "not an image".getBytes("UTF-8"),
        Multimodal.MediaMeta("application/octet-stream", 5, 5, 0L)))
    val ds = spark.createDataset(rows)

    val probed = Multimodal.probeImageMeta(ds).collect().map(r => r.mediaId -> r.meta).toMap
    assert(probed(1L).width == 32 && probed(1L).height == 16,
      "decoded dimensions must come from the actual PNG header")
    assert(probed(2L).width == 5 && probed(2L).height == 5,
      "undecodable payloads keep their declared metadata")

    val feats = Multimodal.extractFeatures(ds).collect().map(f => f.mediaId -> f.features).toMap
    // 4x4 mean-pool of a half-black/half-white image: cell columns 0-1
    // are pure black (-1), columns 2-3 pure white (+1)
    val f = feats(1L)
    assert(f.length == Multimodal.featureDim)
    for (row <- 0 until 4; c <- 0 until 4) {
      val expected = if (c < 2) -1.0f else 1.0f
      assert(math.abs(f(row * 4 + c) - expected) < 0.02f,
        s"cell ($row,$c) = ${f(row * 4 + c)}, expected ~$expected")
    }
    // the fallback path still yields fixed-dimension deterministic features
    assert(feats(2L).length == Multimodal.featureDim)
    assert(feats(2L).toSeq == Multimodal.stubDecode("not an image".getBytes("UTF-8")).toSeq)
  }

  test("jpeg roundtrip decodes via the same JDK codec path") {
    val img = new java.awt.image.BufferedImage(8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 8) img.setRGB(x, y, 0x808080)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", out)
    val decoded = Multimodal.decodeImage(out.toByteArray)
    assert(decoded.isDefined)
    val (w, h, f) = decoded.get
    assert(w == 8 && h == 8 && f.length == Multimodal.featureDim)
  }

  /** A real 16-bit PCM WAV via the JDK writer. */
  private def wavBytes(samples: Array[Short], channels: Int,
                       sampleRate: Float): Array[Byte] = {
    import javax.sound.sampled._
    val fmt = new AudioFormat(sampleRate, 16, channels, true, false)
    val data = new Array[Byte](samples.length * 2)
    for (i <- samples.indices) {
      data(2 * i) = (samples(i) & 0xff).toByte
      data(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
    }
    val ais = new AudioInputStream(new java.io.ByteArrayInputStream(data),
      fmt, samples.length / channels)
    val out = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  test("real WAV payloads decode bit-exactly: duration and RMS envelope") {
    // 1600 mono frames at 8 kHz = exactly 200 ms; 16 blocks of 100
    // frames alternating amplitude 0 and 16384 (= 0.5 full-scale).
    // Every intermediate is an exact binary fraction, so the envelope
    // is BIT-exact: silent blocks → -1.0f, half-scale blocks → 0.0f.
    val samples = Array.tabulate[Short](1600) { i =>
      if ((i / 100) % 2 == 0) 0 else 16384.toShort
    }
    val (durationMs, feats) = Multimodal.decodeAudio(wavBytes(samples, 1, 8000f)).get
    assert(durationMs == 200L)
    val expected = Array.tabulate(Multimodal.featureDim)(k => if (k % 2 == 0) -1.0f else 0.0f)
    assert(feats.toSeq == expected.toSeq, s"got ${feats.toSeq}")

    // stereo: equal-and-opposite channels mix to digital silence
    val stereo = Array.tabulate[Short](800)(i => if (i % 2 == 0) 16384 else -16384)
    val (d2, f2) = Multimodal.decodeAudio(wavBytes(stereo, 2, 8000f)).get
    assert(d2 == 50L && f2.forall(_ == -1.0f), s"got $d2 ${f2.toSeq}")

    // non-WAV bytes refuse rather than mis-decode
    assert(Multimodal.decodeAudio("just text".getBytes("UTF-8")).isEmpty)

    // extractFeatures routes audio rows through the real decoder
    val rows = Seq(
      Multimodal.MediaRow(1L, "audio", wavBytes(samples, 1, 8000f),
        Multimodal.MediaMeta("audio/wav", 0, 0, 0L)),
      Multimodal.MediaRow(2L, "audio", "just text".getBytes("UTF-8"),
        Multimodal.MediaMeta("application/octet-stream", 0, 0, 0L)))
    val byId = Multimodal.extractFeatures(spark.createDataset(rows))
      .collect().map(f => f.mediaId -> f.features.toSeq).toMap
    assert(byId(1L) == expected.toSeq, "audio rows must use the WAV decoder")
    assert(byId(2L) == Multimodal.stubDecode("just text".getBytes("UTF-8")).toSeq,
      "undecodable audio falls back to the documented stub")
  }

  test("WAV with an unusable frame geometry returns None, never bogus features") {
    // a hand-built RIFF/PCM header declaring 0 channels and 0
    // blockAlign: frameSize is not positive, so the decoder must
    // refuse (None) rather than divide by it — a NOT_SPECIFIED (-1)
    // frameSize from a lax parser would otherwise yield a NEGATIVE
    // frame count that slips past an == 0 guard and fabricates a
    // negative duration with all -1f features.
    def le16(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def le32(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    val data = new Array[Byte](64)
    val fmtChunk = le16(1) ++ le16(0) ++ le32(8000) ++ le32(0) ++ le16(0) ++ le16(16)
    val body = "WAVE".getBytes("US-ASCII") ++
      "fmt ".getBytes("US-ASCII") ++ le32(fmtChunk.length) ++ fmtChunk ++
      "data".getBytes("US-ASCII") ++ le32(data.length) ++ data
    val wav = "RIFF".getBytes("US-ASCII") ++ le32(body.length) ++ body
    assert(Multimodal.decodeAudio(wav).isEmpty,
      "0-channel/0-blockAlign WAV must refuse, not fabricate features")
  }

  test("resize rewrites metadata and bounds payloads") {
    val r = Multimodal.resize(media, 8, 8).collect()
    assert(r.forall(m => m.meta.width == 8 && m.meta.height == 8))
    assert(r.forall(_.payload.nonEmpty))
  }

  test("frame sampling explodes video rows into per-frame rows") {
    val frames = Multimodal.sampleFrames(media, 4)
    val nVideo = media.filter(_.kind == "video").count()
    assert(frames.count() == nVideo * 4)
    assert(frames.map(_.frameIdx).distinct().collect().toSet == Set(0, 1, 2, 3))
  }

  /** A real JPEG frame: solid gray at `level` via the JDK encoder. */
  private def jpegFrame(w: Int, h: Int, level: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (level << 16) | (level << 8) | level
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", out)
    out.toByteArray
  }

  test("real AVI/MJPEG payloads decode bit-exactly: geometry, duration, features") {
    val frames = (0 until 6).map(i => jpegFrame(16, 12, i * 40))
    val avi = Multimodal.buildAvi(frames, 16, 12, usPerFrame = 40000L) // 25 fps
    val info = Multimodal.parseAvi(avi).get
    assert(info.width == 16 && info.height == 12)
    assert(info.nFrames == 6)
    assert(info.durationMs == 240L) // 6 frames x 40 ms
    val (w, h, dur, feats) = Multimodal.decodeVideo(avi).get
    assert(w == 16 && h == 12 && dur == 240L)
    assert(feats.length == Multimodal.featureDim)
    // bit-exact: the video features must equal the average of the
    // sampled frames' image features computed independently here
    val idxs = Multimodal.sampleIndices(6, 4)
    val perFrame = idxs.map(i => Multimodal.decodeImage(frames(i)).get._3)
    val expected = Array.tabulate(Multimodal.featureDim) { k =>
      (perFrame.map(_(k).toDouble).sum / perFrame.length).toFloat
    }
    assert(feats.toSeq == expected.toSeq)
  }

  test("AVI frame sampling emits the container's real JPEG frame bytes") {
    val frames = (0 until 6).map(i => jpegFrame(8, 8, 10 + i * 30))
    val avi = Multimodal.buildAvi(frames, 8, 8, 33333L)
    val ds = spark.createDataset(Seq(Multimodal.MediaRow(
      1L, "video", avi, Multimodal.MediaMeta("video/avi", 8, 8, 0L))))
    val out = Multimodal.sampleFrames(ds, 3).collect().sortBy(_.frameIdx)
    val idxs = Multimodal.sampleIndices(6, 3)
    assert(out.length == 3)
    out.zip(idxs).foreach { case (fr, fi) =>
      assert(fr.frame.toSeq == frames(fi).toSeq,
        "sampled frames must be the container's JPEG bytes, not slices")
      assert(Multimodal.decodeImage(fr.frame).isDefined)
    }
    // extractFeatures routes video rows through the real AVI decode
    val feats = Multimodal.extractFeatures(ds).head().features
    assert(feats.toSeq == Multimodal.decodeVideo(avi).get._4.toSeq)
  }

  test("non-AVI video payloads fall back cleanly, never crash") {
    assert(Multimodal.parseAvi("not a riff container".getBytes).isEmpty)
    assert(Multimodal.decodeVideo(Array[Byte](1, 2, 3)).isEmpty)
    val avi = Multimodal.buildAvi(Seq(jpegFrame(8, 8, 50)), 8, 8, 40000L)
    assert(Multimodal.parseAvi(avi.take(30)).isEmpty,
      "a truncated container must parse to None, not a partial read")
  }

  test("mp4 container parse: geometry, duration, frame count and codec, bit-exact") {
    // 640x360 avc1, timescale 1000 with duration 2500 -> 2500 ms, 75 frames
    val mp4 = Multimodal.buildMp4(640, 360, timescale = 1000L,
      duration = 2500L, nFrames = 75)
    val info = Multimodal.parseMp4(mp4).get
    assert(info == Multimodal.Mp4Info(640, 360, 2500L, 75L, "avc1"))
    // a different timescale: 90k ticks, 3 s
    val m2 = Multimodal.parseMp4(Multimodal.buildMp4(1920, 1080,
      timescale = 90000L, duration = 270000L, nFrames = 90, codec = "hev1")).get
    assert(m2 == Multimodal.Mp4Info(1920, 1080, 3000L, 90L, "hev1"))
    // not ISO-BMFF / truncated / video-less payloads parse to None
    assert(Multimodal.parseMp4("no boxes here".getBytes).isEmpty)
    assert(Multimodal.parseMp4(mp4.take(40)).isEmpty,
      "a truncated moov must parse to None, not a partial read")
    val avi = Multimodal.buildAvi(Seq(jpegFrame(8, 8, 50)), 8, 8, 40000L)
    assert(Multimodal.parseMp4(avi).isEmpty, "an AVI is not an ISO-BMFF file")
    // probeVideoMeta rewrites mp4 rows' meta from the real container
    val ds = spark.createDataset(Seq(
      Multimodal.MediaRow(1L, "video", mp4,
        Multimodal.MediaMeta("application/octet-stream", 1, 1, 0L)),
      Multimodal.MediaRow(2L, "video", avi,
        Multimodal.MediaMeta("application/octet-stream", 1, 1, 0L)),
      Multimodal.MediaRow(3L, "video", Array[Byte](9, 9, 9),
        Multimodal.MediaMeta("application/octet-stream", 1, 1, 0L))))
    val probed = Multimodal.probeVideoMeta(ds).collect().sortBy(_.mediaId)
    assert(probed(0).meta == Multimodal.MediaMeta("video/mp4;codec=avc1", 640, 360, 2500L))
    assert(probed(1).meta == Multimodal.MediaMeta("video/x-msvideo", 8, 8, 40L))
    assert(probed(2).meta.mime == "application/octet-stream",
      "unparseable payloads keep their declared meta")
  }

  test("mkv container parse: geometry, duration, frame count and codec, bit-exact") {
    // 1280x720 VP9, 1 ms ticks, 4500 ticks -> 4500 ms, 48 SimpleBlocks
    val mkv = Multimodal.buildMkv(1280, 720, scaleNs = 1000000L,
      durTicks = 4500.0, nFrames = 48)
    assert(Multimodal.parseMkv(mkv).get ==
      Multimodal.MkvInfo(1280, 720, 4500L, 48L, "V_VP9"))
    // a different timestamp scale: 0.5 ms ticks, 1000 ticks -> 500 ms
    val m2 = Multimodal.parseMkv(Multimodal.buildMkv(640, 360,
      scaleNs = 500000L, durTicks = 1000.0, nFrames = 10, codec = "V_AV1")).get
    assert(m2 == Multimodal.MkvInfo(640, 360, 500L, 10L, "V_AV1"))
    // not EBML / truncated / other-container payloads parse to None
    assert(Multimodal.parseMkv("not ebml at all".getBytes).isEmpty)
    assert(Multimodal.parseMkv(mkv.take(30)).isEmpty,
      "a truncated Segment must parse to None, not a partial read")
    assert(Multimodal.parseMkv(
      Multimodal.buildMp4(64, 64, 1000L, 1000L, 3)).isEmpty,
      "an ISO-BMFF file is not EBML")
    assert(Multimodal.parseMp4(mkv).isEmpty, "and vice versa")
    // multi-cluster files count blocks across ALL clusters
    assert(Multimodal.parseMkv(Multimodal.buildMkv(640, 360, 1000000L,
      100.0, nFrames = 30, clusters = 3)).get.nFrames == 30L)
    // the streamed-mkv layout: an unknown-size first cluster swallows
    // its successors as children in the walk — the recursive count
    // must still see every later cluster's blocks
    assert(Multimodal.parseMkv(Multimodal.buildMkv(640, 360, 1000000L,
      100.0, nFrames = 30, clusters = 3,
      unknownFirstClusterSize = true)).get.nFrames == 30L)
    // Xiph lacing: one SimpleBlock carrying 1 + 5 frames
    assert(Multimodal.parseMkv(Multimodal.buildMkv(640, 360, 1000000L,
      100.0, nFrames = 10, laceExtraInLast = 5)).get.nFrames == 15L)
    // probeVideoMeta routes mkv payloads through the EBML parse
    val probed = Multimodal.probeVideoMeta(spark.createDataset(Seq(
      Multimodal.MediaRow(1L, "video", mkv,
        Multimodal.MediaMeta("application/octet-stream", 1, 1, 0L)))))
      .collect()
    assert(probed(0).meta ==
      Multimodal.MediaMeta("video/x-matroska;codec=V_VP9", 1280, 720, 4500L))
  }

  test("perceptual media dedup: aHash is scale-invariant, pairs equal brute-force hamming") {
    def gradient(w: Int, h: Int, invert: Boolean, blankCorner: Boolean): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val v0 = (x * 255 / w + y * 255 / h) / 2
        val v = if (invert) 255 - v0 else v0
        val vv = if (blankCorner && x < w / 8 && y < h / 8) 255 else v
        img.setRGB(x, y, (vv << 16) | (vv << 8) | vv)
      }
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    def mr(id: Long, p: Array[Byte]) =
      Multimodal.MediaRow(id, "image", p, Multimodal.MediaMeta("x", 0, 0, 0L))
    val base = gradient(64, 64, invert = false, blankCorner = false)
    val scaled = gradient(128, 128, invert = false, blankCorner = false)
    val corner = gradient(64, 64, invert = false, blankCorner = true)
    val inverted = gradient(64, 64, invert = true, blankCorner = false)
    val blob = "definitely not an image at all".getBytes("UTF-8")
    val rows = Seq(mr(1, base), mr(2, scaled), mr(3, corner), mr(4, inverted),
      mr(5, blob), mr(6, blob.clone()))
    val ds = spark.createDataset(rows)

    // hash invariants, driver-side
    val hBase = Multimodal.aHash64(base).get
    assert(Multimodal.aHash64(base).get == hBase, "deterministic")
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(hBase, Multimodal.aHash64(scaled).get) <= 6,
      "mean-pool must make the hash resolution-invariant")
    assert(ham(hBase, Multimodal.aHash64(inverted).get) >= 32,
      "an inverted image must be far in hamming space")
    assert(Multimodal.aHash64(blob).isEmpty)

    // distributed hashes: real for images, md5-fallback for the blob
    val hs = Multimodal.imageHashes(ds).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(hs(1L) == ((hBase, true)))
    assert(!hs(5L)._2 && hs(5L) == hs(6L), "same bytes, same fallback hash")

    // banded+salted pairs must EQUAL brute-force hamming (pigeonhole
    // completeness at 8 bands / maxHamming 6), on any partitioning
    val want = (for {
      a <- rows; b <- rows if a.mediaId < b.mediaId
      d = ham(hs(a.mediaId)._1, hs(b.mediaId)._1) if d <= 6
    } yield (a.mediaId, b.mediaId, d.toLong)).toSet
    val got = Multimodal.mediaDupPairs(ds, maxHamming = 6).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want, s"pairs $got vs brute-force $want")
    assert(got.contains((5L, 6L, 0L)), "exact binary dup must pair via fallback")
    assert(got.exists { case (a, b, _) => a == 1L && b == 2L },
      "re-scaled copy must pair with its original")
    assert(!got.exists { case (a, b, _) => Set(a, b) == Set(1L, 4L) })
    val got2 = Multimodal.mediaDupPairs(
        spark.createDataset(rows).repartition(5), maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got2 == got, "partitioning must not change the pair set")
    // bad band configs fail loudly
    intercept[IllegalArgumentException] {
      Multimodal.mediaDupPairs(ds, maxHamming = 8, bands = 8)
    }
  }

  test("perceptual media dedup: pHash AC bits are exposure-invariant, pairs work through the DCT path") {
    def pattern(w: Int, h: Int, shift: Int, invert: Boolean): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        // mid-range deterministic TEXTURE (dense distinct DCT coefs —
        // a flat checker would park half the spectrum exactly at the
        // median, where 1e-14 cosine residue flips bits); scaled
        // coordinates so resolutions render the same image
        val (sx, sy) = (x * 64 / w, y * 64 / h)
        val v0 = 70 + ((sx * 13 + sy * 29 + (sx / 4) * (sy / 4) * 7) % 97)
        val v1 = if (invert) 255 - v0 else v0
        val v = math.max(0, math.min(255, v1 + shift))
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val base = pattern(64, 64, 0, invert = false)
    val h0 = Multimodal.pHash64(base).get
    assert(Multimodal.pHash64(base).get == h0, "deterministic")
    // a uniform brightness shift moves ONLY the DC coefficient: the
    // 63 AC bits are provably unchanged, so at most bit 0 may flip
    assert(ham(h0, Multimodal.pHash64(pattern(64, 64, 25, invert = false)).get) <= 1,
      "exposure shift must touch at most the DC bit")
    // resolution invariance through the 32x32 pool
    assert(ham(h0, Multimodal.pHash64(pattern(128, 128, 0, invert = false)).get) <= 6,
      "re-scale must stay within a few bits")
    // structurally different content is far
    assert(ham(h0, Multimodal.pHash64(pattern(64, 64, 0, invert = true)).get) >= 20,
      "inverted structure must be far in hamming space")
    assert(Multimodal.pHash64("not an image".getBytes("UTF-8")).isEmpty)
    // the pair machinery runs the DCT path end-to-end: the exposure-
    // shifted copy pairs with its original, the inverted one doesn't
    def mr(id: Long, p: Array[Byte]) =
      Multimodal.MediaRow(id, "image", p, Multimodal.MediaMeta("x", 0, 0, 0L))
    val ds = spark.createDataset(Seq(
      mr(1, base), mr(2, pattern(64, 64, 25, invert = false)),
      mr(3, pattern(64, 64, 0, invert = true))))
    val pairs = Multimodal.mediaDupPairs(ds, maxHamming = 6, method = "phash")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)), s"got $pairs")
    intercept[IllegalArgumentException] {
      Multimodal.imageHashes(ds, method = "dhash")
    }
  }

  test("partition sizing bounds per-partition payload bytes") {
    val sized = Multimodal.sizePartitions(media, targetBytes = 4096)
    assert(sized.rdd.getNumPartitions > 1)
    assert(sized.count() == media.count())
  }

  test("audio fingerprint: volume-invariant envelope bits, dedup pairs through the audio path") {
    // 64 blocks of 100 constant-valued mono frames at 8 kHz: the RMS
    // envelope bins land exactly on the blocks, loud (amp) vs soft
    // (amp/8) patterns drive the bits. All-exact binary arithmetic.
    def wavPattern(loud: Int => Boolean, amp: Short): Array[Byte] = {
      val samples = Array.tabulate(6400) { i =>
        val block = i / 100
        if (loud(block)) amp else (amp / 8).toShort
      }
      wavBytes(samples, 1, 8000f)
    }
    val base = wavPattern(_ % 3 == 0, 16384)
    val halfVol = wavPattern(_ % 3 == 0, 8192)
    val unrelated = wavPattern(_ % 5 == 0, 16384)
    val blob = "definitely not audio".getBytes("UTF-8")

    val hBase = Multimodal.audioHash64(base).get
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(Multimodal.audioHash64(base).get == hBase, "deterministic")
    // the envelope scales uniformly with volume and so does its
    // median: the bit pattern is volume-INVARIANT
    assert(ham(hBase, Multimodal.audioHash64(halfVol).get) == 0,
      "half-volume copy must fingerprint identically")
    // loud sets {3k} vs {5k} differ on 25 of 64 blocks
    assert(ham(hBase, Multimodal.audioHash64(unrelated).get) >= 8,
      "a different loudness contour must be far in hamming space")
    assert(Multimodal.audioHash64(blob).isEmpty, "non-WAV refuses")
    // exactly the loud blocks set bits: 22 of {0,3,6,...,63}
    assert(java.lang.Long.bitCount(hBase) == 22, "bits = loud blocks")

    def mr(id: Long, p: Array[Byte]) =
      Multimodal.MediaRow(id, "audio", p, Multimodal.MediaMeta("audio/wav", 0, 0, 0L))
    val rows = Seq(mr(1, base), mr(2, halfVol), mr(3, unrelated),
      mr(4, blob), mr(5, blob.clone()))
    val ds = spark.createDataset(rows)
    val hs = Multimodal.imageHashes(ds, method = "audio").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(hs(1L) == ((hBase, true)))
    assert(!hs(4L)._2 && hs(4L) == hs(5L), "same bytes, same fallback hash")
    // banded pairs equal brute-force hamming through the audio method
    val want = (for {
      a <- rows; b <- rows if a.mediaId < b.mediaId
      d = ham(hs(a.mediaId)._1, hs(b.mediaId)._1) if d <= 6
    } yield (a.mediaId, b.mediaId, d.toLong)).toSet
    val got = Multimodal.mediaDupPairs(ds, maxHamming = 6, method = "audio")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want, s"pairs $got vs brute-force $want")
    assert(got.contains((1L, 2L, 0L)), "volume-scaled copy must pair")
    assert(got.contains((4L, 5L, 0L)), "exact binary dup pairs via fallback")
    assert(!got.exists { case (a, b, _) => Set(a, b) == Set(1L, 3L) },
      "different contours must not pair")
  }
}
