package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling (SURVEY §2 C12): image/audio/video as
  * opaque binary columns with typed metadata, plus the
  * decode / feature-extract / resize / frame-sample plumbing a
  * training-data pipeline runs over them.
  *
  * IMAGE decode is real — `javax.imageio` ships in the JDK (PNG, BMP,
  * GIF, JPEG), see [[decodeImage]] — and so is WAV AUDIO decode via
  * `javax.sound.sampled` ([[decodeAudio]]), and AVI/MJPEG VIDEO decode
  * via a pure-JDK RIFF container walk + per-frame JPEG decode
  * ([[decodeVideo]]). mp4/mov and mkv/webm CONTAINERS parse for real
  * too — a pure ISO-BMFF box walk ([[parseMp4]]) and a pure EBML walk
  * ([[parseMkv]]): geometry, duration, frame count, codec tag — so
  * only the frame PIXELS of codecs the JDK does not ship
  * (H.264/HEVC/VP9) fall back to the deterministic [[stubDecode]],
  * and everything Spark-side is real and load-bearing either way: the
  * schema contract, the typed Dataset plumbing, mapPartitions batching
  * (the shape a vectorized codec UDF needs: reuse one decoder instance
  * per partition, process in fixed-size batches), and partition sizing
  * so one partition's batch of media fits executor memory at 100 TB.
  */
object Multimodal {

  case class MediaMeta(mime: String, width: Int, height: Int, durationMs: Long)
  case class MediaRow(mediaId: Long, kind: String, payload: Array[Byte], meta: MediaMeta)
  case class MediaFeatures(mediaId: Long, kind: String, features: Array[Float])
  case class MediaFrame(mediaId: Long, frameIdx: Int, frame: Array[Byte])

  val featureDim = 16
  val decodeBatchSize = 64

  /** ======= STUB ======= deterministic fake decode for the one thing
    * pure JDK cannot do: FRAME PIXELS of codecs it does not ship
    * (H.264/HEVC/VP9 inside mp4 — whose container metadata
    * [[parseMp4]] reads for real — plus mkv and exotic image/audio
    * formats): a real deployment swaps this one function for a codec
    * call (JNI/ONNX/ffmpeg); the byte→feature contract and everything
    * calling it stay unchanged.
    */
  def stubDecode(payload: Array[Byte]): Array[Float] = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(payload)
    Array.tabulate(featureDim)(i => (((d(i % 16) & 0xff) - 128) / 128.0f))
  }

  /** REAL image decode for the formats the JDK ships codecs for —
    * PNG/BMP/GIF/JPEG via `javax.imageio`, no external libraries, no
    * egress. Returns (width, height, features): features are a
    * deterministic 4×4 luminance mean-pool (16 = featureDim values in
    * [-1, 1)) — the classic cheap visual fingerprint, and partition-
    * order independent. `None` for payloads ImageIO can't parse
    * (audio/video/unknown bytes) — callers fall back to [[stubDecode]],
    * which remains the documented stand-in for codecs the container
    * lacks.
    */
  def decodeImage(payload: Array[Byte]): Option[(Int, Int, Array[Float])] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val grid = 4
        val sums = new Array[Double](grid * grid)
        val counts = new Array[Long](grid * grid)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val lum = ((rgb >> 16) & 0xff) * 0.299 +
              ((rgb >> 8) & 0xff) * 0.587 + (rgb & 0xff) * 0.114
            val cell = math.min(grid - 1, y * grid / h) * grid + math.min(grid - 1, x * grid / w)
            sums(cell) += lum
            counts(cell) += 1
            x += 1
          }
          y += 1
        }
        val feats = Array.tabulate(featureDim) { i =>
          if (counts(i) == 0) 0f
          else ((sums(i) / counts(i)) / 127.5 - 1.0).toFloat
        }
        Some((w, h, feats))
      }
    } catch { case _: Exception => None }

  /** REAL audio decode for the format the JDK ships a parser for —
    * WAV (RIFF) with 16-bit signed PCM via `javax.sound.sampled`, no
    * external libraries. Returns (durationMs, features): features are
    * a deterministic 16-bin RMS energy envelope over the mono-mixed
    * signal, mapped to [-1, 1) — the cheap audio fingerprint twin of
    * [[decodeImage]]'s luminance pool. `None` for non-WAV / non-PCM16
    * payloads — those fall back to [[stubDecode]], which now stands in
    * for VIDEO codecs only.
    */
  def decodeAudio(payload: Array[Byte]): Option[(Long, Array[Float])] =
    pcmEnvelope(payload, featureDim).map { case (durationMs, rms) =>
      // same arithmetic chain as always: rms·2−1 into [-1, 1), empty
      // cells keep the -1f sentinel
      (durationMs, rms.map(r =>
        if (r < 0) -1f else (r * 2.0 - 1.0).toFloat))
    }

  /** Shared WAV/PCM16 parse + per-bin RMS energy envelope: the
    * primitive under [[decodeAudio]] (16 feature bins) and
    * [[audioHash64]] (64 signature bins). Returns (durationMs,
    * rms-per-bin) with −1.0 marking bins no frame landed in (shorter
    * clip than bins); `None` for non-WAV / non-PCM16 payloads.
    */
  private def pcmEnvelope(payload: Array[Byte],
                          bins: Int): Option[(Long, Array[Double])] =
    try {
      import javax.sound.sampled.{AudioFormat, AudioSystem}
      val in = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = in.getFormat
        if (fmt.getEncoding != AudioFormat.Encoding.PCM_SIGNED ||
          fmt.getSampleSizeInBits != 16) None
        else {
          val bytes = in.readAllBytes()
          val frameSize = fmt.getFrameSize
          val channels = fmt.getChannels
          val rate = fmt.getFrameRate
          // frameSize/rate/channels can each be
          // AudioSystem.NOT_SPECIFIED (-1): a negative frameSize makes
          // nFrames negative, which would slip past an == 0 guard and
          // return a negative duration with all -1 bins instead
          // of None. Guard them all BEFORE deriving nFrames; and the
          // duration division must run in Double — a Float quotient
          // loses ms precision once nFrames*1000 passes 2^24
          val nFrames = if (frameSize <= 0) 0 else bytes.length / frameSize
          if (frameSize <= 0 || channels <= 0 || nFrames <= 0 || rate <= 0) None
          else {
            val durationMs = math.round(nFrames * 1000.0 / rate)
            val sums = new Array[Double](bins)
            val counts = new Array[Long](bins)
            var i = 0
            while (i < nFrames) {
              var c = 0
              var acc = 0.0
              while (c < channels) {
                val off = i * frameSize + c * 2
                val s =
                  if (fmt.isBigEndian) (bytes(off) << 8) | (bytes(off + 1) & 0xff)
                  else (bytes(off + 1) << 8) | (bytes(off) & 0xff)
                acc += s / 32768.0
                c += 1
              }
              val v = acc / channels
              val cell = math.min(bins - 1, (i.toLong * bins / nFrames).toInt)
              sums(cell) += v * v
              counts(cell) += 1
              i += 1
            }
            val rms = Array.tabulate(bins) { k =>
              if (counts(k) == 0) -1.0
              else math.sqrt(sums(k) / counts(k))
            }
            Some((durationMs, rms))
          }
        }
      } finally in.close()
    } catch { case _: Exception => None }

  /** 64-bit audio fingerprint — [[aHash64]]'s time-domain sibling for
    * WAV payloads: the 64-bin RMS energy envelope of the mono-mixed
    * signal, bit k set iff envelope(k) > the envelope's lower median.
    * Median (not mean) so one transient spike can't tilt every bit,
    * and the hash is volume-SHAPE driven: re-encoded/resampled copies
    * keep their loudness contour, so they land within small hamming
    * distance, while the envelope's 64-way time slicing makes
    * unrelated clips agree on ~32 bits — the same contract the image
    * hashes carry into [[mediaDupPairs]]. Empty bins (clip shorter
    * than 64 frames) count as silence (0). Deterministic pure-JDK
    * arithmetic; `None` for non-WAV/non-PCM16 payloads (callers fall
    * back to the md5 exact-only hash, the imageHashes convention).
    */
  def audioHash64(payload: Array[Byte]): Option[Long] =
    pcmEnvelope(payload, 64).map { case (_, rmsRaw) =>
      val rms = rmsRaw.map(r => if (r < 0) 0.0 else r)
      val sorted = rms.sorted
      val med = sorted(31) // lower median of 64
      var bits = 0L
      var k = 0
      while (k < 64) {
        if (rms(k) > med) bits |= (1L << k)
        k += 1
      }
      bits
    }

  /** Parsed AVI container: header geometry + the byte ranges of the
    * stream-0 video frame chunks (`00dc`/`00db`), in stream order.
    */
  case class AviInfo(width: Int, height: Int, usPerFrame: Long,
                     frameChunks: Vector[(Int, Int)]) {
    def nFrames: Int = frameChunks.length
    def durationMs: Long = math.round(nFrames * usPerFrame / 1000.0)
  }

  private def u32le(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  private def fourcc(b: Array[Byte], off: Int): String =
    new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** REAL video container parse for the format the JDK can take end to
    * end — AVI (RIFF, same chunk discipline as WAV) holding MJPEG
    * frames, each of which [[decodeImage]]'s `javax.imageio` JPEG codec
    * decodes. Pure-JDK RIFF walk: `avih` supplies geometry and frame
    * timing, the `movi` list supplies per-frame byte ranges. `None`
    * for payloads that are not a well-formed AVI.
    */
  def parseAvi(payload: Array[Byte]): Option[AviInfo] =
    try {
      if (payload.length < 12 || fourcc(payload, 0) != "RIFF" ||
        fourcc(payload, 8) != "AVI ") None
      else {
        var usPerFrame = 0L
        var w = 0
        var h = 0
        val frames = Vector.newBuilder[(Int, Int)]
        def walk(start: Int, end: Int): Unit = {
          var p = start
          while (p + 8 <= end) {
            val id = fourcc(payload, p)
            val sz = u32le(payload, p + 4).toInt
            val body = p + 8
            if (sz < 0 || body + sz > end) return // truncated/corrupt: stop
            if (id == "LIST" && sz >= 4) {
              walk(body + 4, body + sz) // recurse into hdrl/strl/movi
            } else if (id == "avih" && sz >= 40) {
              usPerFrame = u32le(payload, body)
              w = u32le(payload, body + 32).toInt
              h = u32le(payload, body + 36).toInt
            } else if (id.startsWith("00") &&
              (id.endsWith("dc") || id.endsWith("db"))) {
              frames += ((body, sz)) // stream-0 video frame (compressed/raw)
            }
            p = body + sz + (sz & 1) // RIFF chunks pad to even offsets
          }
        }
        val riffEnd = math.min(payload.length.toLong, 8L + u32le(payload, 4)).toInt
        walk(12, riffEnd)
        val fs = frames.result()
        if (fs.isEmpty || w <= 0 || h <= 0) None
        else Some(AviInfo(w, h, usPerFrame, fs))
      }
    } catch { case _: Exception => None }

  /** REAL video decode: parse the AVI container, JPEG-decode up to 4
    * evenly sampled frames through [[decodeImage]], and average their
    * luminance-pool features. Returns (width, height, durationMs,
    * features); `None` when the container doesn't parse or no sampled
    * frame decodes — those payloads fall back to [[stubDecode]].
    */
  def decodeVideo(payload: Array[Byte]): Option[(Int, Int, Long, Array[Float])] =
    parseAvi(payload).flatMap { info =>
      val feats = sampleIndices(info.nFrames, 4)
        .flatMap { i =>
          val (off, len) = info.frameChunks(i)
          decodeImage(java.util.Arrays.copyOfRange(payload, off, off + len)).map(_._3)
        }
      if (feats.isEmpty) None
      else {
        val avg = Array.tabulate(featureDim) { k =>
          (feats.map(_(k).toDouble).sum / feats.length).toFloat
        }
        Some((info.width, info.height, info.durationMs, avg))
      }
    }

  /** Up to `k` evenly spaced indices over [0, n): frame-sampling grid
    * shared by [[decodeVideo]] and [[sampleFrames]].
    */
  private[graft] def sampleIndices(n: Int, k: Int): Vector[Int] =
    if (n <= 0) Vector.empty
    else if (n <= k) (0 until n).toVector
    else (0 until k).map(j => (j.toLong * (n - 1) / (k - 1)).toInt).toVector

  /** AVI/MJPEG container writer — the fixture generator twin of
    * [[mediaTable]]: wraps pre-encoded JPEG frames in a minimal
    * RIFF(hdrl(avih) movi(00dc...)) layout that [[parseAvi]] and any
    * standard AVI reader accept.
    */
  def buildAvi(frames: Seq[Array[Byte]], w: Int, h: Int, usPerFrame: Long): Array[Byte] = {
    def u32(v: Long): Array[Byte] = Array(
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def chunk(id: String, body: Array[Byte]): Array[Byte] =
      id.getBytes("US-ASCII") ++ u32(body.length.toLong) ++ body ++
        (if (body.length % 2 == 1) Array(0.toByte) else Array.empty[Byte])
    def list(typ: String, body: Array[Byte]): Array[Byte] =
      "LIST".getBytes("US-ASCII") ++ u32(body.length + 4L) ++
        typ.getBytes("US-ASCII") ++ body
    val avih = chunk("avih",
      u32(usPerFrame) ++ u32(0) ++ u32(0) ++ u32(0) ++
        u32(frames.length.toLong) ++ u32(0) ++ u32(1) ++ u32(0) ++
        u32(w.toLong) ++ u32(h.toLong) ++ Array.fill(16)(0.toByte))
    val hdrl = list("hdrl", avih)
    val movi = list("movi", frames.toArray.flatMap(f => chunk("00dc", f)))
    val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    "RIFF".getBytes("US-ASCII") ++ u32(body.length.toLong) ++ body
  }

  /** 24-bit uncompressed BMP writer — the still-image fixture twin of
    * [[buildAvi]]: `gray` supplies one 0–255 luma per pixel in
    * row-major TOP-DOWN order (re-ordered here into BMP's bottom-up
    * rows), written as B=G=R. Every byte is assembled here, so the
    * output is deterministic by construction and its length is a pure
    * function of geometry (54 + h·ceil4(3w) bytes) — which is what
    * lets a cross-engine oracle pin the byte mass of an image export
    * without an image codec. ImageIO decodes it ([[decodeImage]]),
    * so downstream hashing/dedup treat it as a real image.
    */
  def buildBmp(w: Int, h: Int, gray: Seq[Int]): Array[Byte] = {
    require(w > 0 && h > 0 && gray.length == w * h,
      s"buildBmp: need $w*$h=${w * h} pixels, got ${gray.length}")
    def u32(v: Long): Array[Byte] = Array(
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def u16(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    val stride = ((3 * w + 3) / 4) * 4
    val imageSize = stride * h
    val header =
      "BM".getBytes("US-ASCII") ++ u32(54L + imageSize) ++ u32(0) ++ u32(54) ++
        u32(40) ++ u32(w.toLong) ++ u32(h.toLong) ++ u16(1) ++ u16(24) ++
        u32(0) ++ u32(imageSize.toLong) ++ u32(2835) ++ u32(2835) ++
        u32(0) ++ u32(0)
    val px = new Array[Byte](imageSize)
    var y = 0
    while (y < h) {
      val srcRow = h - 1 - y // bottom-up storage
      var x = 0
      while (x < w) {
        val g = (gray(srcRow * w + x) & 0xff).toByte
        val o = y * stride + 3 * x
        px(o) = g; px(o + 1) = g; px(o + 2) = g
        x += 1
      }
      y += 1
    }
    header ++ px
  }

  /** Parsed ISO-BMFF (mp4/mov) container: video-track geometry,
    * movie duration, sample (frame) count and the sample-entry codec
    * fourcc — everything the CONTAINER declares, without decoding a
    * frame (the codec boundary: the JDK ships no H.264/HEVC/VP9
    * decoder, so frame PIXELS are the only part [[stubDecode]] still
    * stands in for on mp4).
    */
  case class Mp4Info(width: Int, height: Int, durationMs: Long,
                     nFrames: Long, codec: String)

  private def u32be(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)

  private def u64be(b: Array[Byte], off: Int): Long =
    (u32be(b, off) << 32) | u32be(b, off + 4)

  /** REAL mp4/mov container parse — a pure-JDK ISO-BMFF box walk
    * (`ftyp` gate, then `moov/mvhd` for timescale+duration and the
    * first `trak` whose `mdia/hdlr` handler is `vide`: `tkhd` for
    * 16.16-fixed geometry, `stbl/stsd` for the codec fourcc,
    * `stbl/stsz` for the sample count). 64-bit largesize boxes and
    * version-1 headers handled; `None` for anything that is not a
    * well-formed ISO-BMFF file with a video track.
    */
  def parseMp4(payload: Array[Byte]): Option[Mp4Info] =
    try {
      // (type, bodyStart, boxEnd) for each box in [start, end)
      def children(start: Int, end: Int): Vector[(String, Int, Int)] = {
        val out = Vector.newBuilder[(String, Int, Int)]
        var p = start
        var corrupt = false
        while (!corrupt && p + 8 <= end) {
          var sz = u32be(payload, p)
          var body = p + 8
          val typ = fourcc(payload, p + 4)
          if (sz == 1 && p + 16 <= end) { sz = u64be(payload, p + 8); body = p + 16 }
          else if (sz == 0) sz = (end - p).toLong
          if (sz < (body - p).toLong || p.toLong + sz > end) corrupt = true
          else { out += ((typ, body, (p + sz).toInt)); p = (p + sz).toInt }
        }
        out.result()
      }
      val top = children(0, payload.length)
      if (!top.exists(_._1 == "ftyp")) None
      else top.find(_._1 == "moov").flatMap { case (_, ms, me) =>
        val moov = children(ms, me)
        var durMs = 0L
        moov.find(_._1 == "mvhd").foreach { case (_, s, _) =>
          val v1 = (payload(s) & 0xff) == 1
          val timescale = if (v1) u32be(payload, s + 20) else u32be(payload, s + 12)
          val dur = if (v1) u64be(payload, s + 24) else u32be(payload, s + 16)
          if (timescale > 0) durMs = math.round(dur * 1000.0 / timescale)
        }
        moov.filter(_._1 == "trak").iterator.flatMap { case (_, ts, te) =>
          val trak = children(ts, te)
          val mdia = trak.find(_._1 == "mdia")
            .map { case (_, s, e) => children(s, e) }.getOrElse(Vector.empty)
          val isVideo = mdia.find(_._1 == "hdlr").exists { case (_, s, e) =>
            s + 12 <= e && fourcc(payload, s + 8) == "vide"
          }
          if (!isVideo) Iterator.empty
          else {
            val (w, h) = trak.find(_._1 == "tkhd").map { case (_, s, e) =>
              // width/height are 16.16 fixed point after version+flags,
              // ctimes/id/duration (v0: 20 B, v1: 32 B), 16 B of
              // layer/volume reserveds, and the 36 B matrix
              val base = s + 4 + (if ((payload(s) & 0xff) == 1) 32 else 20) + 16 + 36
              if (base + 8 <= e)
                ((u32be(payload, base) >> 16).toInt, (u32be(payload, base + 4) >> 16).toInt)
              else (0, 0)
            }.getOrElse((0, 0))
            val stbl = mdia.find(_._1 == "minf")
              .map { case (_, s, e) => children(s, e) }.getOrElse(Vector.empty)
              .find(_._1 == "stbl")
              .map { case (_, s, e) => children(s, e) }.getOrElse(Vector.empty)
            val codec = stbl.find(_._1 == "stsd").collect {
              case (_, s, e) if s + 16 <= e && u32be(payload, s + 4) >= 1 =>
                fourcc(payload, s + 12)
            }.getOrElse("")
            val nFrames = stbl.find(_._1 == "stsz").collect {
              case (_, s, e) if s + 12 <= e => u32be(payload, s + 8)
            }.getOrElse(0L)
            if (w <= 0 || h <= 0) Iterator.empty
            else Iterator.single(Mp4Info(w, h, durMs, nFrames, codec))
          }
        }.nextOption()
      }
    } catch { case _: Exception => None }

  /** ISO-BMFF fixture writer — the mp4 twin of [[buildAvi]]: a minimal
    * ftyp + moov(mvhd, trak(tkhd, mdia(hdlr, minf(stbl(stsd, stsz)))))
    * + mdat layout that [[parseMp4]] (and any box-walking reader)
    * accepts.
    */
  def buildMp4(w: Int, h: Int, timescale: Long, duration: Long,
               nFrames: Int, codec: String = "avc1"): Array[Byte] = {
    def u32(v: Long): Array[Byte] = Array(
      ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def box(typ: String, body: Array[Byte]): Array[Byte] =
      u32(body.length + 8L) ++ typ.getBytes("US-ASCII") ++ body
    val unity = u32(0x00010000L) ++ u32(0) ++ u32(0) ++
      u32(0) ++ u32(0x00010000L) ++ u32(0) ++ u32(0) ++ u32(0) ++ u32(0x40000000L)
    val ftyp = box("ftyp", "isom".getBytes("US-ASCII") ++ u32(0x200) ++
      "isom".getBytes("US-ASCII") ++ "mp42".getBytes("US-ASCII"))
    val mvhd = box("mvhd", u32(0) ++ u32(0) ++ u32(0) ++ u32(timescale) ++
      u32(duration) ++ u32(0x00010000L) ++ u32(0x01000000L) ++ u32(0) ++ u32(0) ++
      unity ++ Array.fill(24)(0.toByte) ++ u32(2))
    val tkhd = box("tkhd", u32(7) ++ u32(0) ++ u32(0) ++ u32(1) ++ u32(0) ++
      u32(duration) ++ Array.fill(16)(0.toByte) ++ unity ++
      u32(w.toLong << 16) ++ u32(h.toLong << 16))
    val hdlr = box("hdlr", u32(0) ++ u32(0) ++ "vide".getBytes("US-ASCII") ++
      Array.fill(12)(0.toByte) ++ Array(0.toByte))
    val stsd = box("stsd", u32(0) ++ u32(1) ++
      box(codec, Array.fill(78)(0.toByte)))
    val stsz = box("stsz", u32(0) ++ u32(0) ++ u32(nFrames.toLong) ++
      (0 until nFrames).toArray.flatMap(_ => u32(100)))
    val stbl = box("stbl", stsd ++ stsz)
    val minf = box("minf", stbl)
    val mdia = box("mdia", hdlr ++ minf)
    val trak = box("trak", tkhd ++ mdia)
    val moov = box("moov", mvhd ++ trak)
    val mdat = box("mdat", Array.fill(8)(0.toByte))
    ftyp ++ moov ++ mdat
  }

  /** Parsed Matroska/WebM container: video-track geometry, segment
    * duration, block (frame) count for the video track, and the
    * declared codec id — everything the CONTAINER declares, without
    * decoding a frame (the same codec boundary as [[Mp4Info]]).
    */
  case class MkvInfo(width: Int, height: Int, durationMs: Long,
                     nFrames: Long, codec: String)

  /** REAL mkv/webm container parse — a pure-JDK EBML walk (`EBML`
    * header gate, then `Segment`: `Info` for TimestampScale +
    * Duration, the first `Tracks/TrackEntry` whose TrackType is
    * video for TrackNumber/CodecID/`Video`(PixelWidth, PixelHeight),
    * and a `Cluster` walk counting the video track's SimpleBlocks /
    * BlockGroup Blocks). Unknown-size elements (all-ones VINT — the
    * streamed-mkv convention) extend to the parent's end; `None` for
    * anything that is not well-formed EBML with a video track.
    */
  def parseMkv(payload: Array[Byte]): Option[MkvInfo] =
    try {
      // EBML VINT: leading-zero count of the first byte gives the
      // width; ids KEEP the marker bit (that's how they are specified),
      // sizes strip it. Returns (value, width, allOnes).
      def vint(off: Int, keepMarker: Boolean): (Long, Int, Boolean) = {
        val first = payload(off) & 0xff
        if (first == 0) throw new IllegalArgumentException("bad vint")
        val len = Integer.numberOfLeadingZeros(first) - 23 // 1..8
        var v = (if (keepMarker) first else first & (0xff >>> len)).toLong
        var ones = !keepMarker && (first & (0xff >>> len)) == (0xff >>> len)
        for (i <- 1 until len) {
          val b = payload(off + i) & 0xff
          v = (v << 8) | b
          ones &&= b == 0xff
        }
        (v, len, ones)
      }
      // (id, bodyStart, bodyEnd) for each element in [start, end)
      def children(start: Int, end: Int): Vector[(Long, Int, Int)] = {
        val out = Vector.newBuilder[(Long, Int, Int)]
        var p = start
        var corrupt = false
        while (!corrupt && p < end) {
          val (id, idLen, _) = vint(p, keepMarker = true)
          val (sz, szLen, unknown) = vint(p + idLen, keepMarker = false)
          val body = p + idLen + szLen
          val bodyEnd = if (unknown) end else body + sz
          if (body > end || bodyEnd > end || bodyEnd < body) corrupt = true
          else { out += ((id, body, bodyEnd.toInt)); p = bodyEnd.toInt }
        }
        out.result()
      }
      def uint(s: Int, e: Int): Long =
        (s until e).foldLeft(0L)((acc, i) => (acc << 8) | (payload(i) & 0xffL))
      def float(s: Int, e: Int): Double = (e - s) match {
        case 4 => java.lang.Float.intBitsToFloat(u32be(payload, s).toInt).toDouble
        case 8 => java.lang.Double.longBitsToDouble(u64be(payload, s))
        case _ => 0.0
      }
      val top = children(0, payload.length)
      if (!top.exists(_._1 == 0x1A45DFA3L)) None // EBML header
      else top.find(_._1 == 0x18538067L).flatMap { case (_, ss, se) => // Segment
        val seg = children(ss, se)
        var scaleNs = 1000000L // TimestampScale default: 1 ms ticks
        var durTicks = 0.0
        seg.find(_._1 == 0x1549A966L).foreach { case (_, s, e) => // Info
          val info = children(s, e)
          info.find(_._1 == 0x2AD7B1L).foreach { case (_, a, b) => scaleNs = uint(a, b) }
          info.find(_._1 == 0x4489L).foreach { case (_, a, b) => durTicks = float(a, b) }
        }
        val video = seg.find(_._1 == 0x1654AE6BL).toVector // Tracks
          .flatMap { case (_, s, e) => children(s, e) }
          .filter(_._1 == 0xAEL) // TrackEntry
          .map { case (_, s, e) => children(s, e) }
          .find(_.exists { case (id, a, b) => id == 0x83L && uint(a, b) == 1L })
        video.flatMap { entry =>
          val trackNum = entry.collectFirst {
            case (0xD7L, a, b) => uint(a, b) }.getOrElse(1L)
          val codec = entry.collectFirst { case (0x86L, a, b) =>
            new String(payload.slice(a, b), "US-ASCII") }.getOrElse("")
          val (w, h) = entry.collectFirst { case (0xE0L, a, b) => // Video
            val v = children(a, b)
            (v.collectFirst { case (0xB0L, x, y) => uint(x, y).toInt }.getOrElse(0),
              v.collectFirst { case (0xBAL, x, y) => uint(x, y).toInt }.getOrElse(0))
          }.getOrElse((0, 0))
          // frame count: blocks of this track across all Clusters. A
          // Simple/Block body is track-VINT, 2-byte timestamp, flags;
          // lace bits (0x06) add a frames-1 count byte the container
          // declares without any frame decode. An UNKNOWN-size
          // Cluster (the streamed-mkv convention) extends to the
          // Segment end in this walk and swallows its successors as
          // children — so recurse into nested Clusters/BlockGroups
          // instead of assuming one flat Cluster level, or every
          // cluster after the first would go uncounted.
          // bounds-checked against the block element's OWN bodyEnd: a
          // truncated Simple/Block must count 0 like every other
          // malformed-EBML path, not read flag/lace bytes that land
          // inside the next sibling element (still within payload, so
          // no exception would flag it)
          def blockFrames(a: Int, end: Int): Long = {
            val (tn, tl, _) = vint(a, keepMarker = false)
            if (tn != trackNum) 0L
            else if (a + tl + 2 >= end) 0L // no room for ts + flags
            else if ((payload(a + tl + 2) & 0x06) != 0) {
              if (a + tl + 3 >= end) 0L // lacing declared, count missing
              else 1L + (payload(a + tl + 3) & 0xff)
            } else 1L
          }
          def countIn(start: Int, end: Int): Long =
            children(start, end).map {
              case (0xA3L, a, b) => blockFrames(a, b) // SimpleBlock
              case (0xA1L, a, b) => blockFrames(a, b) // Block
              case (0xA0L, a, b) => countIn(a, b) // BlockGroup
              case (0x1F43B366L, a, b) => countIn(a, b) // nested Cluster
              case _ => 0L
            }.sum
          val nFrames = seg.filter(_._1 == 0x1F43B366L)
            .map { case (_, s, e) => countIn(s, e) }.sum
          val durMs = math.round(durTicks * scaleNs / 1e6)
          if (w <= 0 || h <= 0) None
          else Some(MkvInfo(w, h, durMs, nFrames, codec))
        }
      }
    } catch { case _: Exception => None }

  /** EBML fixture writer — the mkv twin of [[buildMp4]]: a minimal
    * EBML + Segment(Info(TimestampScale, Duration), Tracks(TrackEntry(
    * TrackNumber, TrackType=video, CodecID, Video(PixelWidth,
    * PixelHeight))), Cluster(SimpleBlock...)) layout that [[parseMkv]]
    * (and any EBML reader) accepts.
    */
  def buildMkv(w: Int, h: Int, scaleNs: Long, durTicks: Double,
               nFrames: Int, codec: String = "V_VP9",
               clusters: Int = 1, unknownFirstClusterSize: Boolean = false,
               laceExtraInLast: Int = 0): Array[Byte] = {
    def be(v: Long, n: Int): Array[Byte] =
      (0 until n).map(i => ((v >> (8 * (n - 1 - i))) & 0xff).toByte).toArray
    def size(n: Int): Array[Byte] = {
      // 2-byte VINT ceiling: a bigger body would silently encode a
      // WRONG length and yield a fixture parseMkv quietly miscounts —
      // fail loudly at build time instead
      require(n < 16383, s"buildMkv body of $n bytes exceeds 2-byte VINT")
      if (n < 127) Array((0x80 | n).toByte)
      else Array((0x40 | (n >> 8)).toByte, (n & 0xff).toByte)
    }
    def el(idBytes: Array[Byte], body: Array[Byte]): Array[Byte] =
      idBytes ++ size(body.length) ++ body
    val ebml = el(be(0x1A45DFA3L, 4), Array.empty)
    val info = el(be(0x1549A966L, 4),
      el(be(0x2AD7B1L, 3), be(scaleNs, 8)) ++
        el(be(0x4489L, 2), be(java.lang.Double.doubleToLongBits(durTicks), 8)))
    val entry = el(Array(0xAE.toByte),
      el(Array(0xD7.toByte), be(1L, 1)) ++
        el(Array(0x83.toByte), be(1L, 1)) ++
        el(Array(0x86.toByte), codec.getBytes("US-ASCII")) ++
        el(Array(0xE0.toByte),
          el(Array(0xB0.toByte), be(w.toLong, 2)) ++
            el(Array(0xBA.toByte), be(h.toLong, 2))))
    val tracks = el(be(0x1654AE6BL, 4), entry)
    // SimpleBlock body: track VINT (0x81 = track 1), 2-byte relative
    // timestamp, flags (keyframe 0x80; Xiph lacing sets 0x02 + a
    // frames-1 count byte + lace sizes), then (here fake) frame bytes
    def simpleBlock(i: Int, laceExtra: Int): Array[Byte] =
      el(Array(0xA3.toByte),
        Array(0x81.toByte) ++ be(i.toLong, 2) ++
          (if (laceExtra > 0)
            Array(0x82.toByte, laceExtra.toByte) ++
              Array.fill(laceExtra)(1.toByte)
          else Array(0x80.toByte)) ++
          Array.fill(4)(0.toByte))
    val nC = math.max(1, clusters)
    val per = math.max(1, math.ceil(nFrames.toDouble / nC).toInt)
    val groups: Seq[Seq[Int]] = {
      val g = (0 until nFrames).grouped(per).toSeq
      if (g.isEmpty) Seq(Seq.empty) else g
    }
    val clusterBytes = groups.zipWithIndex.map { case (g, ci) =>
      val body = el(Array(0xE7.toByte), be(ci.toLong, 1)) ++
        g.toArray.flatMap { i =>
          simpleBlock(i, if (i == nFrames - 1) laceExtraInLast else 0)
        }
      // the streamed-mkv convention: an all-ones (unknown) size VINT;
      // later clusters then parse as this one's CHILDREN
      if (ci == 0 && unknownFirstClusterSize)
        be(0x1F43B366L, 4) ++ Array(0xff.toByte) ++ body
      else el(be(0x1F43B366L, 4), body)
    }
    val segment = el(be(0x18538067L, 4),
      info ++ tracks ++ clusterBytes.flatten.toArray)
    ebml ++ segment
  }

  /** Refresh video rows' metadata from the real container parse — AVI
    * via [[parseAvi]], mp4/mov via [[parseMp4]], mkv/webm via
    * [[parseMkv]] (geometry, duration and a codec-tagged mime). Rows
    * in none of the containers keep their declared meta.
    */
  def probeVideoMeta(media: Dataset[MediaRow]): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      if (r.kind != "video") r
      else parseAvi(r.payload) match {
        case Some(a) =>
          r.copy(meta = MediaMeta("video/x-msvideo", a.width, a.height, a.durationMs))
        case None => parseMp4(r.payload) match {
          case Some(m) =>
            r.copy(meta = MediaMeta(s"video/mp4;codec=${m.codec}", m.width, m.height, m.durationMs))
          case None => parseMkv(r.payload) match {
            case Some(k) =>
              r.copy(meta = MediaMeta(s"video/x-matroska;codec=${k.codec}",
                k.width, k.height, k.durationMs))
            case None => r
          }
        }
      }
    })
  }

  /** Refresh image rows' metadata from the real decoded dimensions
    * (rows whose payload doesn't decode keep their declared meta).
    */
  def probeImageMeta(media: Dataset[MediaRow]): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      if (r.kind != "image") r
      else decodeImage(r.payload) match {
        case Some((w, h, _)) => r.copy(meta = r.meta.copy(width = w, height = h))
        case None => r
      }
    })
  }

  /** Build a media table with binary payloads + typed metadata from any
    * (id, text) source — the fixture generator for specs/demos.
    */
  def mediaTable(df: DataFrame, idCol: String, textCol: String): Dataset[MediaRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(
        col(idCol).cast("long").as("mediaId"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col(idCol).cast("long"), lit(3)) + 1).cast("int")).as("kind"),
        encode(col(textCol), "UTF-8").as("payload"),
        struct(
          lit("application/octet-stream").as("mime"),
          (pmod(col(idCol).cast("long"), lit(64)) + 1).cast("int").as("width"),
          (pmod(col(idCol).cast("long"), lit(48)) + 1).cast("int").as("height"),
          (length(col(textCol)) * 10).cast("long").as("durationMs")).as("meta"))
      .as[MediaRow]
  }

  /** Feature extraction over binary payloads. mapPartitions (not map):
    * one decoder context per partition, batched iteration — the
    * Scala-side equivalent of a pandas-batched UDF, and the pattern
    * that amortizes codec setup at scale.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition decoder init would go here (amortized once)
      rows.grouped(decodeBatchSize).flatMap { batch =>
        batch.map { r =>
          // image (javax.imageio), WAV audio (javax.sound.sampled) and
          // AVI/MJPEG video (RIFF walk + per-frame JPEG) payloads
          // decode for real; undecodable bytes take the documented stub
          val feats = r.kind match {
            case "image" => decodeImage(r.payload).map(_._3)
              .getOrElse(stubDecode(r.payload))
            case "audio" => decodeAudio(r.payload).map(_._2)
              .getOrElse(stubDecode(r.payload))
            case "video" => decodeVideo(r.payload).map(_._4)
              .getOrElse(stubDecode(r.payload))
            case _ => stubDecode(r.payload)
          }
          MediaFeatures(r.mediaId, r.kind, feats)
        }
      }
    }
  }

  /** Resize: payload transform + metadata rewrite. The byte transform
    * is the stub (truncate-to-proportion); the metadata contract is the
    * real part.
    */
  def resize(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.map { r =>
      val scale = math.min(1.0,
        (w.toLong * h).toDouble / math.max(1.0, (r.meta.width.toLong * r.meta.height).toDouble))
      val n = math.max(1, (r.payload.length * scale).toInt)
      r.copy(payload = r.payload.take(n), meta = r.meta.copy(width = w, height = h))
    }
  }

  /** Frame sampling for video rows — one output row per sampled frame,
    * the explode-shaped schema a vision pipeline trains on. AVI
    * payloads emit REAL frames: up to `frames` evenly spaced `00dc`
    * chunks (standalone JPEG images under MJPEG). Non-AVI containers
    * fall back to evenly spaced byte slices so the schema contract
    * holds for payloads whose codec the JDK lacks.
    */
  def sampleFrames(media: Dataset[MediaRow], frames: Int): Dataset[MediaFrame] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { r =>
      parseAvi(r.payload) match {
        case Some(info) =>
          sampleIndices(info.nFrames, frames).zipWithIndex.map { case (fi, outIdx) =>
            val (off, len) = info.frameChunks(fi)
            MediaFrame(r.mediaId, outIdx,
              java.util.Arrays.copyOfRange(r.payload, off, off + len))
          }
        case None =>
          val n = math.max(1, r.payload.length / frames)
          (0 until frames).map { i =>
            MediaFrame(r.mediaId, i,
              r.payload.slice(i * n, math.min((i + 1) * n, r.payload.length)))
          }
      }
    }
  }

  /** 64-bit AVERAGE HASH (aHash) of an image payload — the classic
    * perceptual fingerprint: 8×8 luminance mean-pool, one bit per
    * cell set when the cell is at or above the grid's mean. Decode is
    * REAL for the JDK's codecs (PNG/BMP/GIF/JPEG); `None` for
    * undecodable bytes. Deterministic and resolution-invariant (the
    * pool normalizes geometry), so re-encodes and small edits land
    * within a few bits of hamming distance.
    */
  def aHash64(payload: Array[Byte]): Option[Long] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (img == null) None
      else {
        val means = lumaGrid(img, 8)
        val mean = means.sum / means.length
        var bits = 0L
        var i = 0
        while (i < means.length) {
          if (means(i) >= mean) bits |= (1L << i)
          i += 1
        }
        Some(bits)
      }
    } catch { case _: Exception => None }

  /** n×n mean-pooled luminance grid of an image (row-major). */
  private def lumaGrid(img: java.awt.image.BufferedImage,
                       grid: Int): Array[Double] = {
    val w = img.getWidth
    val h = img.getHeight
    val sums = new Array[Double](grid * grid)
    val counts = new Array[Long](grid * grid)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val lum = ((rgb >> 16) & 0xff) * 0.299 +
          ((rgb >> 8) & 0xff) * 0.587 + (rgb & 0xff) * 0.114
        val cell = math.min(grid - 1, y * grid / h) * grid +
          math.min(grid - 1, x * grid / w)
        sums(cell) += lum
        counts(cell) += 1
        x += 1
      }
      y += 1
    }
    Array.tabulate(grid * grid)(i =>
      if (counts(i) == 0) 0.0 else sums(i) / counts(i))
  }

  /** 64-bit DCT perceptual hash (pHash) — the frequency-domain
    * upgrade of [[aHash64]]: 32×32 mean-pooled luminance → 2-D DCT-II
    * → the low-frequency 8×8 corner, one bit per coefficient above
    * the median of the 63 AC coefficients. Because a UNIFORM
    * brightness shift moves only the DC coefficient, the 63 AC bits
    * are provably invariant to global exposure changes (spec-pinned
    * hamming ≤ 1 — the DC bit alone may flip), where aHash's
    * spatial-mean bits survive only because the mean shifts with the
    * pixels; pHash additionally shrugs off smooth gradients and gamma
    * nudges that tilt several aHash cells at once. Deterministic: the
    * DCT is a fixed-order double loop, no FFT reordering. Caveat for
    * SYNTHETIC imagery: a sparse spectrum (flat fills, exact
    * checkers) parks many coefficients exactly at the median, where
    * bit assignment rides 1e-14 cosine residue — natural images have
    * dense spectra and don't; prefer aHash for flat-color fixtures.
    */
  def pHash64(payload: Array[Byte]): Option[Long] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (img == null) None
      else {
        val n = 32
        val g = lumaGrid(img, n)
        // separable DCT-II restricted to the 8×8 output corner
        val cos = Array.tabulate(8, n)((u, x) =>
          math.cos((2 * x + 1) * u * math.Pi / (2.0 * n)))
        val a = (u: Int) =>
          if (u == 0) math.sqrt(1.0 / n) else math.sqrt(2.0 / n)
        // rows first: t(u, y) = a(u) Σx g(x, y) cos(u, x)
        val t = Array.ofDim[Double](8, n)
        var u = 0
        while (u < 8) {
          var y = 0
          while (y < n) {
            var s = 0.0
            var x = 0
            while (x < n) { s += g(y * n + x) * cos(u)(x); x += 1 }
            t(u)(y) = a(u) * s
            y += 1
          }
          u += 1
        }
        val coef = new Array[Double](64)
        var v = 0
        while (v < 8) {
          var uu = 0
          while (uu < 8) {
            var s = 0.0
            var y = 0
            while (y < n) { s += t(uu)(y) * cos(v)(y); y += 1 }
            coef(v * 8 + uu) = a(v) * s
            uu += 1
          }
          v += 1
        }
        val ac = coef.drop(1).sorted
        val med = ac(31) // true median of the 63 AC coefficients
        var bits = 0L
        var i = 0
        while (i < 64) {
          if (coef(i) > med) bits |= (1L << i)
          i += 1
        }
        Some(bits)
      }
    } catch { case _: Exception => None }

  /** (mediaId, ahash, decoded) perceptual fingerprints for a media
    * table; `method` ∈ ahash | phash (images) | audio (the
    * [[audioHash64]] energy envelope). Decodable payloads take the
    * real fingerprint; everything else hashes its raw bytes
    * (md5-derived 64 bits) — random-looking bits whose hamming
    * distance to anything is ~32, so the degraded semantics are
    * EXACT-duplicate-only for payloads without a codec, never false
    * near-dups. Same mapPartitions batching as [[extractFeatures]]
    * (one decoder context per partition).
    */
  def imageHashes(media: Dataset[MediaRow],
                  method: String = "ahash"): DataFrame = {
    import media.sparkSession.implicits._
    require(method == "ahash" || method == "phash" || method == "audio",
      s"unknown perceptual hash method '$method' (ahash|phash|audio)")
    val hashFn: Array[Byte] => Option[Long] = method match {
      case "phash" => pHash64
      case "audio" => audioHash64
      case _       => aHash64
    }
    media.mapPartitions { rows =>
      rows.grouped(decodeBatchSize).flatMap { batch =>
        batch.map { r =>
          hashFn(r.payload) match {
            case Some(h) => (r.mediaId, h, true)
            case None =>
              val d = java.security.MessageDigest.getInstance("MD5")
                .digest(r.payload)
              val h = (0 until 8).foldLeft(0L)((acc, i) =>
                (acc << 8) | (d(i) & 0xffL))
              (r.mediaId, h, false)
          }
        }
      }
    }.toDF("mediaId", "ahash", "decoded")
  }

  /** Perceptual near-duplicate media pairs: hamming(aHash) ≤
    * `maxHamming`. Candidates come from `bands` bit-bands of the hash
    * (pigeonhole: d-close hashes agree on ≥ 1 of d+1 bands — require
    * bands > maxHamming); band extraction uses UNSIGNED shifts so a
    * set bit 63 (a bright lower-right cell) cannot skew a div-based
    * band the way a signed divide would. The bucket self-join is
    * salted exactly like the SimHash/MinHash band joins (a corpus of
    * re-encoded copies piles thousands of hashes into one bucket;
    * 16-way salting splits the m²/2 emission across tasks, output
    * identical), and the verify is one codegen'd bit_count(xor).
    * Output: (id_a, id_b, hamming) — feed Dedup.connectedComponents
    * for the keep-one-per-cluster step, like every other dup-pair op.
    * `method` picks the fingerprint: `ahash`/`phash` (images) or
    * `audio` ([[audioHash64]]'s energy-envelope bits) — the band join
    * and verify are signature-agnostic 64-bit machinery either way.
    */
  def mediaDupPairs(media: Dataset[MediaRow], maxHamming: Int = 6,
                    bands: Int = 8, method: String = "ahash"): DataFrame = {
    require(bands > maxHamming,
      s"pigeonhole needs bands > maxHamming (got $bands bands, $maxHamming)")
    require(64 % bands == 0, s"bands must divide 64, got $bands")
    val width = 64 / bands
    val spark = media.sparkSession
    val fp = graft.util.Lineage.truncate(imageHashes(media, method))
    val banded = fp
      .crossJoin(spark.range(bands).toDF("band"))
      .select(col("mediaId").as("id"), col("ahash"), col("band"),
        expr(s"shiftrightunsigned(ahash, cast(band * $width as int)) " +
          s"& ${(1L << width) - 1}L").as("piece"))
    val SALTS = 16
    val a = banded.select(col("band"), col("piece"),
        col("id").as("id_a"), col("ahash").as("h_a"))
      .withColumn("salt", pmod(
        graft.util.Hashing.portableHash64(col("id_a").cast("string")),
        lit(SALTS.toLong)))
    val b = banded.select(col("band"), col("piece"),
        col("id").as("id_b"), col("ahash").as("h_b"))
      .crossJoin(spark.range(SALTS).toDF("salt"))
    a.join(b, Seq("band", "piece", "salt"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("h_a") bitwiseXOR col("h_b")).cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Partition sizing guard: repartition so each partition carries at
    * most `targetBytes` of payload (estimate via avg payload size) —
    * the knob that keeps codec batches inside executor memory.
    */
  def sizePartitions(media: Dataset[MediaRow], targetBytes: Long): Dataset[MediaRow] = {
    val stats = media.toDF().agg(
      count(lit(1)).as("n"), avg(length(col("payload"))).as("avg_bytes")).head()
    val n = stats.getLong(0)
    val avgB = Option(stats.get(1)).map(_.toString.toDouble).getOrElse(1.0)
    val parts = math.max(1, math.ceil(n * avgB / targetBytes).toInt)
    media.repartition(parts)
  }
}
