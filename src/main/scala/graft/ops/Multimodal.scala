package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` payloads with
  * typed metadata, decoded/featurized in batched partition passes.
  *
  * The decode tier is kind-dispatched:
  * - `kind = "image"` runs a REAL codec — `javax.imageio` (PNG/JPEG/
  *   BMP readers ship in the JDK, no external deps): bytes →
  *   `BufferedImage` → per-channel pixel statistics. Exercised
  *   end-to-end by q52 against an oracle that recomputes the pixel
  *   stats from the (deterministic) source imagery — i.e. the
  *   encode→decode roundtrip itself is hash-verified.
  * - `kind = "audio"` also runs a REAL codec — `javax.sound.sampled`
  *   (WAV/AIFF/AU readers ship in the JDK): bytes → PCM frames →
  *   integer amplitude statistics, header-negotiated format included.
  *   Exercised end-to-end by q86 the same way q52 checks images: the
  *   oracle recomputes the stats from the deterministic source tone.
  * - `kind = "video"` runs a REAL container parse — RIFF/AVI chunk
  *   walking (pure JVM, the same RIFF family as WAV) with `MPNG`
  *   (PNG-compressed) frames, each frame decoded through the SAME
  *   `javax.imageio` path as images. PNG frames are lossless, so
  *   per-frame pixel statistics are exact and the q109 oracle
  *   recomputes them from the planted frame formula; fps / dims /
  *   frame count come from the real `avih` header. (MJPG-fourcc AVIs
  *   parse through the identical path — ImageIO reads JPEG frames —
  *   but JPEG's lossy DCT makes planted-formula oracles impossible,
  *   so the fixture codec is MPNG.)
  * - kinds with no decoder at all fall back to a deterministic
  *   byte-fold signature ([[byteFold]]) standing where an external
  *   (ffmpeg-style) decoder would plug in.
  *
  * At scale the shape is what matters: binary columns ride parquet
  * as-is (no row-group bloat beyond payload bytes), decode runs
  * embarrassingly parallel per partition with zero shuffle (plan-
  * asserted by PlanSpec q39), and feature extraction emits fixed-width
  * vectors that downstream ANN (graft.ops.Similarity) consumes.
  */
object Multimodal {

  final case class MediaMeta(kind: String, format: String, n_bytes: Long)

  final case class MediaRow(id: Long, content: Array[Byte], kind: String,
      format: String)

  final case class MediaFeatures(id: Long, n_bytes: Long, head: Int,
      checksum: Long, features: Array[Float])

  final case class ImageStats(id: Long, width: Int, height: Int,
      sum_r: Long, sum_g: Long, sum_b: Long)

  /** Wrap a text corpus as binary media rows (stand-in for reading
    * image/audio bytes): content = utf-8 payload + typed metadata.
    */
  def asMedia(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).as("id"),
      encode(col(textCol), "UTF-8").as("content"),
      struct(
        lit("text").as("kind"),
        lit("utf-8").as("format"),
        octet_length(col(textCol)).cast("long").as("n_bytes")).as("meta"))

  /** Per-channel linear-congruential coefficients (idC, xC, yC, off)
    * of the deterministic RGB test card: channel value at (x, y) of
    * image `id` = (idC·id + xC·x + yC·y + off) mod 256. THE single
    * definition of the fixture imagery — the PNG encoder
    * ([[testCardPng]]) and the q52 oracle generator both read it, so
    * the oracle recomputes exactly the pixels the codec must recover.
    */
  val channelCoefs: Seq[(Int, Int, Int, Int)] =
    Seq((31, 7, 13, 0), (17, 11, 5, 64), (23, 3, 29, 128))

  private def channelValue(c: (Int, Int, Int, Int), id: Long, x: Int,
      y: Int): Int =
    ((c._1 * id + c._2 * x + c._3 * y + c._4) % 256).toInt

  /** Deterministic `w`×`h` RGB test-card PNG for image `id` — a real
    * PNG byte stream produced by the JDK encoder (lossless, so the
    * decode recovers the exact channel values).
    */
  def testCardPng(id: Long, w: Int, h: Int): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(testCardImage(id, w, h), "png", bos)
    bos.toByteArray
  }

  /** The raw [[channelCoefs]] test card as a `BufferedImage` — the
    * pixel source behind [[testCardPng]], public so fixtures can
    * re-encode the SAME planted imagery through other codecs (the
    * MJPG tolerance oracle encodes it as JPEG).
    */
  def testCardImage(id: Long, w: Int,
      h: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = channelValue(channelCoefs(0), id, x, y)
        val g = channelValue(channelCoefs(1), id, x, y)
        val b = channelValue(channelCoefs(2), id, x, y)
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    img
  }

  /** One media row per input id: deterministic PNG payload + typed
    * metadata (`kind = "image"`). Partition-local encode, zero
    * shuffle — the fixture generator for the real-codec path (stand-in
    * for reading image files off storage).
    */
  def syntheticImages(df: DataFrame, idCol: String, w: Int,
      h: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .mapPartitions { ids =>
        javax.imageio.ImageIO.setUseCache(false) // no temp-file churn
        ids.map { id =>
          val png = testCardPng(id, w, h)
          (id, png, "image", "png", png.length.toLong)
        }
      }
      .toDF("id", "content", "kind", "format", "n_bytes")
      .select(col("id"), col("content"),
        struct(col("kind"), col("format"), col("n_bytes")).as("meta"))
  }

  /** Decode an image payload with `javax.imageio` and return exact
    * integer per-channel sums (+ dims). Integer-exact stats make the
    * decode oracle-checkable without float discipline; means/vars are
    * one division away. `None` when the payload is null or no
    * installed reader recognizes it.
    */
  def decodeImageStats(id: Long, bytes: Array[Byte]): Option[ImageStats] = {
    if (bytes == null) return None
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    if (img == null) return None
    val w = img.getWidth
    val h = img.getHeight
    val px = img.getRGB(0, 0, w, h, null, 0, w) // packed ARGB, any raster
    var (sr, sg, sb) = (0L, 0L, 0L)
    var i = 0
    while (i < px.length) {
      sr += (px(i) >> 16) & 0xff
      sg += (px(i) >> 8) & 0xff
      sb += px(i) & 0xff
      i += 1
    }
    Some(ImageStats(id, w, h, sr, sg, sb))
  }

  /** Real-codec decode over a media frame: one `ImageIO.read` per row,
    * partition-local (zero shuffle), undecodable payloads dropped.
    */
  def imageStats(media: DataFrame): Dataset[ImageStats] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("id").cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.flatMap { case (id, bytes) => decodeImageStats(id, bytes) }
      }
  }

  final case class AudioStats(id: Long, n_samples: Int,
      sample_rate: Int, sum_amp: Long, sum_abs: Long)

  /** LCG coefficients (a, b, c) of the deterministic 16-bit test
    * tone: sample `t` of clip `id` = ((a·id + b·t + c) mod 65536) −
    * 32768. THE single definition of the fixture audio — the WAV
    * encoder ([[testToneWav]]) and the q86 oracle generator both
    * read it, so the oracle recomputes exactly the samples the codec
    * must recover.
    */
  val toneCoefs: (Int, Int, Int) = (37, 101, 4096)

  val toneSampleRate: Int = 8000

  def toneSample(id: Long, t: Int): Int =
    ((toneCoefs._1 * id + toneCoefs._2 * t + toneCoefs._3) % 65536
      - 32768).toInt

  /** Deterministic `n`-sample mono 16-bit PCM WAV for clip `id` — a
    * real RIFF/WAVE byte stream produced by the JDK encoder
    * (lossless PCM, so the decode recovers the exact samples).
    */
  def testToneWav(id: Long, n: Int): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(
      toneSampleRate.toFloat, 16, 1, true, false) // signed 16-bit LE
    val pcm = new Array[Byte](n * 2)
    var t = 0
    while (t < n) {
      val s = toneSample(id, t)
      pcm(2 * t) = (s & 0xff).toByte
      pcm(2 * t + 1) = ((s >> 8) & 0xff).toByte
      t += 1
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** One media row per input id: deterministic WAV payload + typed
    * metadata (`kind = "audio"`). Partition-local encode, zero
    * shuffle — the audio twin of [[syntheticImages]].
    */
  def syntheticAudio(df: DataFrame, idCol: String, n: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .mapPartitions(_.map { id =>
        val wav = testToneWav(id, n)
        (id, wav, "audio", "wav", wav.length.toLong)
      })
      .toDF("id", "content", "kind", "format", "n_bytes")
      .select(col("id"), col("content"),
        struct(col("kind"), col("format"), col("n_bytes")).as("meta"))
  }

  /** Decode an audio payload with `javax.sound.sampled` and return
    * exact integer amplitude sums (+ header-negotiated sample count
    * and rate). Integer-exact stats make the decode oracle-checkable
    * without float discipline. `None` when the payload is null, no
    * installed reader recognizes it, or the format isn't 16-bit PCM.
    */
  def decodeAudioStats(id: Long, bytes: Array[Byte]): Option[AudioStats] = {
    if (bytes == null) return None
    val ais =
      try javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      catch { case _: Exception => return None }
    val fmt = ais.getFormat
    if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1 ||
      fmt.getEncoding !=
        javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED)
      return None
    val data = ais.readAllBytes()
    val n = data.length / 2
    var (sum, sabs) = (0L, 0L)
    var t = 0
    while (t < n) {
      val (lo, hi) =
        if (fmt.isBigEndian) (data(2 * t + 1), data(2 * t))
        else (data(2 * t), data(2 * t + 1))
      val s = ((hi << 8) | (lo & 0xff)).toShort.toInt
      sum += s
      sabs += math.abs(s)
      t += 1
    }
    Some(AudioStats(id, n, fmt.getSampleRate.toInt, sum, sabs))
  }

  /** Real-codec decode over a media frame: one WAV parse per row,
    * partition-local (zero shuffle), undecodable payloads dropped —
    * the audio twin of [[imageStats]].
    */
  def audioStats(media: DataFrame): Dataset[AudioStats] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("id").cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        decodeAudioStats(id, bytes) })
  }

  // ──────────────────────── video tier ────────────────────────

  final case class VideoFrameStats(id: Long, frame: Int, width: Int,
      height: Int, sum_r: Long, sum_g: Long, sum_b: Long)

  /** Parsed AVI: header metadata + raw per-frame payloads (still
    * encoded — decode is the caller's move, so metadata-only readers
    * never pay for pixel decode).
    */
  final case class AviVideo(nFrames: Int, fps: Int, width: Int,
      height: Int, frames: Seq[Array[Byte]])

  /** Frame `f` of video `id` carries the test-card image with
    * image-id `id · frameStride + f` — THE single definition of the
    * fixture footage; [[testCardAvi]] and the q109 oracle generator
    * both read it (the [[channelCoefs]] discipline, one level up).
    */
  val frameStride: Long = 100L

  def frameImageId(id: Long, f: Int): Long = id * frameStride + f

  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)

  private def fcc(s: String): Array[Byte] = s.getBytes("US-ASCII")

  /** RIFF chunk: fourcc + LE32 size + payload, padded to even size
    * (the RIFF alignment rule — readers that skip the pad byte and
    * writers that emit it must agree, and both live here).
    */
  private def riffChunk(id: String, payload: Array[Byte]): Array[Byte] = {
    val pad = if ((payload.length & 1) == 1) Array(0.toByte)
              else Array.empty[Byte]
    fcc(id) ++ le32(payload.length) ++ payload ++ pad
  }

  private def riffList(kind: String, body: Array[Byte]): Array[Byte] =
    riffChunk("LIST", fcc(kind) ++ body)

  /** Deterministic `frames`-frame `w`×`h` AVI for video `id` — a REAL
    * RIFF/AVI byte stream (`avih` + `strl(strh,strf)` headers, `movi`
    * frame list, `idx1` index) whose video stream is `MPNG`: each
    * `00dc` chunk is a whole PNG ([[testCardPng]] of
    * [[frameImageId]]), so frame decode is lossless and the planted
    * formula is recoverable exactly. `fps` must divide 1,000,000 (the
    * `avih` rate field is µs/frame — an exact integer keeps writer
    * and parser bit-identical on the round trip).
    */
  def testCardAvi(id: Long, frames: Int, w: Int, h: Int,
      fps: Int): Array[Byte] = {
    require(frames >= 1, "frames >= 1")
    buildAvi((0 until frames).map(f =>
      testCardPng(frameImageId(id, f), w, h)), w, h, fps)
  }

  /** Assemble encoded frame payloads into an AVI byte stream — the
    * writer half of [[parseAvi]] (shared by the fixture generator and
    * [[sampleFrames]]'s re-emit).
    */
  def buildAvi(pngs: Seq[Array[Byte]], w: Int, h: Int,
      fps: Int, fourcc: String = "MPNG"): Array[Byte] = {
    require(pngs.nonEmpty && fps >= 1 && 1000000 % fps == 0,
      "fps must divide 1e6; at least one frame")
    require(fourcc.length == 4, "stream fourcc is 4 ASCII chars")
    val frames = pngs.length
    val maxLen = pngs.map(_.length).max
    val avih = Array(
      1000000 / fps, // dwMicroSecPerFrame
      0, 0,          // dwMaxBytesPerSec, dwPaddingGranularity
      0x10,          // dwFlags: AVIF_HASINDEX
      frames, 0, 1,  // dwTotalFrames, dwInitialFrames, dwStreams
      maxLen, w, h,  // dwSuggestedBufferSize, dwWidth, dwHeight
      0, 0, 0, 0     // dwReserved[4]
    ).flatMap(le32)
    val strh = fcc("vids") ++ fcc(fourcc) ++ Array(
      0, 0, 0,       // dwFlags, wPriority+wLanguage, dwInitialFrames
      1, fps,        // dwScale, dwRate (fps = rate / scale)
      0, frames,     // dwStart, dwLength (in frames)
      maxLen, -1, 0  // dwSuggestedBufferSize, dwQuality, dwSampleSize
    ).flatMap(le32) ++
      le16(0) ++ le16(0) ++ le16(w) ++ le16(h) // rcFrame
    val strf = Array(
      40, w, h       // biSize, biWidth, biHeight
    ).flatMap(le32) ++ le16(1) ++ le16(24) ++ // biPlanes, biBitCount
      fcc(fourcc) ++ Array(
      w * h * 3,     // biSizeImage
      0, 0, 0, 0     // biXPels, biYPels, biClrUsed, biClrImportant
    ).flatMap(le32)
    val hdrl = riffList("hdrl", riffChunk("avih", avih) ++
      riffList("strl", riffChunk("strh", strh) ++ riffChunk("strf", strf)))
    val moviChunks = pngs.map(p => riffChunk("00dc", p))
    val movi = riffList("movi", moviChunks.toArray.flatten)
    // idx1 entries point at each chunk's fourcc, relative to the
    // 'movi' list-type fourcc (the convention most writers use)
    val offsets = moviChunks.scanLeft(4)(_ + _.length).init
    val idx1 = riffChunk("idx1",
      pngs.indices.flatMap(i => fcc("00dc") ++ le32(0x10) ++
        le32(offsets(i)) ++ le32(pngs(i).length)).toArray)
    val body = fcc("AVI ") ++ hdrl ++ movi ++ idx1
    fcc("RIFF") ++ le32(body.length) ++ body
  }

  private def readLe32(b: Array[Byte], p: Int): Int =
    (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8) |
      ((b(p + 2) & 0xff) << 16) | ((b(p + 3) & 0xff) << 24)

  private def fccAt(b: Array[Byte], p: Int): String =
    new String(b, p, 4, "US-ASCII")

  /** Parse an AVI byte stream: walk the RIFF chunk tree, read fps /
    * dims / frame count from the `avih` header, collect the encoded
    * payload of every `##db`/`##dc` frame chunk in the `movi` list.
    * `None` when the bytes aren't a RIFF/AVI stream or the header is
    * missing — the undecodable-payload convention of the image/audio
    * tiers. Pure chunk walking (no pixel decode): safe on payloads of
    * any codec, including ones ImageIO can't read.
    */
  def parseAvi(bytes: Array[Byte]): Option[AviVideo] = {
    if (bytes == null || bytes.length < 12) return None
    if (fccAt(bytes, 0) != "RIFF" || fccAt(bytes, 8) != "AVI ") return None
    val end = math.min(bytes.length.toLong, 8L + readLe32(bytes, 4))
    var header: Option[(Int, Int, Int, Int)] = None
    val frames = Seq.newBuilder[Array[Byte]]
    def walk(from: Long, to: Long): Unit = {
      var p = from
      while (p + 8 <= to) {
        val id = fccAt(bytes, p.toInt)
        val size = readLe32(bytes, p.toInt + 4).toLong & 0xffffffffL
        val data = p + 8
        if (data + size > to) return // truncated chunk: stop cleanly
        if (id == "LIST" && size >= 4) {
          val kind = fccAt(bytes, data.toInt)
          if (kind == "hdrl" || kind == "movi" || kind == "strl")
            walk(data + 4, data + size)
        } else if (id == "avih" && size >= 40) {
          val usPerFrame = readLe32(bytes, data.toInt)
          val fps = if (usPerFrame > 0) 1000000 / usPerFrame else 0
          header = Some((readLe32(bytes, data.toInt + 16), fps,
            readLe32(bytes, data.toInt + 32), readLe32(bytes, data.toInt + 36)))
        } else if (id.length == 4 && id(0).isDigit && id(1).isDigit &&
            (id.substring(2) == "db" || id.substring(2) == "dc")) {
          frames += java.util.Arrays.copyOfRange(
            bytes, data.toInt, (data + size).toInt)
        }
        p = data + size + (size & 1) // even alignment
      }
    }
    walk(12L, end)
    header.map { case (n, fps, w, h) =>
      AviVideo(n, fps, w, h, frames.result())
    }
  }

  /** One media row per input id: deterministic AVI payload + typed
    * metadata (`kind = "video"`). Partition-local encode, zero
    * shuffle — the video member of the [[syntheticImages]] family.
    */
  def syntheticVideos(df: DataFrame, idCol: String, frames: Int, w: Int,
      h: Int, fps: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .mapPartitions { ids =>
        javax.imageio.ImageIO.setUseCache(false)
        ids.map { id =>
          val avi = testCardAvi(id, frames, w, h, fps)
          (id, avi, "video", "avi", avi.length.toLong)
        }
      }
      .toDF("id", "content", "kind", "format", "n_bytes")
      .select(col("id"), col("content"),
        struct(col("kind"), col("format"), col("n_bytes")).as("meta"))
  }

  /** Decode a video payload: RIFF walk ([[parseAvi]]) then the SAME
    * per-frame ImageIO path as [[decodeImageStats]] — one row of
    * exact per-channel pixel sums per decodable frame, frame index
    * preserved. Frames no installed reader recognizes are dropped
    * (their index gap is the signal).
    */
  def decodeVideoFrameStats(id: Long,
      bytes: Array[Byte]): Seq[VideoFrameStats] =
    parseAvi(bytes).toSeq.flatMap { v =>
      v.frames.zipWithIndex.flatMap { case (payload, f) =>
        decodeImageStats(id, payload).map(s =>
          VideoFrameStats(id, f, s.width, s.height,
            s.sum_r, s.sum_g, s.sum_b))
      }
    }

  /** Real-codec decode over a video media frame: container walk +
    * per-frame ImageIO, partition-local (zero shuffle), one output
    * row per frame — the video twin of [[imageStats]]/[[audioStats]].
    */
  def videoFrameStats(media: DataFrame): Dataset[VideoFrameStats] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("id").cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.flatMap { case (id, bytes) => decodeVideoFrameStats(id, bytes) }
      }
  }

  /** Video feature vector from a real parse: [n_frames, fps, w, h,
    * mean r/g/b over all decoded frames] — 7 dims. Falls back to
    * [[byteFold]] when the bytes aren't an AVI or no frame decodes.
    */
  def videoFeatures(id: Long, bytes: Array[Byte]): Array[Float] = {
    val stats = decodeVideoFrameStats(id, bytes)
    if (stats.isEmpty) return byteFold(bytes)
    val px = stats.map(s => s.width.toLong * s.height).sum.toDouble
    val meta = parseAvi(bytes).get
    Array(stats.length.toFloat, meta.fps.toFloat,
      meta.width.toFloat, meta.height.toFloat,
      (stats.map(_.sum_r).sum / px).toFloat,
      (stats.map(_.sum_g).sum / px).toFloat,
      (stats.map(_.sum_b).sum / px).toFloat)
  }

  /** Byte-fold signature for kinds with no decoder at all — the
    * documented FALLBACK tier (image/audio/video all decode for
    * real above): a deterministic 8-dim fold of the payload,
    * standing where an external decoder (ffmpeg via JNI, or a
    * Python worker) would plug in. Pure function of the bytes.
    */
  def byteFold(bytes: Array[Byte]): Array[Float] = {
    val acc = new Array[Long](8)
    var i = 0
    while (i < bytes.length) {
      acc(i % 8) += (bytes(i) & 0xff)
      i += 1
    }
    acc.map(v => (v % 1000).toFloat / 1000f)
  }

  /** Image feature vector from a real decode: [w, h, mean/var per
    * channel] — 8 dims, the fixed-width shape downstream ANN consumes.
    * Falls back to [[byteFold]] when no reader recognizes the bytes.
    */
  def imageFeatures(bytes: Array[Byte]): Array[Float] = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    if (img == null) return byteFold(bytes)
    val w = img.getWidth
    val h = img.getHeight
    val px = img.getRGB(0, 0, w, h, null, 0, w)
    val n = px.length.toDouble
    val sum = new Array[Long](3)
    val sq = new Array[Long](3)
    var i = 0
    while (i < px.length) {
      var c = 0
      while (c < 3) {
        val v = (px(i) >> (16 - 8 * c)) & 0xff
        sum(c) += v
        sq(c) += v.toLong * v
        c += 1
      }
      i += 1
    }
    val mv = (0 until 3).flatMap { c =>
      val mean = sum(c) / n
      Seq(mean, sq(c) / n - mean * mean)
    }
    (Seq(w.toDouble, h.toDouble) ++ mv).map(_.toFloat).toArray
  }

  /** Audio feature vector from a real decode: [n_samples, rate, mean
    * amplitude, mean |amplitude|] — the fixed-width shape downstream
    * ANN consumes. Falls back to [[byteFold]] when no reader
    * recognizes the bytes.
    */
  def audioFeatures(id: Long, bytes: Array[Byte]): Array[Float] =
    decodeAudioStats(id, bytes) match {
      case Some(a) if a.n_samples > 0 => Array(a.n_samples.toFloat,
        a.sample_rate.toFloat, (a.sum_amp.toDouble / a.n_samples).toFloat,
        (a.sum_abs.toDouble / a.n_samples).toFloat)
      case _ => byteFold(bytes)
    }

  /** Batched decode + featurize over partitions (the `mapInPandas`
    * shape, JVM-side): one iterator pass per partition, no shuffle,
    * fixed-width output schema. Kind-dispatched: images, audio and
    * video decode through their real codecs, everything else
    * byte-folds.
    */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("id"), col("content"), col("meta.kind"),
        col("meta.format")).as[MediaRow]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { r =>
          val f =
            if (r.kind == "image") imageFeatures(r.content)
            else if (r.kind == "audio") audioFeatures(r.id, r.content)
            else if (r.kind == "video") videoFeatures(r.id, r.content)
            else byteFold(r.content)
          MediaFeatures(
            id = r.id,
            n_bytes = r.content.length.toLong,
            head = if (r.content.nonEmpty) r.content(0) & 0xff else -1,
            checksum = r.content.foldLeft(0L)((a, b) => a * 31 + (b & 0xff)),
            features = f)
        }
      }
  }

  /** REAL image resize: decode (ImageIO), nearest-neighbor resample
    * onto a `dw`×`dh` grid — dst (x, y) reads src (⌊x·sw/dw⌋,
    * ⌊y·sh/dh⌋), the integer-exact resampling mode — and re-encode
    * as PNG. A full decode → transform → encode roundtrip through
    * real codecs, so q112 can oracle the RESIZED pixel sums from the
    * planted formula evaluated at the source coordinates. Non-image
    * payloads pass through untouched (the kind-dispatch convention).
    * Zero shuffle, partition-local.
    */
  def resizeImages(media: DataFrame, dw: Int, dh: Int): DataFrame = {
    require(dw >= 1 && dh >= 1, "target dims >= 1")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("id"), col("content")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { case (id, bytes) =>
          val src = if (bytes == null) null
            else javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(bytes))
          val out = if (src == null) bytes else {
            val dst = new java.awt.image.BufferedImage(
              dw, dh, java.awt.image.BufferedImage.TYPE_INT_RGB)
            val (sw, sh) = (src.getWidth, src.getHeight)
            var y = 0
            while (y < dh) {
              var x = 0
              while (x < dw) {
                dst.setRGB(x, y,
                  src.getRGB(x * sw / dw, y * sh / dh))
                x += 1
              }
              y += 1
            }
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(dst, "png", bos)
            bos.toByteArray
          }
          (id, out)
        }
      }
      .toDF("id", "content")
  }

  /** Byte-normalization stub: pad/truncate every payload to exactly
    * `size` bytes — the fixed-width contract downstream batch kernels
    * assume; [[resizeImages]] is the real pixel-grid resize. Zero
    * shuffle, partition-local.
    */
  def resizeBytes(media: DataFrame, size: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("id"), col("content")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        // null payload → zero-filled frame (the null-handling
        // convention of the other partition-local kernels)
        (id, if (bytes == null) new Array[Byte](size)
             else java.util.Arrays.copyOf(bytes, size))
      })
      .toDF("id", "content")
  }

  /** REAL frame decimation over video payloads: parse the AVI, keep
    * every `k`-th frame, re-emit a valid AVI (same dims, fps scaled
    * down by `k` when it stays integral, else kept) — variable-size
    * binary in, binary out, zero shuffle, partition-local. Non-AVI
    * payloads pass through untouched (the kind-dispatch convention).
    */
  def sampleFrames(media: DataFrame, k: Int): DataFrame = {
    require(k >= 1, "k >= 1")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("id"), col("content")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val out = parseAvi(bytes) match {
          case Some(v) if v.frames.nonEmpty =>
            val kept = v.frames.grouped(k).map(_.head).toSeq
            val fps = if (v.fps % k == 0 && v.fps / k >= 1 &&
              1000000 % (v.fps / k) == 0) v.fps / k else v.fps
            buildAvi(kept, v.width, v.height, fps)
          case _ => bytes
        }
        (id, out)
      })
      .toDF("id", "content")
  }

  /** Frame/sample decimation stub: keep every k-th byte (a real
    * implementation samples frames from video / windows from audio —
    * see [[sampleFrames]] for the real video path). Stays a binary
    * column; zero shuffle, partition-local.
    */
  def sampleBytes(media: DataFrame, k: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("id"), col("content")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        (id, bytes.grouped(k).map(_.head).toArray)
      })
      .toDF("id", "content")
  }
}
