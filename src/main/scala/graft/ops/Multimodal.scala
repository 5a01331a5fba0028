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
  * - remaining kinds (video has no JDK codec) fall back to a
  *   deterministic byte-fold signature ([[byteFold]]) standing where
  *   an ffmpeg-style decoder would plug in.
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
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
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

  /** Byte-fold signature for kinds without a JDK codec (video):
    * a deterministic 8-dim fold of the payload, standing where an
    * external decoder (ffmpeg via JNI, or a Python worker) would plug
    * in. Pure function of the bytes.
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
    * fixed-width output schema. Kind-dispatched: images and audio
    * decode through their real codecs, everything else byte-folds.
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

  /** Resize stub: normalize every payload to exactly `size` bytes —
    * truncate long payloads, zero-pad short ones (a real
    * implementation rescales pixel grids; the Spark-side contract is
    * the same: variable-size binary in, fixed-size binary out, so
    * downstream batch kernels can assume uniform shape). Zero shuffle,
    * partition-local.
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

  /** Frame/sample decimation stub: keep every k-th byte (a real
    * implementation samples frames from video / windows from audio).
    * Stays a binary column; zero shuffle, partition-local.
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
