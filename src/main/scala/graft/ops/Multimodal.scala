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
  * - other kinds (audio/video have no JDK codec) fall back to a
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

  /** Byte-fold signature for kinds without a JDK codec (audio/video):
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

  /** Batched decode + featurize over partitions (the `mapInPandas`
    * shape, JVM-side): one iterator pass per partition, no shuffle,
    * fixed-width output schema. Kind-dispatched: images decode through
    * the real codec, everything else byte-folds.
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
