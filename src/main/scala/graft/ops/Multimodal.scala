package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` payloads with
  * typed metadata, decoded/featurized in batched partition passes.
  *
  * The Spark-side structure is real — schema, partition-level batch
  * iteration, feature schema — while the codec call itself is a
  * deterministic STUB (`decodeStub`): this container has no image or
  * audio libraries, so the stub stands where an actual decoder
  * (libjpeg/ffmpeg via JNI, or a Python worker) would plug in. At
  * scale the shape is what matters: binary columns ride parquet as-is
  * (no row-group bloat beyond payload bytes), decode runs
  * embarrassingly parallel per partition with zero shuffle, and
  * feature extraction emits fixed-width vectors that downstream ANN
  * (graft.ops.Similarity) consumes.
  */
object Multimodal {

  final case class MediaMeta(kind: String, format: String, n_bytes: Long)

  final case class MediaRow(id: Long, content: Array[Byte], kind: String,
      format: String)

  final case class MediaFeatures(id: Long, n_bytes: Long, head: Int,
      checksum: Long, features: Array[Float])

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

  /** The decoder stub: a real implementation would hand `bytes` to a
    * codec and return pixels/samples; this returns a deterministic
    * 8-dim signature derived from the payload so the full pipeline is
    * testable end-to-end. Pure function of the bytes.
    */
  def decodeStub(bytes: Array[Byte]): Array[Float] = {
    val acc = new Array[Long](8)
    var i = 0
    while (i < bytes.length) {
      acc(i % 8) += (bytes(i) & 0xff)
      i += 1
    }
    acc.map(v => (v % 1000).toFloat / 1000f)
  }

  /** Batched decode + featurize over partitions (the `mapInPandas`
    * shape, JVM-side): one iterator pass per partition, no shuffle,
    * fixed-width output schema.
    */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("id"), col("content"), col("meta.kind"),
        col("meta.format")).as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          val f = decodeStub(r.content)
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
