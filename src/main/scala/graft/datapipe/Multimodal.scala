package graft.datapipe

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video as opaque `binary` content plus
  * a typed metadata struct, with decode / feature-extract / resize /
  * frame-sample implemented as batch-shaped executor-side operators.
  *
  * The actual codec call is STUBBED (no image/audio libraries in this
  * container): `decodeFeatures` computes deterministic fake features
  * from the raw bytes, clearly marked below. Everything around it —
  * schema, partitioning, batch shape (process `batchSize` records per
  * iterator chunk, the mapInPandas/Arrow-batch shape), metadata algebra
  * — is real and tested.
  */
object Multimodal {

  val metaType: StructType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("fps", IntegerType),
    StructField("duration_s", IntegerType),
    StructField("format", StringType)))

  /** Wrap a text corpus as fake media rows: content = utf-8 bytes,
    * metadata derived deterministically from the doc columns.
    */
  def asMedia(docs: DataFrame, idCol: String, textCol: String, nCharsCol: String): DataFrame =
    docs.select(
      col(idCol).as("media_id"),
      col(textCol).cast("binary").as("content"),
      struct(
        (col(idCol) % 640 + 32).cast("int").as("width"),
        (col(idCol) % 480 + 32).cast("int").as("height"),
        lit(24).as("fps"),
        (col(nCharsCol) % 60 + 1).cast("int").as("duration_s"),
        lit("fake/raw").as("format")).as("meta"))

  /** Frame-sample indexes: one frame per second of video. Pure column
    * algebra — no decode needed to plan the sampling.
    */
  def frameSampleIndexes(meta: Column): Column =
    sequence(lit(0), (meta.getField("duration_s") - 1) * meta.getField("fps"), meta.getField("fps"))

  /** Resize metadata to fit `target` on the long side (integer math so
    * every engine agrees).
    */
  def resizeMeta(meta: Column, target: Int): Column = {
    val w = meta.getField("width").cast("long")
    val h = meta.getField("height").cast("long")
    val longSide = greatest(w, h)
    struct(
      ((w * target) / longSide).cast("int").as("width"),
      ((h * target) / longSide).cast("int").as("height"),
      meta.getField("fps").as("fps"),
      meta.getField("duration_s").as("duration_s"),
      meta.getField("format").as("format"))
  }

  /** Decode + feature-extract, batch-shaped. Appends
    * (n_bytes, mean_byte, byte_checksum).
    *
    * ===== STUB BOUNDARY =====
    * A real implementation hands each batch of byte arrays to a codec /
    * vision encoder (the mapInPandas shape: iterator of batches in,
    * iterator of batches out). Here the "decode" is a deterministic
    * fake over the raw bytes so the plumbing is testable offline.
    */
  def decodeFeatures(media: DataFrame, batchSize: Int = 32): DataFrame = {
    val outSchema = StructType(media.schema.fields ++ Seq(
      StructField("n_bytes", LongType),
      StructField("mean_byte", DoubleType),
      StructField("byte_checksum", LongType)))
    val enc = Encoders.row(outSchema)
    val contentIdx = media.schema.fieldIndex("content")
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // One "codec call" per batch — the real version would ship
        // batch.map(content) to the decoder in one go.
        batch.map { r =>
          val bytes = r.getAs[Array[Byte]](contentIdx)
          val n = if (bytes == null) 0L else bytes.length.toLong
          val sum = if (bytes == null) 0L else bytes.foldLeft(0L)((a, b) => a + (b & 0xFF))
          val mean = if (n == 0) 0.0 else sum.toDouble / n.toDouble
          // Seq[Any] — a bare Seq(n, mean, …) would weakly unify Long
          // and Double into Seq[Double] and corrupt the BIGINT fields.
          Row.fromSeq(r.toSeq ++ Seq[Any](n, mean, sum % 997L))
        }
      }
    }(enc)
  }
}
