package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns for training-data pipelines: media as opaque `binary`
  * columns plus a typed metadata struct, with decode / feature-extract /
  * resize / frame-sample as batched `mapPartitions` stages.
  *
  * The decode step itself is a deterministic STUB (no image/audio codecs in
  * this environment) — everything around it is real: the schema contract,
  * the batch shape (vectorized batches of `batchSize`, same shape a Pandas
  * UDF over mapInPandas sees), partition sizing, and null/corrupt handling.
  * Swap [[MediaDecoder.decode]] for a codec-backed impl and nothing else
  * changes.
  */
object Multimodal {

  /** Typed metadata carried next to every media blob. */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("mediaType", StringType),   // image | audio | video
    StructField("format", StringType),      // png, wav, mp4, ...
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("durationMs", LongType),
    StructField("sizeBytes", LongType)
  ))

  /** The decode contract: bytes → fixed-length feature vector.
    * STUB: deterministic bytes-derived features (content hash spread across
    * dims + aggregate byte statistics) standing in for a real
    * decoder+extractor. Deterministic ⇒ testable end-to-end.
    */
  object MediaDecoder extends Serializable {
    def decode(bytes: Array[Byte], dims: Int): Array[Float] = {
      if (bytes == null || bytes.isEmpty) return Array.fill(dims)(0f)
      val md = java.security.MessageDigest.getInstance("SHA-256")
      val d = md.digest(bytes)
      val out = new Array[Float](dims)
      var i = 0
      while (i < dims) {
        out(i) = ((d(i % d.length) & 0xff) - 128) / 128.0f
        i += 1
      }
      out
    }

    /** "Resize": deterministic downsample of the feature vector. */
    def resize(features: Array[Float], newDims: Int): Array[Float] = {
      val out = new Array[Float](newDims)
      var i = 0
      while (i < newDims) {
        out(i) = features((i.toLong * features.length / newDims).toInt)
        i += 1
      }
      out
    }

    /** "Frame-sample": pick every `stride`-th byte window as a frame blob. */
    def sampleFrames(bytes: Array[Byte], frameSize: Int, stride: Int): Seq[Array[Byte]] =
      if (bytes == null || bytes.length < frameSize) Seq.empty
      else (0 to (bytes.length - frameSize) by (frameSize * stride))
        .map(off => bytes.slice(off, off + frameSize))
  }

  /** Batched feature extraction: mapPartitions with `grouped(batchSize)` —
    * the JVM analogue of a vectorized (mapInPandas-style) UDF. Corrupt/null
    * blobs yield a null feature column rather than failing the task.
    */
  def extractFeatures(
      df: DataFrame,
      blobCol: String,
      dims: Int = 64,
      batchSize: Int = 128
  ): DataFrame = {
    val outSchema = df.schema.add("features", ArrayType(FloatType))
    val enc = RowEncoder.encoderFor(outSchema)
    val idx = df.schema.fieldIndex(blobCol)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { row =>
          val blob = if (row.isNullAt(idx)) null else row.getAs[Array[Byte]](idx)
          val feats: Seq[Float] =
            try MediaDecoder.decode(blob, dims).toSeq
            catch { case _: Exception => null }
          Row.fromSeq(row.toSeq :+ feats)
        }
      }
    }(enc)
  }

  /** Attach a typed metadata struct derived from the blob (sizeBytes real;
    * codec-derived fields stubbed deterministic).
    */
  def withMediaMeta(df: DataFrame, blobCol: String, mediaType: String, format: String): DataFrame =
    df.withColumn(
      "media_meta",
      struct(
        lit(mediaType).as("mediaType"),
        lit(format).as("format"),
        (pmod(crc32(col(blobCol)), lit(1280)) + 64).cast("int").as("width"),
        (pmod(crc32(col(blobCol)), lit(720)) + 64).cast("int").as("height"),
        (length(col(blobCol)).cast("long") * 10L).as("durationMs"),
        length(col(blobCol)).cast("long").as("sizeBytes")
      )
    )
}
