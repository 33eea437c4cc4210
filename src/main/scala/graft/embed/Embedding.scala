package graft.embed

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** E1: the batch-embedding operator (reference `embedding_service.py:31-83`,
  * provider `infrastructure/openai_embedding_provider.py:24-42`).
  *
  * `mapPartitions` with internal `grouped(batchSize)` batching — each
  * partition issues provider calls for 100 texts at a time and zips results
  * back strictly (the reference raises on length mismatch; we do too).
  * Partition sizing is the rate-limit lever at scale: the network boundary
  * lives inside the task, so executor count × batch cadence = request rate.
  */
trait EmbeddingProvider extends Serializable {
  def modelName: String
  def dimensions: Int
  def embedBatch(texts: Seq[String]): Seq[Array[Float]]
}

/** Deterministic offline provider, hash-seeded per text — the engine's
  * analogue of the reference's test provider (`tests/conftest.py:116-130`,
  * which returns `[0.1*(i+1)]*384`): same text ⇒ same vector, unit-norm,
  * no I/O. Used everywhere in this zero-egress environment.
  */
final class DeterministicProvider(val dimensions: Int = 64) extends EmbeddingProvider {
  override def modelName: String = s"deterministic-sha256-$dimensions"

  override def embedBatch(texts: Seq[String]): Seq[Array[Float]] = {
    val md = MessageDigest.getInstance("SHA-256")
    texts.map { t =>
      // counter-mode expansion of one text digest: 8 hashes yield 256 bytes
      // → 64 ints, instead of one digest per dimension
      val seed = md.digest(t.getBytes(StandardCharsets.UTF_8))
      val raw = new Array[Float](dimensions)
      var i = 0
      var block = Array.emptyByteArray
      while (i < dimensions) {
        if (i % 8 == 0) {
          md.reset()
          md.update(seed)
          md.update((i / 8).toByte)
          block = md.digest()
        }
        val o = (i % 8) * 4
        val x = ((block(o) & 0xff) << 24) | ((block(o + 1) & 0xff) << 16) |
          ((block(o + 2) & 0xff) << 8) | (block(o + 3) & 0xff)
        raw(i) = (x / Int.MaxValue.toDouble).toFloat
        i += 1
      }
      val n = math.sqrt(raw.map(v => v.toDouble * v).sum)
      if (n > 0) raw.map(v => (v / n).toFloat) else raw
    }
  }
}

object Embedding {

  /** Append `embedding`, `embeddingModel`, `embeddedAt` columns to `df` by
    * batch-embedding `textCol`. Row order within a partition is preserved;
    * the strict zip mirrors `embedding_service.py:66-72`.
    */
  def embed(
      df: DataFrame,
      textCol: String,
      provider: EmbeddingProvider,
      batchSize: Int = 100
  ): DataFrame = {
    val outSchema = df.schema
      .add("embedding", ArrayType(FloatType))
      .add("embeddingModel", StringType)
      .add("embeddedAt", StringType)
    val enc = RowEncoder.encoderFor(outSchema)
    val textIdx = df.schema.fieldIndex(textCol)
    val model = provider.modelName
    df.mapPartitions { rows =>
      val at = java.time.format.DateTimeFormatter.ISO_INSTANT
        .format(java.time.Instant.now().truncatedTo(java.time.temporal.ChronoUnit.SECONDS))
      rows.grouped(batchSize).flatMap { batch =>
        val vecs = provider.embedBatch(batch.map(_.getString(textIdx)))
        require(vecs.length == batch.length, s"provider returned ${vecs.length} vectors for ${batch.length} texts")
        batch.zip(vecs).map { case (row, v) =>
          Row.fromSeq(row.toSeq ++ Seq(v.toSeq, model, at))
        }
      }
    }(enc)
  }
}
