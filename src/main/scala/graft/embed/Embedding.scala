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

/** Oracle-replayable deterministic provider: dimension `i` of a text's
  * vector derives from the same 60-bit md5 construction the dedup oracles
  * replay in DuckDB (`md5_number_lower(x) >> 4`, see
  * [[graft.operators.Dedup.md5Lower60]]):
  *
  *   v(i) = ((md5Lower60(md5Hex(text) + ":" + i) mod 2048) - 1024) / 1024
  *
  * Components are multiples of 2⁻¹⁰ in [-1, 1), so every value is exactly
  * representable in float32 AND in double — sums, dot products (multiples of
  * 2⁻²⁰) and norms over these vectors are bit-identical between the engine
  * and a DuckDB SQL oracle, which is what promotes E1 stats from rows-only
  * to hash-matched. One md5 of the full text per doc, then one md5 of a
  * ~36-char string per dimension (the cheap expansion order).
  */
final class ReplayableProvider(val dimensions: Int = 16) extends EmbeddingProvider {
  override def modelName: String = s"md5-replayable-$dimensions"

  override def embedBatch(texts: Seq[String]): Seq[Array[Float]] = {
    val md = MessageDigest.getInstance("MD5")
    texts.map { t =>
      val seedHex = ReplayableProvider.hex(md.digest(t.getBytes(StandardCharsets.UTF_8)))
      Array.tabulate(dimensions) { i =>
        md.reset()
        val h = ReplayableProvider.md5Lower60(md.digest(s"$seedHex:$i".getBytes(StandardCharsets.UTF_8)))
        (((h % 2048L) - 1024L) / 1024.0).toFloat
      }
    }
  }
}

object ReplayableProvider {
  private val hexChars = "0123456789abcdef".toCharArray

  def hex(bytes: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder(bytes.length * 2)
    bytes.foreach { b => sb.append(hexChars((b >> 4) & 0xf)).append(hexChars(b & 0xf)) }
    sb.toString
  }

  /** JVM twin of [[graft.operators.Dedup.md5Lower60]] / DuckDB
    * `md5_number_lower(x) >> 4`: the lower 8 digest bytes little-endian,
    * shifted right 4 bits (60 bits, always non-negative).
    */
  def md5Lower60(digest: Array[Byte]): Long = {
    var v = 0L
    var b = 15
    while (b >= 9) { v = (v << 8) | (digest(b) & 0xffL); b -= 1 }
    (v << 4) | ((digest(8) & 0xf0L) >> 4)
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
