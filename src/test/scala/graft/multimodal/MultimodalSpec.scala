package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Multimodal plumbing: binary columns, typed metadata, batched feature
  * extraction (decode stubbed deterministic — see Multimodal scaladoc).
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def blobs = Seq(
    (1L, "fake-png-bytes-aaaa".getBytes("UTF-8")),
    (2L, "fake-png-bytes-bbbb".getBytes("UTF-8")),
    (3L, Array.empty[Byte])
  ).toDF("id", "blob")

  test("feature extraction is deterministic, batched, and null-safe") {
    val out = Multimodal.extractFeatures(blobs, "blob", dims = 16, batchSize = 2)
    assert(out.count() == 3)
    val feats = out.select("id", "features").as[(Long, Seq[Float])].collect().toMap
    assert(feats(1L).length == 16)
    assert(feats(1L) != feats(2L), "different bytes → different features")
    assert(feats(3L).forall(_ == 0f), "empty blob → zero vector")
    // determinism across runs
    val again = Multimodal.extractFeatures(blobs, "blob", dims = 16, batchSize = 2)
      .select("id", "features").as[(Long, Seq[Float])].collect().toMap
    assert(again(1L) == feats(1L))
  }

  test("typed media metadata struct attaches with real sizeBytes") {
    val out = Multimodal.withMediaMeta(blobs, "blob", "image", "png")
    val row = out.filter(col("id") === 1).select("media_meta.sizeBytes", "media_meta.mediaType").head()
    assert(row.getLong(0) == "fake-png-bytes-aaaa".getBytes("UTF-8").length.toLong)
    assert(row.getString(1) == "image")
    val actual = out.schema("media_meta").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(actual.fields.map(f => f.name -> f.dataType).toSeq ==
      Multimodal.mediaMetaSchema.fields.map(f => f.name -> f.dataType).toSeq)
  }

  test("resize and frame-sample stubs behave deterministically") {
    val f = Multimodal.MediaDecoder.decode("bytes".getBytes, 32)
    val r = Multimodal.MediaDecoder.resize(f, 8)
    assert(r.length == 8)
    val frames = Multimodal.MediaDecoder.sampleFrames((1 to 100).map(_.toByte).toArray, 10, 2)
    assert(frames.nonEmpty && frames.forall(_.length == 10))
    assert(Multimodal.MediaDecoder.sampleFrames(Array.empty[Byte], 10, 2).isEmpty)
  }
}
