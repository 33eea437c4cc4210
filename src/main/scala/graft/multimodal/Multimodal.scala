package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns for training-data pipelines: media as opaque `binary`
  * columns plus a typed metadata struct, with decode / feature-extract /
  * resize / frame-sample as batched `mapPartitions` stages.
  *
  * Image (PNG/JPEG/GIF/BMP via `javax.imageio`) and audio (WAV/AIFF PCM via
  * `javax.sound.sampled`) decoding is REAL — both codecs ship with the JDK,
  * so no external dependency is needed: [[MediaDecoder.decodeImage]] pools
  * mean luminance over a √dims×√dims grid, [[MediaDecoder.decodeWav]] pools
  * mean |amplitude| into `dims` time buckets. Video and unknown formats
  * fall back to the deterministic byte-stub ([[MediaDecoder.decode]] — the
  * oracle-checkable path the `mm_binary_features` battery entry pins), so
  * the pipeline shape is identical whichever decoder fires.
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

    /** REAL image decode (JDK `javax.imageio`: PNG/JPEG/GIF/BMP): returns
      * (width, height, features) where features is mean luminance pooled
      * over a √dims×√dims grid, scaled to [-1, 1]. None for blobs no
      * installed reader accepts.
      */
    def decodeImage(bytes: Array[Byte], dims: Int): Option[(Int, Int, Array[Float])] = {
      if (bytes == null || bytes.isEmpty) return None
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        catch { case _: Exception => null }
      if (img == null) return None
      val g = math.max(1, math.sqrt(dims.toDouble).toInt)
      val w = img.getWidth
      val h = img.getHeight
      val out = new Array[Float](dims)
      var cy = 0
      while (cy < g) {
        var cx = 0
        while (cx < g) {
          val x0 = cx * w / g; val x1 = math.max(x0 + 1, (cx + 1) * w / g)
          val y0 = cy * h / g; val y1 = math.max(y0 + 1, (cy + 1) * h / g)
          var sum = 0.0
          var n = 0
          var y = y0
          while (y < math.min(y1, h)) {
            var x = x0
            while (x < math.min(x1, w)) {
              val rgb = img.getRGB(x, y)
              sum += 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
                0.114 * (rgb & 0xff)
              n += 1
              x += 1
            }
            y += 1
          }
          if (n > 0) out(cy * g + cx) = ((sum / n) / 127.5 - 1.0).toFloat
          cx += 1
        }
        cy += 1
      }
      Some((w, h, out))
    }

    /** REAL audio decode (JDK `javax.sound.sampled`: WAV/AIFF PCM): returns
      * (durationMs, features) where features is mean |amplitude| pooled
      * into `dims` time buckets, scaled to [0, 1]. None for non-audio.
      */
    def decodeWav(bytes: Array[Byte], dims: Int): Option[(Long, Array[Float])] = {
      if (bytes == null || bytes.isEmpty) return None
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val fmt = in.getFormat
          val frames = in.getFrameLength
          if (frames <= 0 || fmt.getSampleSizeInBits != 16) return None
          val durationMs = (frames * 1000.0 / fmt.getFrameRate).toLong
          val data = in.readAllBytes()
          val bytesPerSample = 2
          val channels = fmt.getChannels
          val nSamples = data.length / (bytesPerSample * channels)
          if (nSamples == 0) return None
          val out = new Array[Float](dims)
          val counts = new Array[Int](dims)
          val big = fmt.isBigEndian
          var s = 0
          while (s < nSamples) {
            val off = s * bytesPerSample * channels // first channel only
            val sample =
              if (big) ((data(off) << 8) | (data(off + 1) & 0xff)).toShort
              else ((data(off + 1) << 8) | (data(off) & 0xff)).toShort
            val bucket = (s.toLong * dims / nSamples).toInt
            out(bucket) += math.abs(sample.toInt) / 32768.0f
            counts(bucket) += 1
            s += 1
          }
          var i = 0
          while (i < dims) { if (counts(i) > 0) out(i) /= counts(i); i += 1 }
          Some((durationMs, out))
        } finally in.close()
      } catch { case _: Exception => None }
    }

    /** Magic-byte sniff for video containers. The JDK ships no video codec
      * (ImageIO/javax.sound cover stills and PCM audio only), so these can
      * be RECOGNIZED but not decoded — callers get a typed status instead
      * of stub features that could be mistaken for signal downstream.
      */
    def videoContainer(bytes: Array[Byte]): Option[String] = {
      if (bytes == null || bytes.length < 12) return None
      def at(i: Int) = bytes(i) & 0xff
      if (bytes(4) == 'f' && bytes(5) == 't' && bytes(6) == 'y' && bytes(7) == 'p')
        Some("mp4") // ISO BMFF: size + 'ftyp' + major brand
      else if (at(0) == 0x1a && at(1) == 0x45 && at(2) == 0xdf && at(3) == 0xa3)
        Some("matroska") // EBML header (mkv/webm)
      else if (bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
        bytes(8) == 'A' && bytes(9) == 'V' && bytes(10) == 'I')
        Some("avi")
      else None
    }

    /** Auto decode: real image → real audio → video recognized-but-
      * unsupported (null features, typed kind) → byte-stub fallback for
      * everything else. Returns the features plus which decoder fired;
      * `unsupported:<container>` carries NULL features by design — a
      * video blob must never flow downstream wearing stub "signal".
      */
    def decodeAuto(bytes: Array[Byte], dims: Int): (Array[Float], String) =
      decodeImage(bytes, dims).map { case (_, _, f) => (f, "image") }
        .orElse(decodeWav(bytes, dims).map { case (_, f) => (f, "audio") })
        .orElse(videoContainer(bytes).map(c =>
          (null: Array[Float], s"unsupported:$c")))
        .getOrElse((decode(bytes, dims), "stub"))

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

  /** Batched REAL media decode: image/audio blobs get codec-derived
    * features, everything else the deterministic stub — with a
    * `decode_kind` column saying which decoder fired. Same batch shape and
    * failure isolation as [[extractFeatures]].
    */
  def extractMediaFeatures(
      df: DataFrame,
      blobCol: String,
      dims: Int = 64
  ): DataFrame = {
    val outSchema = df.schema
      .add("features", ArrayType(FloatType))
      .add("decode_kind", StringType)
    val enc = RowEncoder.encoderFor(outSchema)
    val idx = df.schema.fieldIndex(blobCol)
    // plain per-row map: the JDK decoders work row-at-a-time, so a
    // grouped() batching layer would be dead weight here (a vectorized
    // decoder would batch at this exact spot)
    df.mapPartitions { rows =>
      rows.map { row =>
        val blob = if (row.isNullAt(idx)) null else row.getAs[Array[Byte]](idx)
        val (feats, kind) =
          try {
            val (f, k) = MediaDecoder.decodeAuto(blob, dims)
            (if (f == null) null else f.toSeq, k) // unsupported → typed kind, null features
          } catch { case _: Exception => (null, "error") }
        Row.fromSeq(row.toSeq :+ feats :+ kind)
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
