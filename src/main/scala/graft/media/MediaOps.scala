package graft.media

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One media asset: an opaque binary payload plus typed metadata. The
  * engine treats image/audio/video as `binary` columns end-to-end (scan,
  * shuffle, feature extraction) — only the innermost decode touches the
  * bytes, so the plan stays columnar and the payload is never parsed by
  * Catalyst.
  */
case class MediaIn(
    media_id: Long,
    kind: String,
    payload: Array[Byte],
    width: Int,        // image: pixels per row (fake geometry)
    sample_rate: Int,  // audio
    frame_size: Int)   // video: bytes per frame

/** Decoded per-asset features emitted by [[MediaOps.decodeFeatures]]. */
case class MediaFeatures(
    media_id: Long,
    kind: String,
    byte_count: Int,
    byte_sum: Long,
    byte_min: Int,
    byte_max: Int,
    checksum: Long)

/** Multimodal column plumbing: a deterministic media table derived from
  * `documents` (payload = UTF-8 bytes of the text — a stand-in for real
  * image/audio/video blobs), and a batched decode/feature-extract path.
  *
  * Decode is two-tier: payloads that ARE real images (PNG/JPEG by magic
  * bytes) decode through `javax.imageio` — in the JDK, no container
  * codecs needed — and the emitted features are decoded grayscale PIXEL
  * stats. Everything else (the synthetic corpus payloads, and the
  * audio/video kinds this container has no codecs for) falls through to
  * deterministic byte-level features standing in for the codec call.
  * The surrounding plumbing — binary schema, partitioning, batched
  * iterator shape (the Scala analog of `mapInPandas`'s record-batch
  * contract), typed Encoder — is identical for both tiers.
  */
object MediaOps {

  /** Media manifest over the documents table: one asset per doc, kind
    * cycling image/audio/video by id, payload as a binary column.
    */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")
      .repartition(spark.sparkContext.defaultParallelism)
      .select(
        col("doc_id").as("media_id"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio")
          .otherwise("video").as("kind"),
        encode(col("text"), "UTF-8").as("payload"),
        lit(16).as("width"),
        lit(8000).as("sample_rate"),
        lit(32).as("frame_size"))

  /** Batch size of the decode path — the `mapInPandas` batch analog:
    * decoders amortize per-call setup (codec init, model load) across a
    * batch, so the iterator is consumed in groups, not row-at-a-time.
    */
  val DecodeBatchSize = 64

  /** Batched decode/feature-extract over the media table. Runs as one
    * narrow `mapPartitions` stage: no shuffle, payload bytes never leave
    * the executor.
    */
  def decodeFeatures(media: Dataset[MediaIn]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(DecodeBatchSize).flatMap { batch =>
        // a real decoder would init the codec once per batch here
        batch.map(decodeOne)
      }
    }
  }

  /** Per-asset decode. Real images (PNG/JPEG magic) go through the
    * imageio codec and report PIXEL stats over the decoded grayscale
    * raster; all other payloads report byte-level features standing in
    * for the codec call (pixel stats / PCM stats / container probe) —
    * the synthetic corpus payloads are UTF-8 text, so the oracle
    * contract for them is exactly this byte path.
    */
  private[media] def decodeOne(m: MediaIn): MediaFeatures = {
    val bytes = decodeImageGray(m.payload)
      .orElse(decodeAudioPcm(m.payload))
      .getOrElse(m.payload)
    var sum = 0L
    var wsum = 0L
    var mn = 255
    var mx = 0
    var i = 0
    while (i < bytes.length) {
      val v = bytes(i) & 0xff
      sum += v
      wsum += (i + 1).toLong * v
      if (v < mn) mn = v
      if (v > mx) mx = v
      i += 1
    }
    if (bytes.isEmpty) { mn = 0; mx = 0 }
    MediaFeatures(m.media_id, m.kind, bytes.length, sum, mn, mx, wsum)
  }

  /** Real thumbnailer tier for image payloads: decode via imageio and
    * scale to (w, h) with bilinear interpolation into an 8-bit grayscale
    * raster (row-major, w*h bytes). None for non-image payloads — the
    * relational m02 query keeps its byte-fold "block thumbnail" for
    * those, same two-tier contract as [[decodeOne]].
    */
  private[media] def resizeImageGray(b: Array[Byte], w: Int, h: Int): Option[Array[Byte]] = {
    require(w > 0 && h > 0, s"thumbnail dims must be positive: ${w}x$h")
    val isPng = b.length > 8 && (b(0) & 0xff) == 0x89 &&
      b(1) == 'P'.toByte && b(2) == 'N'.toByte && b(3) == 'G'.toByte
    val isJpeg = b.length > 3 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8
    if (!isPng && !isJpeg) None
    else
      try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))).map { img =>
        val thumb = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        val g = thumb.createGraphics()
        try {
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, w, h, null)
        } finally g.dispose()
        thumb.getRaster.getDataBuffer
          .asInstanceOf[java.awt.image.DataBufferByte].getData
      }
      catch { case _: java.io.IOException => None }
  }

  /** Real codec path: if the payload carries a PNG or JPEG signature,
    * decode it with `javax.imageio` and return the 8-bit grayscale
    * raster (row-major, one byte per pixel, so byte_count = w*h).
    * Returns None for non-image payloads or undecodable bytes — the
    * caller falls back to the byte-level features. Headless-safe: only
    * BufferedImage/Raster, no display resources.
    */
  private[media] def decodeImageGray(b: Array[Byte]): Option[Array[Byte]] = {
    val isPng = b.length > 8 && (b(0) & 0xff) == 0x89 &&
      b(1) == 'P'.toByte && b(2) == 'N'.toByte && b(3) == 'G'.toByte
    val isJpeg = b.length > 3 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8
    if (!isPng && !isJpeg) None
    else
      try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))).map { img =>
        val gray = new java.awt.image.BufferedImage(img.getWidth, img.getHeight,
          java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        val g = gray.createGraphics()
        try g.drawImage(img, 0, 0, null) finally g.dispose()
        gray.getRaster.getDataBuffer
          .asInstanceOf[java.awt.image.DataBufferByte].getData
      }
      catch { case _: java.io.IOException => None } // truncated/corrupt container
  }

  /** Real audio codec tier: if the payload carries a RIFF/WAVE signature,
    * decode it with `javax.sound.sampled` (in the JDK — no container
    * codecs needed) and return the raw PCM frame bytes (the data chunk,
    * headers stripped), so the emitted features are SAMPLE stats rather
    * than container-byte stats. Returns None for non-WAV payloads or
    * unsupported encodings — the caller falls back to byte-level
    * features, same two-tier contract as [[decodeImageGray]].
    */
  private[media] def decodeAudioPcm(b: Array[Byte]): Option[Array[Byte]] = {
    val isRiffWave = b.length > 12 &&
      b(0) == 'R'.toByte && b(1) == 'I'.toByte &&
      b(2) == 'F'.toByte && b(3) == 'F'.toByte &&
      b(8) == 'W'.toByte && b(9) == 'A'.toByte &&
      b(10) == 'V'.toByte && b(11) == 'E'.toByte
    if (!isRiffWave) None
    else
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(b))
        try Some(in.readAllBytes()) finally in.close()
      } catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException => None
        case _: java.io.IOException => None
      }
  }
}
