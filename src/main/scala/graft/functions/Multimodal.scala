package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines: media as opaque `binary` columns + typed metadata, processed
  * with typed `Dataset.mapPartitions` (the Scala analog of `mapInPandas` —
  * per-partition batch processing with a typed row contract).
  *
  * The IMAGE path decodes for real through JDK `javax.imageio` (PNG/JPEG/
  * GIF/BMP — no extra jars, headless-safe): real width/height/channel
  * counts, with the deterministic byte-hash stub as the fallback for
  * payloads ImageIO cannot read. Audio/video codec work remains STUBBED
  * (this container has no media libraries): `decodeStub` derives
  * deterministic fake dimensions/features from the bytes. Everything
  * Spark-side — schema, batch shape, partitioning, null handling — is real
  * and tested; swapping the stub for a JNI/javacv decoder changes only the
  * function body.
  */
object Multimodal {

  /** The canonical media row: opaque payload + typed metadata. */
  final case class MediaRow(
      media_id: Long,
      kind: String,        // "image" | "audio" | "video"
      payload: Array[Byte],
      mime: String,
      source_uri: String)

  final case class DecodedMedia(
      media_id: Long,
      kind: String,
      width: Int,
      height: Int,
      n_channels: Int,     // real for ImageIO-decoded images; 0 for stub rows
      duration_ms: Long,
      n_bytes: Long,
      ok: Boolean)

  final case class MediaFeatures(
      media_id: Long,
      features: Array[Float])

  /** Real image header decode via JDK ImageIO → (width, height, channels);
    * None when the payload isn't a readable image. The disk cache is off so
    * executor threads never touch temp files for in-memory payloads.
    */
  private[functions] def decodeImage(bytes: Array[Byte]): Option[(Int, Int, Int)] =
    if (bytes == null || bytes.isEmpty) None
    else try {
      javax.imageio.ImageIO.setUseCache(false)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else Some((img.getWidth, img.getHeight, img.getColorModel.getNumComponents))
    } catch { case _: java.io.IOException => None }

  /** STUB decoder — deterministic from payload bytes so tests are stable.
    * Stands in for the audio/video codecs this container lacks.
    */
  private[functions] def decodeStub(r: MediaRow): DecodedMedia = {
    val bytes = if (r.payload == null) Array.emptyByteArray else r.payload
    val h     = bytes.foldLeft(1469598103934665603L)((a, b) => (a ^ (b & 0xff)) * 1099511628211L)
    val ok    = bytes.nonEmpty
    DecodedMedia(
      media_id = r.media_id,
      kind = r.kind,
      width = if (ok) (math.abs(h) % 1920 + 16).toInt else 0,
      height = if (ok) (math.abs(h >> 16) % 1080 + 16).toInt else 0,
      n_channels = 0,
      duration_ms = if (r.kind == "image" || !ok) 0L else math.abs(h >> 32) % 600000L,
      n_bytes = bytes.length.toLong,
      ok = ok)
  }

  /** Decode metadata per media row — partition-parallel, zero shuffle.
    * Image payloads decode for REAL (ImageIO); unreadable image bytes fall
    * back to the stub so mixed corpora keep flowing (ok still reflects
    * payload presence — see [[decodeStrict]] for decode-success gating).
    */
  def decode(ds: Dataset[MediaRow]): Dataset[DecodedMedia] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map { r =>
      if (r.kind == "image") decodeImage(r.payload) match {
        case Some((w, h, c)) =>
          DecodedMedia(r.media_id, r.kind, w, h, c, 0L,
            r.payload.length.toLong, ok = true)
        case None => decodeStub(r)
      }
      else decodeStub(r)
    })
  }

  /** Like [[decode]] but `ok` means THE DECODE SUCCEEDED: image rows that
    * ImageIO cannot read come back all-zero with ok = false (no stub
    * fallback) — the honest gate for curation pipelines that drop
    * undecodable media.
    */
  def decodeStrict(ds: Dataset[MediaRow]): Dataset[DecodedMedia] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map { r =>
      val nb = if (r.payload == null) 0L else r.payload.length.toLong
      if (r.kind == "image") decodeImage(r.payload) match {
        case Some((w, h, c)) => DecodedMedia(r.media_id, r.kind, w, h, c, 0L, nb, ok = true)
        case None            => DecodedMedia(r.media_id, r.kind, 0, 0, 0, 0L, nb, ok = false)
      }
      else decodeStub(r)
    })
  }

  /** STUB feature extractor: fixed-width feature vector from byte
    * histogram — real implementation would run a vision/audio encoder per
    * partition (model loaded once per partition, amortized over the batch —
    * the same batching contract as a Pandas UDF).
    */
  def extractFeatures(ds: Dataset[MediaRow], dim: Int = 64): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      // per-partition init hook (e.g. load a model) happens HERE, once
      it.map { r =>
        val bytes = if (r.payload == null) Array.emptyByteArray else r.payload
        val hist  = new Array[Float](dim)
        var i     = 0
        while (i < bytes.length) { hist((bytes(i) & 0xff) % dim) += 1f; i += 1 }
        val n = math.max(1, bytes.length).toFloat
        MediaFeatures(r.media_id, hist.map(_ / n))
      }
    }
  }

  /** Frame sampling for video payloads: deterministic byte-range slices as
    * stand-ins for decoded frames. Output explodes one row per sampled frame
    * — downstream joins/dedup treat frames like images.
    */
  def sampleFrames(ds: Dataset[MediaRow], everyNth: Int = 10, maxFrames: Int = 8): DataFrame = {
    import ds.sparkSession.implicits._
    ds.filter(_.kind == "video")
      .flatMap { r =>
        val bytes  = if (r.payload == null) Array.emptyByteArray else r.payload
        val frameSz = math.max(1, bytes.length / math.max(1, everyNth * maxFrames))
        (0 until maxFrames).iterator
          .map(i => i * everyNth * frameSz)
          .takeWhile(_ < bytes.length)
          .zipWithIndex
          .map { case (off, idx) =>
            (r.media_id, idx, bytes.slice(off, math.min(bytes.length, off + frameSz)))
          }
      }
      .toDF("media_id", "frame_idx", "frame_bytes")
  }

  /** Media corpus derived deterministically from the `documents` table:
    * payload = UTF-8 text bytes, kind cycles image/audio/video by doc_id.
    * Because the payload is a pure function of `text`, byte-level pipeline
    * outputs (sizes, frame counts) are reproducible in ANSI SQL — the
    * multimodal plumbing gets a real DuckDB oracle, not just a row count.
    */
  def corpusFromDocuments(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("text"), col("source"))
      .as[(Long, String, String)]
      .map { case (id, text, src) =>
        val kind = Seq("image", "audio", "video")((id % 3).toInt)
        MediaRow(id, kind, text.getBytes(java.nio.charset.StandardCharsets.UTF_8),
          s"application/x-$kind", s"doc://$src/$id")
      }
  }

  /** Deterministic RGB PNG: dimensions are the caller's, pixel values a pure
    * function of (seed, x, y) — so corpora built from it have SQL-predictable
    * decoded dimensions while the bytes are a REAL png stream.
    */
  def syntheticPng(width: Int, height: Int, seed: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        img.setRGB(x, y, ((seed * 31 + x * 7 + y * 13) & 0xffffff).toInt)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.setUseCache(false)
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Image corpus with REAL PNG payloads derived from `documents`: one image
    * per doc with doc_id % 3 == 0 (the corpus' "image" rows), dimensions the
    * closed form width = 16 + doc_id % 31, height = 16 + doc_id % 17 — so a
    * SQL oracle can predict every decoded stat. Docs with doc_id % 5 == 0
    * carry a TRUNCATED payload (first 10 bytes) to exercise the
    * decode-failure path deterministically (10 bytes cannot even carry the
    * PNG signature + IHDR, so every ImageIO reader rejects it).
    */
  def imageCorpusFromDocuments(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("source"))
      .filter(col("doc_id") % 3 === 0)
      .as[(Long, String)]
      .map { case (id, src) =>
        val png = syntheticPng(16 + (id % 31).toInt, 16 + (id % 17).toInt, id)
        val payload = if (id % 5 == 0) png.take(10) else png
        MediaRow(id, "image", payload, "image/png", s"doc://$src/$id")
      }
  }

  /** Deterministic synthetic media corpus (for tests and benches). */
  def syntheticCorpus(spark: SparkSession, n: Int, seed: Long = 42L): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).map { i =>
      val rnd   = new scala.util.Random(seed + i)
      val kind  = Seq("image", "audio", "video")(rnd.nextInt(3))
      val bytes = new Array[Byte](64 + rnd.nextInt(4096))
      rnd.nextBytes(bytes)
      MediaRow(i, kind, bytes, s"application/x-$kind", s"mem://corpus/$i")
    }
  }
}
