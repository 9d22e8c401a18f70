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
  * counts. The AUDIO path decodes for real through JDK
  * `javax.sound.sampled` (WAV/AIFF/AU — also jar-free): real channel
  * count, sample rate, and frame-exact duration. Both fall back to the
  * deterministic byte-hash stub in [[decode]] for payloads the JDK reader
  * rejects. VIDEO codec work remains STUBBED (the JDK has no video
  * decoder and this container has no media libraries): `decodeStub`
  * derives deterministic fake dimensions/features from the bytes.
  * Everything Spark-side — schema, batch shape, partitioning, null
  * handling — is real and tested; swapping the video stub for a
  * JNI/javacv decoder changes only the function body.
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
      n_channels: Int,     // real for ImageIO images / sampled audio; 0 for stub rows
      sample_rate: Int,    // Hz; real for decoded audio, 0 otherwise
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

  /** Real audio header decode via JDK `javax.sound.sampled` →
    * (channels, sampleRateHz, durationMs); None when the payload isn't a
    * readable WAV/AIFF/AU stream. Duration is frame-exact:
    * frameLength / frameRate off the container header — no PCM data is
    * traversed, so this is O(header) per row regardless of payload size.
    */
  private[functions] def decodeAudio(bytes: Array[Byte]): Option[(Int, Int, Long)] =
    if (bytes == null || bytes.isEmpty) None
    else try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt    = in.getFormat
        val frames = in.getFrameLength
        if (frames < 0 || fmt.getFrameRate <= 0f) None
        else Some((fmt.getChannels, math.round(fmt.getSampleRate),
          math.round(frames * 1000.0 / fmt.getFrameRate)))
      } finally in.close()
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException => None
      case _: java.io.IOException                               => None
    }

  /** STUB decoder — deterministic from payload bytes so tests are stable.
    * Stands in for the video codecs this container lacks (and, in lenient
    * [[decode]], for audio/image payloads the JDK readers reject).
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
      sample_rate = 0,
      duration_ms = if (r.kind == "image" || !ok) 0L else math.abs(h >> 32) % 600000L,
      n_bytes = bytes.length.toLong,
      ok = ok)
  }

  /** One media row through the real JDK decoders; None when the payload
    * isn't readable for its kind (video has no JDK decoder → always None).
    */
  private def decodeReal(r: MediaRow): Option[DecodedMedia] = {
    val nb = if (r.payload == null) 0L else r.payload.length.toLong
    r.kind match {
      case "image" => decodeImage(r.payload).map { case (w, h, c) =>
        DecodedMedia(r.media_id, r.kind, w, h, c, 0, 0L, nb, ok = true)
      }
      case "audio" => decodeAudio(r.payload).map { case (ch, rate, ms) =>
        DecodedMedia(r.media_id, r.kind, 0, 0, ch, rate, ms, nb, ok = true)
      }
      case _ => None
    }
  }

  /** Decode metadata per media row — partition-parallel, zero shuffle.
    * Image and audio payloads decode for REAL (ImageIO / javax.sound);
    * unreadable bytes fall back to the stub so mixed corpora keep flowing
    * (ok still reflects payload presence — see [[decodeStrict]] for
    * decode-success gating).
    */
  def decode(ds: Dataset[MediaRow]): Dataset[DecodedMedia] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map(r => decodeReal(r).getOrElse(decodeStub(r))))
  }

  /** Like [[decode]] but `ok` means THE DECODE SUCCEEDED: image/audio rows
    * the JDK readers cannot parse come back all-zero with ok = false (no
    * stub fallback) — the honest gate for curation pipelines that drop
    * undecodable media. Video stays on the stub (no JDK decoder exists).
    */
  def decodeStrict(ds: Dataset[MediaRow]): Dataset[DecodedMedia] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map { r =>
      val nb = if (r.payload == null) 0L else r.payload.length.toLong
      if (r.kind == "video") decodeStub(r)
      else decodeReal(r).getOrElse(
        DecodedMedia(r.media_id, r.kind, 0, 0, 0, 0, 0L, nb, ok = false))
    })
  }

  /** Per-clip PCM sample statistics — REAL signal decode, not header reads:
    * the full 16-bit PCM stream decompresses through `AudioInputStream`
    * (so WAV/AIFF/AU byte order and container framing are the JDK's
    * problem, not ours) and folds to (n_samples, sum_abs, peak) integers in
    * the same partition-parallel pass. Integer stats, not RMS doubles, so a
    * SQL oracle over the synthetic corpus' closed-form samples compares
    * EXACTLY. Unreadable payloads yield ok = false with zeroed stats.
    * O(payload bytes) per row, zero shuffle — the contract a feature
    * extractor at 100 TB needs.
    */
  def audioPcmStats(ds: Dataset[MediaRow]): DataFrame = {
    import ds.sparkSession.implicits._
    ds.filter(_.kind == "audio").mapPartitions(_.map { r =>
      val stats =
        if (r.payload == null || r.payload.isEmpty) None
        else try {
          val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(r.payload))
          try {
            val fmt = in.getFormat
            if (fmt.getSampleSizeInBits != 16) None
            else {
              val le  = !fmt.isBigEndian
              val buf = new Array[Byte](8192)
              var n   = 0L; var sumAbs = 0L; var peak = 0L
              var read = in.read(buf)
              var carry = -1 // split sample across read boundaries
              while (read > 0) {
                var i = 0
                if (carry >= 0 && read > 0) {
                  val v = if (le) ((buf(0) << 8) | carry).toShort
                          else ((carry << 8) | (buf(0) & 0xff)).toShort
                  val a = math.abs(v.toLong)
                  n += 1; sumAbs += a; if (a > peak) peak = a
                  carry = -1; i = 1
                }
                while (i + 1 < read) {
                  val v = if (le) (((buf(i + 1) & 0xff) << 8) | (buf(i) & 0xff)).toShort
                          else (((buf(i) & 0xff) << 8) | (buf(i + 1) & 0xff)).toShort
                  val a = math.abs(v.toLong)
                  n += 1; sumAbs += a; if (a > peak) peak = a
                  i += 2
                }
                if (i < read) carry = buf(i) & 0xff
                read = in.read(buf)
              }
              Some((n, sumAbs, peak))
            }
          } finally in.close()
        } catch {
          case _: javax.sound.sampled.UnsupportedAudioFileException => None
          case _: java.io.IOException                               => None
        }
      stats match {
        case Some((n, s, p)) => (r.media_id, n, s, p, true)
        case None            => (r.media_id, 0L, 0L, 0L, false)
      }
    }).toDF("media_id", "n_samples", "sum_abs", "peak", "ok")
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

  /** Deterministic 16-bit PCM WAV: `nFrames` frames at `sampleRate` Hz with
    * `channels` channels, sample values a pure function of (seed, frame,
    * channel) — so corpora built from it have SQL-predictable decoded
    * channel counts and durations while the bytes are a REAL RIFF/WAVE
    * stream any audio reader accepts.
    */
  def syntheticWav(nFrames: Int, sampleRate: Int = 8000, channels: Int = 1,
      seed: Long = 0L): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(
      sampleRate.toFloat, 16, channels, true, false) // PCM signed little-endian
    val pcm = new Array[Byte](nFrames * channels * 2)
    var f = 0
    while (f < nFrames) {
      var c = 0
      while (c < channels) {
        val v = ((seed * 31 + f * 7 + c * 13) & 0xffff).toShort
        val off = (f * channels + c) * 2
        pcm(off) = (v & 0xff).toByte
        pcm(off + 1) = ((v >> 8) & 0xff).toByte
        c += 1
      }
      f += 1
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Audio corpus with REAL WAV payloads derived from `documents`: one clip
    * per doc with doc_id % 3 == 1 (the corpus' "audio" rows), the closed
    * forms channels = 1 + doc_id % 2 and nFrames = 400 + (doc_id % 50) * 80
    * at 8000 Hz — so duration_ms = 50 + (doc_id % 50) * 10 and a SQL oracle
    * can predict every decoded stat. Docs with doc_id % 5 == 0 carry a
    * TRUNCATED payload (first 10 bytes — cannot even carry the RIFF/WAVE
    * header) to exercise the decode-failure path deterministically.
    */
  def audioCorpusFromDocuments(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("source"))
      .filter(col("doc_id") % 3 === 1)
      .as[(Long, String)]
      .map { case (id, src) =>
        val wav = syntheticWav(400 + (id % 50).toInt * 80, 8000,
          1 + (id % 2).toInt, id)
        val payload = if (id % 5 == 0) wav.take(10) else wav
        MediaRow(id, "audio", payload, "audio/wav", s"doc://$src/$id")
      }
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
