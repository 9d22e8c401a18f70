package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines: media as opaque `binary` columns + typed metadata, processed
  * with typed `Dataset.mapPartitions` (the Scala analog of `mapInPandas` —
  * per-partition batch processing with a typed row contract).
  *
  * The actual codec work is STUBBED (this container has no image/audio
  * libraries): `decodeStub` derives deterministic fake dimensions/features
  * from the bytes. Everything Spark-side — schema, batch shape, partitioning,
  * null handling — is real and tested; swapping the stub for a JNI/javacv
  * decoder changes only the function body.
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
      duration_ms: Long,
      n_bytes: Long,
      ok: Boolean)

  final case class MediaFeatures(
      media_id: Long,
      features: Array[Float])

  /** STUB decoder — deterministic from payload bytes so tests are stable.
    * Real implementation: decode header via an image/audio codec.
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
      duration_ms = if (r.kind == "image" || !ok) 0L else math.abs(h >> 32) % 600000L,
      n_bytes = bytes.length.toLong,
      ok = ok)
  }

  /** Decode metadata per media row — partition-parallel, zero shuffle. */
  def decode(ds: Dataset[MediaRow]): Dataset[DecodedMedia] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map(decodeStub))
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
