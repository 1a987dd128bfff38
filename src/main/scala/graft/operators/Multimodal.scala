package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Multimodal (image/audio/video) column support.
  *
  * Model: media is an opaque `binary` payload column plus typed metadata
  * columns — the layout that works at 100 TB because parquet late
  * materialization means metadata-only queries never read the payload
  * bytes, and the payload column's pages stay compressed until a decode
  * stage actually needs them. Partitioning is by `media_type` so a
  * pipeline stage that only touches one modality prunes the rest.
  *
  * Decode/feature-extract/frame-sample run as partition-local batch
  * functions over a typed Dataset (`mapPartitions` — Spark's JVM analogue
  * of arrow-batched Python UDFs: no per-row closure dispatch, one
  * function call per partition, codegen-friendly boundaries).
  *
  * ==STUBBED DECODE==
  * This container ships no codec libraries (no ImageIO plugins beyond
  * JDK defaults, no ffmpeg), so the byte→pixels/samples step is a
  * clearly-marked deterministic fake ([[Multimodal.decodeFeatures]],
  * [[Multimodal.sampleFrames]]): it preserves the exact contract (bytes
  * in → fixed-length vector / frame list out, pure per-record, total) so
  * the Spark-side plumbing — schema, batch shape, partitioning, typed
  * encoders — is real and tested; swapping in a real decoder changes one
  * pure function. The fixture payloads are derived deterministically
  * from `documents.text` (fixtures carry no real media bytes).
  */
object Multimodal {

  /** One media object: opaque payload + typed metadata. */
  final case class MediaRecord(doc_id: Long, media_type: String,
      payload: Array[Byte], width: Int, height: Int, n_frames: Int)

  final case class MediaFeatures(doc_id: Long, media_type: String,
      n_bytes: Int, byte_mean: Double, features: Array[Double])

  final case class Frame(doc_id: Long, frame_idx: Int, offset: Int,
      frame_sig: String)

  val FeatureDim = 8

  // ------------------------------------------------------------------
  // Stubbed decoders (deterministic fakes with the real contract)
  // ------------------------------------------------------------------

  /** STUB decode: a real implementation decodes the payload (JPEG/WAV/...)
    * and extracts a feature vector; this fake derives an
    * L1-normalized byte-value histogram — deterministic, pure,
    * fixed-dimension, so every downstream contract (schema, batching,
    * aggregation) is exercised for real. */
  def decodeFeatures(payload: Array[Byte], dim: Int = FeatureDim): Array[Double] = {
    val hist = new Array[Double](dim)
    var i = 0
    while (i < payload.length) {
      hist((payload(i) & 0xff) * dim / 256) += 1.0
      i += 1
    }
    if (payload.length > 0) { var j = 0; while (j < dim) { hist(j) /= payload.length; j += 1 } }
    hist
  }

  /** STUB frame sampler: a real implementation seeks key frames; this
    * fake cuts the payload into `n` equal spans and fingerprints each
    * span's first bytes. Same shape: one row per sampled frame. */
  def sampleFrames(docId: Long, payload: Array[Byte], n: Int): Seq[Frame] = {
    if (payload.isEmpty || n <= 0) return Seq.empty
    val span = math.max(1, payload.length / n)
    (0 until math.min(n, payload.length)).map { k =>
      val off = k * span
      val sig = payload.slice(off, math.min(off + 4, payload.length))
        .map(b => f"${b & 0xff}%02x").mkString
      Frame(docId, k, off, sig)
    }
  }

  // ------------------------------------------------------------------
  // The media table (payloads derived from the documents fixture)
  // ------------------------------------------------------------------

  /** Media table over the documents fixture: payload = UTF-8 bytes of the
    * text (stand-in for real media bytes), modality round-robined by
    * doc_id, metadata derived deterministically. At scale this table is
    * written `partitionBy("media_type")`. */
  def mediaTable(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents").select(
      col("doc_id"),
      element_at(lit(Array("image", "audio", "video")),
        (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
      col("text").cast("binary").as("payload"),
      (lit(64) + (col("doc_id") % 8) * 32).cast("int").as("width"),
      (lit(64) + (col("doc_id") % 4) * 32).cast("int").as("height"),
      (lit(1) + (col("doc_id") % 16)).cast("int").as("n_frames"))

  /** Metadata-only scan: never touches payload bytes beyond length/hash —
    * the query shape that must NOT decode anything at 100 TB. */
  def mediaMetadata(s: SparkSession, dir: String): DataFrame =
    mediaTable(s, dir).select(
        col("doc_id"), col("media_type"),
        length(col("payload")).as("n_bytes"),
        sha2(col("payload"), 256).as("payload_sha"),
        col("width"), col("height"), col("n_frames"))
      .orderBy("doc_id")

  /** Batch feature extraction via typed mapPartitions (stub decode). */
  def mediaFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    mediaTable(s, dir).as[MediaRecord]
      .mapPartitions(_.map { r =>
        val f = decodeFeatures(r.payload)
        // histogram-weighted approximate byte mean: weight = bin midpoint
        val binW = 256 / FeatureDim
        MediaFeatures(r.doc_id, r.media_type, r.payload.length,
          f.zipWithIndex.map { case (v, i) => v * (i * binW + binW / 2) }.sum,
          f)
      })
      .toDF()
      .orderBy("doc_id")
  }

  /** Frame sampling for the video modality: one output row per sampled
    * frame (flatMap — the explode-shaped decode). */
  def videoFrames(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    mediaTable(s, dir).where(col("media_type") === "video").as[MediaRecord]
      .flatMap(r => sampleFrames(r.doc_id, r.payload, math.min(r.n_frames, 4)))
      .toDF()
      .orderBy("doc_id", "frame_idx")
  }

  /** Per-modality rollup over extracted features — decode feeding a
    * relational aggregate, the end-to-end pipeline shape. */
  def modalityStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    mediaTable(s, dir).as[MediaRecord]
      .mapPartitions(_.map(r =>
        (r.media_type, r.payload.length, decodeFeatures(r.payload)(0))))
      .toDF("media_type", "n_bytes", "f0")
      .groupBy("media_type")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_bytes").cast("long")).as("total_bytes"),
        min(col("f0")).as("min_f0"), max(col("f0")).as("max_f0"))
      .orderBy("media_type")
  }

  // ------------------------------------------------------------------
  // Declared queries: metadata path is fully SQL-expressible (oracle);
  // decode paths use the stub and get the rows-only check.
  // ------------------------------------------------------------------

  val defs: Seq[QueryDef] = Seq(
    QueryDef.sql("mm_metadata",
      """SELECT doc_id,
        |  (['image', 'audio', 'video'])[CAST(doc_id % 3 + 1 AS INT)] AS media_type,
        |  CAST(octet_length(encode(text)) AS INT) AS n_bytes,
        |  sha256(text) AS payload_sha,
        |  CAST(64 + (doc_id % 8) * 32 AS INT) AS width,
        |  CAST(64 + (doc_id % 4) * 32 AS INT) AS height,
        |  CAST(1 + (doc_id % 16) AS INT) AS n_frames
        |FROM documents ORDER BY doc_id""".stripMargin)(mediaMetadata),
    QueryDef.rowsOnly("mm_features")(mediaFeatures),
    QueryDef.rowsOnly("mm_video_frames")(videoFrames),
    QueryDef.rowsOnly("mm_modality_stats")(modalityStats)
  )
}
