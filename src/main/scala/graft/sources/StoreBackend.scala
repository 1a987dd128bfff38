package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** A pluggable storage backend behind the [[graft.Graft]] facade: both
  * backends ingest the same flattened chunk table and read back the
  * identical schema ([[DocumentStore.chunkTableSchema]]), so every
  * search route is backend-agnostic.
  *
  *   - [[ManifestBackend]] (the facade default) — [[ManifestStore]]'s
  *     immutable segments + pointer commits. Safe on object stores
  *     (never renames, never mutates published files), which is where
  *     the reference actually keeps its documents (MinIO, reference
  *     main.go:131-143); also correct on HDFS/POSIX.
  *   - [[FlatBackend]] — [[DocumentStore]]'s plain
  *     collection-partitioned parquet: zero metadata besides the
  *     directory tree, readable by any parquet tool at the cost of a
  *     rename-based compaction contract that holds only where rename
  *     is atomic (HDFS, POSIX — NOT S3-class stores).
  */
trait StoreBackend {

  /** Ingest flattened chunk rows (any number of collections). */
  def store(chunks: DataFrame, tablePath: String): Unit

  /** Read the chunk table: all collections (None) or a named subset,
    * pruned. Absent/deleted collections read as defined empties (Q7). */
  def read(spark: SparkSession, tablePath: String,
      collections: Option[Seq[String]] = None): DataFrame

  /** Drop one collection (O11). */
  def deleteCollection(spark: SparkSession, tablePath: String,
      collection: String): Unit
}

/** Collection-partitioned flat parquet ([[DocumentStore]]). */
object FlatBackend extends StoreBackend {
  def store(chunks: DataFrame, tablePath: String): Unit =
    DocumentStore.store(chunks, tablePath)

  def read(spark: SparkSession, tablePath: String,
      collections: Option[Seq[String]] = None): DataFrame = {
    val all = DocumentStore.read(spark, tablePath)
    // the isin filter on the partition column IS the pruning — Catalyst
    // turns it into partition-directory pruning at the scan
    collections.fold(all)(cs => all.where(col("collection").isin(cs: _*)))
  }

  def deleteCollection(spark: SparkSession, tablePath: String,
      collection: String): Unit =
    DocumentStore.deleteCollection(spark, tablePath, collection)
}

/** Segment + pointer-manifest layout ([[ManifestStore]]). */
object ManifestBackend extends StoreBackend {
  def store(chunks: DataFrame, tablePath: String): Unit = {
    // one manifest commit per collection (the reference's /store is
    // one-collection-per-request, main.go:25-28, so this loop is
    // almost always a single iteration); the distinct is bounded by
    // collections-per-ingest — the same driver-side shape as the
    // streaming ingest's per-micro-batch collection list. persist:
    // the ingest pipeline (JSON read + flatten) feeds the collection
    // listing plus one filtered write per collection — uncached that
    // is 1+N full input scans. Writes are synchronous, so the frame
    // is released before return.
    val cached = chunks.persist()
    try {
      val colls = cached.select(col("collection")).distinct()
        .collect().map(_.getString(0))
      colls.foreach { c =>
        ManifestStore.store(cached.where(col("collection") === c),
          tablePath, c)
      }
    } finally cached.unpersist()
  }

  def read(spark: SparkSession, tablePath: String,
      collections: Option[Seq[String]] = None): DataFrame =
    collections.fold(ManifestStore.read(spark, tablePath))(cs =>
      ManifestStore.readMany(spark, tablePath, cs))

  def deleteCollection(spark: SparkSession, tablePath: String,
      collection: String): Unit =
    ManifestStore.deleteCollection(spark, tablePath, collection)
}
