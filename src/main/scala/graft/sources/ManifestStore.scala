package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Object-store-safe document store: GENERATION directories committed
  * by an append-only MANIFEST of pointer files — the minimal
  * Delta/Iceberg-style commit protocol, sized to this engine's needs.
  *
  * [[DocumentStore]]'s compaction swaps partition directories with two
  * renames, which is correct where rename is atomic (HDFS, POSIX) but
  * NOT on the object stores the reference actually runs against (MinIO,
  * reference main.go:131-143): S3-style rename is copy+delete, so the
  * "briefly absent partition" window and the rename-based recovery
  * contract do not carry over. This layout removes the dependence on
  * rename entirely:
  *
  *   - data: `table/collection=<c>/gen=<NNNNNN>/part-*.parquet` —
  *     generations are immutable once published; rewrites (compaction)
  *     build a NEW generation next to the old one;
  *   - commit: `table/_manifest/<c>/ptr-<NNNNNN>` — tiny files, created
  *     once, NEVER overwritten or renamed. The highest-sequence pointer
  *     with valid content ("gen-NNNNNN" or "tombstone") decides the
  *     collection's current generation. Publishing a commit is one
  *     single-file create — the one primitive every object store makes
  *     atomic (a PUT is visible in full or not at all).
  *
  * Crash matrix (why no recovery sweep is needed, unlike the rename
  * protocol's `recoverAll`):
  *   - crash while writing the new generation → pointer unmoved,
  *     readers never saw the partial dir; the next attempt rewrites the
  *     same generation number with `SaveMode.Overwrite`;
  *   - crash while creating the pointer file → a truncated/empty
  *     pointer is INVALID content and is skipped; resolution falls back
  *     to the previous pointer (old generation stays live);
  *   - crash after the pointer lands → old generation is unreferenced
  *     garbage, removed by [[vacuum]].
  * A reader holding the old generation keeps reading it throughout a
  * concurrent compaction — there is no absent window at all. Like any
  * snapshot store, [[vacuum]] must only run once in-flight readers of
  * superseded generations have drained (the Delta VACUUM retention
  * contract).
  *
  * Concurrency: one writer per collection (the reference serializes
  * with a per-collection mutex, main.go O12; SURVEY §2.3 replaces that
  * with immutable snapshots). Racing writers are detected, not
  * corrupted: both would claim the same pointer sequence, and
  * `create(..., overwrite=false)` lets exactly one commit win.
  */
object ManifestStore {

  private val PtrPrefix = "ptr-"
  private val Tombstone = "tombstone"

  private def fsOf(spark: SparkSession, tablePath: String): FileSystem =
    new Path(tablePath).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestDir(tablePath: String, c: String): Path =
    new Path(s"$tablePath/_manifest/$c")

  private def collectionDir(tablePath: String, c: String): Path =
    new Path(s"$tablePath/collection=$c")

  private def genName(gen: Long): String = f"gen=$gen%06d"

  private def genDir(tablePath: String, c: String, gen: Long): Path =
    new Path(collectionDir(tablePath, c), genName(gen))

  /** Pointer-resolution snapshot: the live generation (None = absent or
    * tombstoned), the next free pointer sequence, and the next unused
    * generation number (one past anything ever published, so a crashed
    * generation write is safely re-targeted). */
  private[sources] final case class Resolved(
      currentGen: Option[Long], nextPtrSeq: Long, nextGen: Long)

  /** Best-effort small-file read: None for missing, unreadable, or
    * empty files (all crash artifacts of an interrupted create). */
  private def readPtr(fs: FileSystem, p: Path): Option[String] =
    try {
      val in = fs.open(p)
      try {
        val buf = new Array[Byte](64)
        val n = in.read(buf)
        if (n <= 0) None else Some(new String(buf, 0, n, "UTF-8").trim)
      } finally in.close()
    } catch { case _: java.io.IOException => None }

  private def parseGen(content: String): Option[Long] =
    if (content.startsWith("gen-")) content.stripPrefix("gen-").toLongOption
    else None

  private[sources] def resolve(fs: FileSystem, tablePath: String,
      c: String): Resolved = {
    val dir = manifestDir(tablePath, c)
    if (!fs.exists(dir)) return Resolved(None, 1L, 1L)
    val ptrs = fs.listStatus(dir).toSeq.map(_.getPath)
      .filter(_.getName.startsWith(PtrPrefix))
      .flatMap(p => p.getName.stripPrefix(PtrPrefix).toLongOption.map(_ -> p))
      .sortBy(-_._1)
    val contents = ptrs.map { case (_, p) => readPtr(fs, p) }
    // newest pointer with VALID content decides; invalid ones (crash
    // mid-create) are skipped — the previous commit stays live
    val current = contents.iterator.collectFirst {
      case Some(Tombstone) => None
      case Some(s) if parseGen(s).isDefined => parseGen(s)
    }.flatten
    val maxSeq = ptrs.headOption.map(_._1).getOrElse(0L)
    val maxGen = contents.flatten.flatMap(parseGen).maxOption.getOrElse(0L)
    Resolved(current, maxSeq + 1, maxGen + 1)
  }

  /** Publish one commit: create-once, no overwrite — the atomicity
    * primitive (object-store PUT / HDFS create), and the optimistic
    * lock against a racing writer on the same sequence. */
  private def publish(fs: FileSystem, tablePath: String, c: String,
      seq: Long, content: String): Unit = {
    val dir = manifestDir(tablePath, c)
    fs.mkdirs(dir)
    val p = new Path(dir, f"$PtrPrefix$seq%06d")
    val out = fs.create(p, false)
    try out.write(content.getBytes("UTF-8")) finally out.close()
  }

  /** Collections with a manifest (live or tombstoned). */
  def listCollections(spark: SparkSession, tablePath: String): Seq[String] = {
    val fs = fsOf(spark, tablePath)
    val base = new Path(s"$tablePath/_manifest")
    if (!fs.exists(base)) Seq.empty
    else fs.listStatus(base).toSeq.filter(_.isDirectory)
      .map(_.getPath.getName).sorted
  }

  /** Current generation of a collection, if live. */
  def currentGen(spark: SparkSession, tablePath: String,
      c: String): Option[Long] =
    resolve(fsOf(spark, tablePath), tablePath, c).currentGen

  /** Append `chunks` (one collection per call, the reference's /store
    * shape) — into the live generation, or as the first generation of a
    * new/tombstoned collection (data lands fully before the pointer
    * publishes it, so a new collection appears atomically). */
  def store(chunks: DataFrame, tablePath: String, collection: String): Unit = {
    val spark = chunks.sparkSession
    val fs = fsOf(spark, tablePath)
    val r = resolve(fs, tablePath, collection)
    val data = chunks.drop("collection")
    r.currentGen match {
      case Some(g) =>
        data.write.mode(SaveMode.Append)
          .parquet(genDir(tablePath, collection, g).toString)
      case None =>
        val g = r.nextGen
        data.write.mode(SaveMode.Overwrite)
          .parquet(genDir(tablePath, collection, g).toString)
        publish(fs, tablePath, collection, r.nextPtrSeq, f"gen-$g%06d")
    }
  }

  /** Read schema = the flat store's chunk table + the `gen` partition
    * column (dropped after the scan). */
  private val genReadSchema: StructType = StructType(
    DocumentStore.chunkTableSchema.fields.toSeq :+
      StructField("gen", StringType))

  /** Read the current snapshot: each collection's pointer names exactly
    * one generation directory; the scan targets those directories only
    * (pruned listing — superseded generations are never even listed).
    * Absent/tombstoned collections read as a defined empty frame (Q7).
    */
  def read(spark: SparkSession, tablePath: String,
      collection: Option[String] = None): DataFrame = {
    val fs = fsOf(spark, tablePath)
    val colls = collection.map(Seq(_))
      .getOrElse(listCollections(spark, tablePath))
    val paths = colls.flatMap { c =>
      resolve(fs, tablePath, c).currentGen
        .map(g => genDir(tablePath, c, g).toString)
    }
    if (paths.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], DocumentStore.chunkTableSchema)
    else
      spark.read.option("basePath", tablePath).schema(genReadSchema)
        .parquet(paths: _*)
        .select(DocumentStore.chunkTableSchema.fieldNames.toSeq.map(col): _*)
  }

  /** Compact the live generation into `targetFiles` files as a NEW
    * generation, committed by pointer — concurrent readers of the old
    * generation are undisturbed (its files stay until [[vacuum]]), and
    * there is no instant at which the collection reads absent. */
  def compactCollection(spark: SparkSession, tablePath: String,
      c: String, targetFiles: Int = 1): Unit = {
    val fs = fsOf(spark, tablePath)
    val r = resolve(fs, tablePath, c)
    r.currentGen.foreach { _ =>
      val next = r.nextGen
      read(spark, tablePath, Some(c))
        .drop("collection")
        .repartition(targetFiles)
        .write.mode(SaveMode.Overwrite)
        .parquet(genDir(tablePath, c, next).toString)
      publish(fs, tablePath, c, r.nextPtrSeq, f"gen-$next%06d")
    }
  }

  /** Delete = publish a tombstone pointer (O11). Pure metadata — the
    * data outlives the pointer until [[vacuum]], so in-flight readers
    * finish; new readers see a defined empty collection immediately. */
  def deleteCollection(spark: SparkSession, tablePath: String,
      c: String): Unit = {
    val fs = fsOf(spark, tablePath)
    val r = resolve(fs, tablePath, c)
    if (r.currentGen.isDefined)
      publish(fs, tablePath, c, r.nextPtrSeq, Tombstone)
  }

  /** Garbage-collect everything no pointer references: superseded and
    * orphaned (crashed-write) generations, and the data of tombstoned
    * collections. Returns the removed paths. Run only after readers of
    * superseded generations have drained (snapshot-retention contract).
    */
  def vacuum(spark: SparkSession, tablePath: String): Seq[String] = {
    val fs = fsOf(spark, tablePath)
    val base = new Path(tablePath)
    if (!fs.exists(base)) return Seq.empty
    val dataCols = fs.listStatus(base).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("collection="))
      .map(_.stripPrefix("collection="))
    val removed = Seq.newBuilder[String]
    (dataCols ++ listCollections(spark, tablePath)).distinct.foreach { c =>
      val cdir = collectionDir(tablePath, c)
      resolve(fs, tablePath, c).currentGen match {
        case Some(g) =>
          val keep = genName(g)
          if (fs.exists(cdir))
            fs.listStatus(cdir).toSeq.map(_.getPath)
              .filter(p => p.getName.startsWith("gen=") && p.getName != keep)
              .foreach { p => fs.delete(p, true); removed += p.toString }
        case None =>
          if (fs.exists(cdir)) {
            fs.delete(cdir, true)
            removed += cdir.toString
          }
      }
    }
    removed.result()
  }
}
