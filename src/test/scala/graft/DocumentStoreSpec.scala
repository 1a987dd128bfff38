package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.DocumentStore

class DocumentStoreSpec extends SparkSpecBase {

  private def tmp(): String =
    Files.createTempDirectory("graft_store").toString

  private val storeJson =
    """{"collection_name":"colA","documents":[
      |{"text":"doc one","metadata":{"source":"s1","name":"d1"},
      | "chunks":[
      |  {"text":"c1","embedding":{"vector":[1.0,0.0]},"metadata":{"source":"cs1","name":"cn1"},"semantic_score":0.5},
      |  {"text":"c2","embedding":{"vector":[0.0,1.0]},"metadata":{"source":"cs2","name":"cn2"},"semantic_score":0.9}]}
      |]}""".stripMargin.replaceAll("\n", "")

  test("JSON ingest -> flatten: 1-based chunk_idx, fields mapped (O3/O4, Q6)") {
    val dir = tmp()
    Files.writeString(java.nio.file.Paths.get(dir, "req.json"), storeJson)
    val docs = DocumentStore.readStoreRequests(spark, dir)
    val chunks = DocumentStore.flattenChunks(docs)
      .orderBy("chunk_idx").collect()
    assert(chunks.length == 2)
    val first = chunks.head
    assert(first.getAs[String]("collection") == "colA")
    assert(first.getAs[String]("doc_name") == "d1")
    assert(first.getAs[Int]("chunk_idx") == 1) // 1-based (Q6)
    assert(chunks(1).getAs[Int]("chunk_idx") == 2)
    assert(first.getAs[String]("text") == "c1")
    assert(first.getAs[scala.collection.Seq[Double]]("embedding").toSeq
      == Seq(1.0, 0.0))
    // semantic_score kept in schema but dead in ranking (Q4)
    assert(chunks(1).getAs[Double]("semantic_score") == 0.9)
  }

  test("store/read/delete collection lifecycle (O10/O11, D3)") {
    val dir = tmp()
    Files.writeString(java.nio.file.Paths.get(dir, "req.json"), storeJson)
    def freshChunks() = DocumentStore.flattenChunks(
      DocumentStore.readStoreRequests(spark, dir))
    val table = tmp() + "/table"
    DocumentStore.store(freshChunks(), table)
    // a second store request is a new plan => new uuid seed, new identity
    DocumentStore.store(
      freshChunks().withColumn("collection", lit("colB")), table)

    // synchronous read-after-write (D3 fixes the reference's async loss)
    assert(DocumentStore.read(spark, table).count() == 4)
    assert(DocumentStore.read(spark, table, Some("colA")).count() == 2)

    // same doc stored twice gets two identities (reference main.go:330)
    val ids = DocumentStore.read(spark, table)
      .select("doc_id").distinct().count()
    assert(ids == 2)

    DocumentStore.deleteCollection(spark, table, "colA")
    assert(DocumentStore.read(spark, table).count() == 2)
    assert(DocumentStore.read(spark, table, Some("colA")).count() == 0)
  }

  test("collection filter prunes partitions (scan posture at scale)") {
    val dir = tmp()
    Files.writeString(java.nio.file.Paths.get(dir, "req.json"), storeJson)
    val chunks = DocumentStore.flattenChunks(
      DocumentStore.readStoreRequests(spark, dir))
    val table = tmp() + "/table"
    DocumentStore.store(chunks, table)
    DocumentStore.store(chunks.withColumn("collection", lit("colB")), table)
    val plan = DocumentStore.read(spark, table, Some("colB"))
      .queryExecution.executedPlan.toString
    // partition filter must reach the scan, not a post-scan Filter
    assert(plan.contains("PartitionFilters") &&
      plan.contains("collection"), plan)
  }

  test("compaction collapses append-per-request files, preserves rows") {
    import org.apache.spark.sql.functions._
    val table = java.nio.file.Files
      .createTempDirectory("graft_compact").toString
    // simulate the reference's append-per-store pattern: many tiny files
    val base = spark.range(10).select(
      lit("c1").as("collection"), col("id").cast("string").as("doc_id"),
      lit("n").as("doc_name"), lit("s").as("doc_source"),
      lit(1).as("chunk_idx"), lit("t").as("text"),
      array(lit(1.0)).as("embedding"), lit("ms").as("meta_source"),
      lit("mn").as("meta_name"), lit(0.5).as("semantic_score"))
    (0 until 5).foreach(_ => DocumentStore.store(base, table))
    def files(c: String) = {
      val d = new java.io.File(s"$table/collection=$c")
      d.listFiles().count(_.getName.endsWith(".parquet"))
    }
    DocumentStore.store(base.withColumn("collection", lit("c2")), table)
    val before = DocumentStore.read(spark, table, Some("c1")).collect()
      .map(_.getAs[String]("doc_id")).sorted
    assert(files("c1") >= 5)
    DocumentStore.compactCollection(spark, table, "c1")
    assert(files("c1") == 1)
    val after = DocumentStore.read(spark, table, Some("c1")).collect()
      .map(_.getAs[String]("doc_id")).sorted
    assert(after.toSeq == before.toSeq)
    // the other collection's files were not touched
    assert(DocumentStore.read(spark, table, Some("c2")).count() == 10)
  }
}
