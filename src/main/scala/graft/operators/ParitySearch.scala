package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}
import graft.functions.VectorFunctions.{vecSql, dotSeqSql}
import graft.functions.{VectorExpressions => V}

/** Field-faithful reproduction of the reference's /search response
  * (SearchResult, main.go:68-75) over its nested document model —
  * including the documented quirks:
  *
  *   - Q1: score = dot(q/||q||, v), stored vector NOT normalized
  *   - Q3: `embedding_id` and `collection_name` BOTH echo the document's
  *     metadata.name (main.go:248,253) — neither is the storage id or the
  *     actual collection
  *   - Q6: `position` is the 1-based chunk index within its document
  *     (main.go:250), not a result rank
  *   - D2: always sorted with deterministic tie-breaks (strict superset
  *     of the reference's unsorted-under-k behavior, Q2)
  *
  * The fixtures have no nested documents, so the parity path first BUILDS
  * them: documents x embeddings joined on id, grouped into multi-chunk
  * docs (doc_id % 50 -> 50 parent documents of ~10 chunks each, sf0.01),
  * then searches through the full nested pipeline: posexplode ->
  * codegen'd dot product -> TakeOrderedAndProject. This exercises the
  * real ingest shape (O3/O4) end-to-end, not a pre-flattened shortcut.
  */
object ParitySearch {

  val Parents = 50

  /** Assemble reference-shaped nested documents from the flat fixtures.
    * Chunks are ordered by chunk doc_id inside each parent (sort_array on
    * a struct whose first field is the id — deterministic). */
  def nestedDocs(documents: DataFrame, embeddings: DataFrame): DataFrame = {
    val joined = documents.join(embeddings,
        documents("doc_id") === embeddings("vec_id"))
      .withColumn("parent_id", col("doc_id") % Parents)
    joined.groupBy(col("parent_id"))
      .agg(sort_array(collect_list(struct(
        col("doc_id"), col("text"), col("source"),
        col("embedding")))).as("chunks"))
      .select(col("parent_id"),
        concat(lit("doc_"), col("parent_id")).as("doc_name"),
        col("chunks"))
  }

  /** The reference read path over nested docs: explode -> score -> topK,
    * emitting SearchResult columns with Q3/Q6 aliasing. */
  def search(nested: DataFrame, k: Int): DataFrame =
    nested
      .select(col("doc_name"), posexplode(col("chunks")).as(Seq("pos", "chunk")))
      .select(
        col("doc_name").as("embedding_id"), // Q3: doc name, not an id
        VectorSearch.scoreRef(col("chunk.embedding")).as("similarity"),
        (col("pos") + 1).as("position"), // Q6: 1-based chunk index
        col("chunk.source").as("meta_source"),
        concat(lit("chunk_"), col("chunk.doc_id")).as("meta_name"),
        col("chunk.text").as("text"),
        col("doc_name").as("collection_name")) // Q3 again
      .orderBy(col("similarity").desc, col("meta_name")) // D2
      .limit(k)

  val defs: Seq[QueryDef] = Seq(
    QueryDef.sql("vs_parity_search", {
      val qn = vecSql(VectorSearch.QueryNorm)
      s"""WITH q AS (SELECT $qn AS v),
         |chunks AS (
         |  SELECT d.doc_id, d.text, d.source,
         |    CAST(e.embedding AS DOUBLE[]) AS vec,
         |    d.doc_id % ${Parents} AS parent_id,
         |    CAST(row_number() OVER (PARTITION BY d.doc_id % ${Parents}
         |      ORDER BY d.doc_id) AS INT) AS position
         |  FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id)
         |SELECT 'doc_' || parent_id AS embedding_id,
         |  ${dotSeqSql("q.v", "vec", VectorSearch.Dim)} AS similarity,
         |  position,
         |  source AS meta_source,
         |  'chunk_' || doc_id AS meta_name,
         |  text,
         |  'doc_' || parent_id AS collection_name
         |FROM chunks, q
         |ORDER BY similarity DESC, meta_name LIMIT 10""".stripMargin
    }) { (s, dir) =>
      search(nestedDocs(Tables(s, dir, "documents"),
        Tables(s, dir, "embeddings")), 10)
    }
  )
}
