package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Every implemented operator registers a [[QueryDef]] in its module's
  * `defs`; this object just aggregates them. */
object SparkEntry {

  private def allDefs: Seq[QueryDef] =
    VectorSearch.defs ++ ParitySearch.defs ++ TextAnalysis.defs ++
      Dedup.defs ++ Relational.defs ++ Events.defs ++ Ann.defs ++
      Multimodal.defs ++ MlIndex.defs ++ Pipeline.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    VectorSearch.topK(Tables(spark, "/root/testdata/sf0.001", "embeddings"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(d => d.name -> d.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(d => d.oracle.map(o => d.name -> o)).toMap
}
