package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}
import graft.functions.TextFunctions._

/** Training-data pipeline composition operators: deterministic dataset
  * splitting, stratified sampling, and the filter→dedup funnel every
  * LLM corpus build runs. The reference engine has nothing upstream of
  * storage (SURVEY.md §2.2); these are north-star extensions composing
  * the text/dedup primitives into end-to-end curation shapes.
  *
  * Determinism note: splits and samples key on `doc_id % k`, not on
  * `rand()` or Spark's `sampleBy` — reproducible across engines, runs
  * and partitionings, which is what a training pipeline needs anyway
  * (resumable, auditable membership). At 100 TB all three are one scan
  * + one hash aggregate (or one window) — no extra shuffles.
  */
object Pipeline {

  /** Deterministic train/val/test split (80/10/10 by doc_id residue)
    * with per-split profile. One scan, one partial+final aggregate. */
  def trainTestSplit(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .select(col("doc_id"), col("lang"),
        length(col("text")).cast("long").as("n_chars"),
        when(col("doc_id") % 10 < 8, "train")
          .when(col("doc_id") % 10 === 8, "val")
          .otherwise("test").as("split"))
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("lang")).as("n_langs"),
        sum(col("n_chars")).as("sum_chars"),
        min(col("doc_id")).as("min_doc_id"),
        max(col("doc_id")).as("max_doc_id"))
      .orderBy("split")

  /** Deterministic stratified sample audit: per stratum (lang), the
    * population size, the mod-based sample size, and the realized rate.
    * The sample predicate (`doc_id % 7 = 0`) is a pure row property, so
    * membership is stable under any repartitioning — unlike rand()-based
    * sampleBy, whose strata drift run to run. */
  def stratifiedSample(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_total"),
        count(when(col("doc_id") % 7 === 0, lit(1))).as("n_sampled"))
      .select(col("lang"), col("n_total"), col("n_sampled"),
        (col("n_sampled").cast("double") / col("n_total").cast("double"))
          .as("sample_rate"))
      .orderBy("lang")

  /** The corpus-curation funnel: quality gate (length + stopword
    * density) then exact dedup, keeping one canonical doc per content
    * hash. Composes the fused word-stats/marker kernels with the
    * dedup window — one scan, one window shuffle on the content hash. */
  def qualityFilter(s: SparkSession, dir: String,
      minWords: Long = 30L, minStopRatio: Double = 0.05): DataFrame = {
    val ws = words(col("text"))
    val base = Tables(s, dir, "documents").select(
      col("doc_id"), col("lang"),
      graft.functions.TextHashExpressions.wordStats(ws)
        .getField("n_words").as("n_words"),
      graft.functions.TextHashExpressions.markerCount(ws, Stopwords("en"))
        .as("n_stopwords"),
      sha2(col("text"), 256).as("content_hash"))
    val w = Window.partitionBy(col("content_hash"))
    base
      .withColumn("keeper", col("doc_id") === min(col("doc_id")).over(w))
      .withColumn("stop_ratio",
        when(col("n_words") > 0,
          col("n_stopwords").cast("double") / col("n_words").cast("double")))
      .where(col("n_words") >= minWords &&
        col("stop_ratio") >= minStopRatio && col("keeper"))
      .select(col("doc_id"), col("lang"), col("n_words"),
        col("n_stopwords"), col("stop_ratio"))
      .orderBy("doc_id")
  }

  // ------------------------------------------------------------------
  // oracles
  // ------------------------------------------------------------------

  private val W = wordsSql("text")

  val defs: Seq[QueryDef] = Seq(
    QueryDef.sql("pl_train_test_split",
      """WITH s AS (
        |  SELECT doc_id, lang, CAST(length(text) AS BIGINT) AS n_chars,
        |    CASE WHEN doc_id % 10 < 8 THEN 'train'
        |         WHEN doc_id % 10 = 8 THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM documents)
        |SELECT split, count(*) AS n_docs,
        |  count(DISTINCT lang) AS n_langs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id
        |FROM s GROUP BY split ORDER BY split""".stripMargin)(trainTestSplit),

    QueryDef.sql("pl_stratified_sample",
      """SELECT lang, count(*) AS n_total,
        |  count(*) FILTER (doc_id % 7 = 0) AS n_sampled,
        |  CAST(count(*) FILTER (doc_id % 7 = 0) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE) AS sample_rate
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin)(
      stratifiedSample),

    QueryDef.sql("pl_quality_filter", {
      val stops = markerCountSql(W, Stopwords("en"))
      s"""WITH q AS (
         |  SELECT doc_id, lang,
         |    CAST(len($W) AS BIGINT) AS n_words,
         |    $stops AS n_stopwords,
         |    sha256(text) AS h
         |  FROM documents),
         |k AS (
         |  SELECT *, doc_id = min(doc_id) OVER (PARTITION BY h) AS keeper,
         |    CASE WHEN n_words > 0 THEN
         |      CAST(n_stopwords AS DOUBLE) / CAST(n_words AS DOUBLE) END
         |      AS stop_ratio
         |  FROM q)
         |SELECT doc_id, lang, n_words, n_stopwords, stop_ratio
         |FROM k
         |WHERE n_words >= 30 AND stop_ratio >= 0.05E0 AND keeper
         |ORDER BY doc_id""".stripMargin
    })((s, dir) => qualityFilter(s, dir))
  )
}
