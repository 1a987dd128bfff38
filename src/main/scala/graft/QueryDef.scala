package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared engine capability: a Spark implementation plus (when
  * SQL-expressible) an equivalent DuckDB oracle query over the same
  * parquet tables. The driver hash-compares the two at sf0.01
  * (SURVEY.md §5), so `fn`'s output schema (names, order, types) must
  * match the oracle's exactly and row order must be fully deterministic.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def sql(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, Some(oracle))
  def rowsOnly(name: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, None)
}
