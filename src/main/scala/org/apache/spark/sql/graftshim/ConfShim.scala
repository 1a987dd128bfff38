package org.apache.spark.sql.graftshim

import org.apache.spark.sql.SparkSession

/** Read-only access to session SQL conf values whose typed getters sit
  * behind `private[sql]` (`SparkSession.sessionState`). Used by the
  * broadcast size-gates: hinting `broadcast(df)` is only safe when the
  * optimizer's size estimate for `df` fits the session's configured
  * broadcast threshold — the same number Spark's own join selection
  * compares against.
  */
object ConfShim {
  def autoBroadcastJoinThreshold(spark: SparkSession): Long =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.conf.autoBroadcastJoinThreshold
}
