package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet fixtures (TESTDATA.md).
  *
  * The reference engine's "collection" is a MinIO key prefix
  * (reference main.go:186-189); here every dataset is columnar parquet and
  * a collection maps to a partition/filter column, giving partition-pruned
  * scans at 100 TB instead of object listings.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")
}
