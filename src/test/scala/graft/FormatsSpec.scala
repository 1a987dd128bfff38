package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** File-format breadth: the chunk-table layout must round-trip through
  * every format a pipeline realistically meets (parquet is the native
  * store; ORC for interop, JSON for the reference's wire format, CSV
  * for flat exports). Arrays don't fit CSV — the flat projection goes
  * there. */
class FormatsSpec extends SparkSpecBase {

  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet")
    .orderBy("doc_id").limit(100).cache()

  private def roundTrip(fmt: String): Unit = {
    val dir = Files.createTempDirectory(s"graft_$fmt").toString
    docs.write.mode("overwrite").format(fmt).save(dir)
    val back = fmt match {
      case "csv" => spark.read.format(fmt).option("header", "true")
        .schema(docs.schema).load(dir)
      case _ => spark.read.format(fmt)
        .schema(docs.schema).load(dir)
    }
    val a = docs.collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
    val b = back.collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
    assert(a.toSeq == b.toSeq, s"$fmt round-trip mismatch")
  }

  test("ORC round-trip preserves the documents table") { roundTrip("orc") }
  test("JSON round-trip preserves the documents table") { roundTrip("json") }

  test("CSV round-trip preserves the flat projection") {
    val dir = Files.createTempDirectory("graft_csv").toString
    docs.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.option("header", "true").schema(docs.schema).csv(dir)
    assert(back.count() == docs.count())
    assert(back.agg(sum("n_chars")).head.getLong(0) ==
      docs.agg(sum("n_chars")).head.getLong(0))
  }

  test("embeddings (nested arrays) survive ORC") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet").limit(50)
    val dir = Files.createTempDirectory("graft_orc_emb").toString
    emb.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.count() == 50)
    assert(back.schema("embedding").dataType == emb.schema("embedding").dataType)
  }
}
