package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The codegen expressions must be reachable from plain SQL via
  * SparkSessionExtensions (spark.sql.extensions=graft.GraftExtensions). */
class GraftExtensionsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val base = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // same JVM-wide session as the other suites — install into it
    GraftExtensions.functions.foreach { case (id, inf, builder) =>
      base.sessionState.functionRegistry
        .registerFunction(id, inf, builder)
    }
    base
  }

  test("vec_dot from SQL == driver fold") {
    val r = spark.sql(
      "SELECT vec_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) v")
      .head.getDouble(0)
    assert(r == ((0.0 + 1 * 4) + 2 * 5) + 3 * 6)
  }

  test("vec_dot null semantics from SQL: dim mismatch -> null") {
    val r = spark.sql(
      "SELECT vec_dot(array(1.0d, 2.0d), array(1.0d)) v").head
    assert(r.isNullAt(0))
  }

  test("shingle/minhash/simhash/word_stats compose in one SQL query") {
    val row = spark.sql(
      """SELECT
        |  shingle_hashes(ws, 3) AS sh,
        |  simhash32(shingle_hashes(ws, 1)) AS sim,
        |  minhash_sig(shingle_hashes(ws, 3), 4) AS sig,
        |  word_stats(ws) AS st
        |FROM (SELECT array('the', 'quick', 'brown', 'fox', 'the') AS ws)
        |""".stripMargin).head
    assert(row.getAs[scala.collection.Seq[Long]]("sh").length == 3)
    assert(row.getAs[scala.collection.Seq[Long]]("sig").length == 4)
    val st = row.getStruct(3)
    assert(st.getLong(0) == 5 && st.getLong(1) == 4)
    // matches the Column-API formulation exactly
    import org.apache.spark.sql.functions._
    val viaColumns = spark.range(1)
      .select(graft.functions.TextHashExpressions.simhash32(
        graft.functions.TextHashExpressions.wordHashes(
          array(Seq("the", "quick", "brown", "fox", "the").map(lit): _*))))
      .head.getLong(0)
    assert(row.getLong(1) == viaColumns)
  }
}
