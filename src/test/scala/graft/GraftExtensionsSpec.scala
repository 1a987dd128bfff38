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

  test("topk_agg and marker_count work from SQL") {
    val rows = spark.sql(
      """SELECT grp, topk_agg(score, id, 2) AS top
        |FROM VALUES (0, 1.0d, 10L), (0, 3.0d, 11L), (0, 2.0d, 12L),
        |            (1, 5.0d, 20L), (1, 5.0d, 21L)
        |  AS t(grp, score, id)
        |GROUP BY grp ORDER BY grp""".stripMargin).collect()
    val g0 = rows(0).getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("top")
    assert(g0.map(r => (r.getDouble(0), r.getLong(1))) == Seq((3.0, 11L), (2.0, 12L)))
    val g1 = rows(1).getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("top")
    assert(g1.map(r => (r.getDouble(0), r.getLong(1))) == Seq((5.0, 20L), (5.0, 21L)))
    val mc = spark.sql(
      "SELECT marker_count(array('the','fast','dog'), 'the,a,of') c").head
    assert(mc.getLong(0) == 1L)
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

  test("repetition_signals from SQL == kernel semantics") {
    val st = spark.sql(
      """SELECT repetition_signals(
        |  array('a', 'a', 'b', 'a', 'b')) AS r""".stripMargin)
      .head.getStruct(0)
    // multiplicities: a=3, b=2 -> top 3; bigrams (a a)(a b)(b a)(a b)
    // -> 4 total, 3 distinct
    assert(st.getLong(0) == 3L && st.getLong(1) == 4L && st.getLong(2) == 3L)
  }

  test("non-literal n/k arguments are rejected at plan time, not NPE") {
    Seq(
      "SELECT shingle_hashes(array('a','b'), CAST(id AS INT)) FROM range(3)",
      "SELECT minhash_sig(array(1L), CAST(id AS INT)) FROM range(3)",
      "SELECT marker_count(array('a'), CAST(id AS STRING)) FROM range(3)",
      "SELECT topk_agg(1.0d, id, CAST(id AS INT)) FROM range(3)"
    ).foreach { q =>
      val e = intercept[Exception](spark.sql(q).collect())
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains("must be a literal")), s"query: $q, got $e")
    }
  }
}
