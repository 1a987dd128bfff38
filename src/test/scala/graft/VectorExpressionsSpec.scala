package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._
import graft.functions.{VectorExpressions => V}

class VectorExpressionsSpec extends SparkSpecBase {
  private def emb = Tables(spark, sf, "embeddings")

  test("native dot/cosine/l2 are bitwise-identical to the HOF fold") {
    val q = vecLit(normalize(syntheticQuery(64)))
    val d = toDouble(col("embedding"))
    val diff = emb.select(
        (V.dot(q, col("embedding")) =!= dotSeq(q, d)).as("d1"),
        (V.cosine(q, col("embedding")) =!= cosine(q, d)).as("d2"),
        (V.l2Dist(q, col("embedding")) =!= l2Dist(q, d)).as("d3"))
      .where(col("d1") || col("d2") || col("d3"))
    assert(diff.count() == 0)
  }

  test("dimension mismatch yields null, not a crash (D5)") {
    val df = spark.range(1).select(
      V.dot(vecLit(Array(1.0, 2.0)), vecLit(Array(1.0, 2.0, 3.0))).as("d"))
    assert(df.collect().head.isNullAt(0))
  }

  test("null element yields null") {
    val df = spark.sql("SELECT array(1.0d, NULL) AS a, array(1.0d, 2.0d) AS b")
      .select(V.dot(col("a"), col("b")).as("d"))
    assert(df.collect().head.isNullAt(0))
  }

  test("float input is widened exactly (== cast-then-dot)") {
    val f = emb.select(col("embedding").as("e"))
    val diff = f.select(
        (V.dot(col("e"), col("e")) =!= dotSeq(toDouble(col("e")), toDouble(col("e")))).as("d"))
      .where(col("d"))
    assert(diff.count() == 0)
  }

  test("interpreted path (nullSafeEval) agrees with codegen") {
    // force interpreted eval by evaluating the expression directly
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    val a = ArrayData.toArrayData(Array(1.5, 2.5, -3.0))
    val b = ArrayData.toArrayData(Array(0.5, 2.0, 4.0))
    val lit = (x: ArrayData) =>
      Literal.create(x, org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.DoubleType, containsNull = false))
    val e = graft.functions.DotProductExpr(lit(a), lit(b))
    val expected = ((0.0 + 1.5 * 0.5) + 2.5 * 2.0) + (-3.0 * 4.0)
    assert(e.eval(null) == expected)
  }
}
