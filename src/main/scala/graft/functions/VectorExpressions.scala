package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the vector-scoring hot path.
  *
  * The built-in higher-order functions (`zip_with` + `aggregate`) evaluate
  * interpreted (~100µs/row at dim=64 measured on the fixtures) — fine for
  * thousands of rows, fatal for the 100 TB scan-side. These expressions
  * generate a tight Java loop inside whole-stage codegen instead (the
  * Spark-idiomatic analogue of the reference's hand-unrolled scalar loop,
  * reference main.go:263-275).
  *
  * Determinism contract (same as VectorFunctions): strict sequential
  * left-fold `((0 + x1) + x2) + ...` — bitwise identical to the HOF
  * implementation and to the DuckDB oracle's `list_reduce`.
  *
  * Semantics: null input -> null; length mismatch or any null element ->
  * null (defined behavior replacing the reference's panic, SURVEY.md D5).
  * Accepts `array<float>` or `array<double>` children; floats are widened
  * per element (exact, identical to a prior array-level cast).
  */
abstract class VectorFoldExpression extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  /** scalar combine step, interpreted path */
  protected def combine(acc: Double, x: Double, y: Double): Double
  /** scalar combine step, codegen: java source for `acc += ...` */
  protected def combineCode(acc: String, x: String, y: String): String

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> inputs, " +
        s"got ${left.dataType.sql} / ${right.dataType.sql}")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    val (lf, rf) = (elemType(left) == FloatType, elemType(right) == FloatType)
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (lf) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (rf) b.getFloat(i).toDouble else b.getDouble(i)
      acc = combine(acc, x, y)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def get(arr: String, e: Expression, i: String): String =
      if (elemType(e) == FloatType) s"(double) $arr.getFloat($i)"
      else s"$arr.getDouble($i)"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    final double $x = ${get(a, left, i)};
         |    final double $y = ${get(b, right, i)};
         |    ${combineCode(acc, x, y)};
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })
  }
}

/** sum_i a_i * b_i with sequential fold (codegen'd). */
case class DotProductExpr(left: Expression, right: Expression)
    extends VectorFoldExpression {
  override def prettyName: String = "vec_dot"
  override protected def combine(acc: Double, x: Double, y: Double): Double =
    acc + x * y
  override protected def combineCode(acc: String, x: String, y: String): String =
    s"$acc = $acc + $x * $y"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** sum_i (a_i - b_i)^2 with sequential fold (codegen'd); sqrt applied at
  * Column level to match the HOF/oracle expression shape. */
case class L2SquaredExpr(left: Expression, right: Expression)
    extends VectorFoldExpression {
  override def prettyName: String = "vec_l2sq"
  override protected def combine(acc: Double, x: Double, y: Double): Double =
    acc + (x - y) * (x - y)
  override protected def combineCode(acc: String, x: String, y: String): String =
    s"$acc = $acc + ($x - $y) * ($x - $y)"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object VectorExpressions {
  import org.apache.spark.sql.functions.sqrt

  private def binary(
      f: (Expression, Expression) => Expression)(a: Column, b: Column): Column =
    ColumnShim.column(
      f(ColumnShim.expression(a), ColumnShim.expression(b)))

  /** Codegen'd sequential-fold dot product (bitwise == VectorFunctions.dotSeq). */
  def dot(a: Column, b: Column): Column = binary(DotProductExpr.apply)(a, b)

  /** Codegen'd L2 norm of `v`. */
  def norm2(v: Column): Column = sqrt(dot(v, v))

  /** Codegen'd true cosine: dot / (||a|| * ||b||) — same expression shape
    * as VectorFunctions.cosine, so bitwise identical. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm2(a) * norm2(b))

  /** Codegen'd Euclidean distance (bitwise == VectorFunctions.l2Dist). */
  def l2Dist(a: Column, b: Column): Column =
    sqrt(binary(L2SquaredExpr.apply)(a, b))
}
