package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
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

/** Nearest-centroid assignment against a fixed codebook: returns the
  * cent_id of the (sqrt-L2-distance, cent_id)-lexicographically nearest
  * centroid. One fused generated loop over nlist x dim with the codebook
  * as a referenced constant — expressing this as nlist separate l2Dist
  * columns + least() + a when-chain explodes generated-code size past
  * the JIT/codegen limits and falls back to interpreted eval.
  *
  * Distances are sqrt'd before comparison (not compared squared): sqrt
  * rounding can map unequal squares to equal doubles, and the DuckDB
  * oracle ranks by the sqrt'd value — comparisons must agree bitwise.
  * Vector shorter than the codebook dimension or containing nulls ->
  * null (defined behavior, SURVEY.md D5). */
case class NearestCentroidExpr(child: Expression, ids: Array[Long],
    cents: Array[Array[Double]]) extends UnaryExpression {

  require(ids.length == cents.length && ids.length > 0)
  private val dim = cents(0).length

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "nearest_centroid"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double>, got ${t.sql}")
  }

  private def isFloat = child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    if (arr.numElements() != dim) return null
    val v = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      if (arr.isNullAt(i)) return null
      v(i) = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      i += 1
    }
    var best = Double.PositiveInfinity
    var bestId = ids(0)
    var c = 0
    while (c < cents.length) {
      val cv = cents(c)
      var acc = 0.0
      var j = 0
      while (j < dim) { val d = v(j) - cv(j); acc = acc + d * d; j += 1 }
      val dist = math.sqrt(acc)
      if (dist < best) { best = dist; bestId = ids(c) }
      c += 1
    }
    bestId
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("cents", cents, "double[][]")
    val idsRef = ctx.addReferenceObj("ids", ids, "long[]")
    val get =
      if (isFloat) (arr: String, i: String) => s"(double) $arr.getFloat($i)"
      else (arr: String, i: String) => s"$arr.getDouble($i)"
    nullSafeCodeGen(ctx, ev, a => {
      val v = ctx.freshName("v")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      val j = ctx.freshName("j")
      val cv = ctx.freshName("cv")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      val dist = ctx.freshName("dist")
      val best = ctx.freshName("best")
      val bestId = ctx.freshName("bestId")
      s"""
         |if ($a.numElements() != $dim) { ${ev.isNull} = true; } else {
         |  final double[] $v = new double[$dim];
         |  for (int $i = 0; $i < $dim && !${ev.isNull}; $i++) {
         |    if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $v[$i] = ${get(a, i)};
         |  }
         |  if (!${ev.isNull}) {
         |    double $best = Double.POSITIVE_INFINITY;
         |    long $bestId = $idsRef[0];
         |    for (int $c = 0; $c < ${cents.length}; $c++) {
         |      final double[] $cv = $centsRef[$c];
         |      double $acc = 0.0;
         |      for (int $j = 0; $j < $dim; $j++) {
         |        final double $d = $v[$j] - $cv[$j];
         |        $acc = $acc + $d * $d;
         |      }
         |      final double $dist = java.lang.Math.sqrt($acc);
         |      if ($dist < $best) { $best = $dist; $bestId = $idsRef[$c]; }
         |    }
         |    ${ev.value} = $bestId;
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
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
    * as VectorFunctions.cosine (incl. the zero-norm→null guard, D5), so
    * bitwise identical. */
  def cosine(a: Column, b: Column): Column = {
    val denom = norm2(a) * norm2(b)
    org.apache.spark.sql.functions.when(denom > 0.0, dot(a, b) / denom)
  }

  /** Codegen'd Euclidean distance (bitwise == VectorFunctions.l2Dist). */
  def l2Dist(a: Column, b: Column): Column =
    sqrt(binary(L2SquaredExpr.apply)(a, b))

  /** Codegen'd nearest-centroid id against a literal codebook. */
  def nearestCentroid(v: Column, ids: Array[Long],
      cents: Array[Array[Double]]): Column =
    ColumnShim.column(NearestCentroidExpr(ColumnShim.expression(v), ids, cents))
}
