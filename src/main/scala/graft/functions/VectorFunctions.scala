package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<double>` columns, built from codegen'd
  * higher-order functions (`zip_with` + `aggregate`) — no UDFs, so the
  * whole scoring pipeline stays inside whole-stage codegen.
  *
  * Determinism contract: every reduction is a strict LEFT fold seeded with
  * 0.0, i.e. `((0.0 + x1) + x2) + ...` in array order. The DuckDB oracle
  * mirrors this with `list_reduce(list_prepend(0.0, ...))`, which is also a
  * left fold, so double results are bitwise identical across engines
  * (IEEE-754 `+`/`*` are deterministic given operand order).
  *
  * Reference semantics ported here: dot product loop (reference
  * main.go:263-275), query-side-only L2 normalization (main.go:179-183).
  */
object VectorFunctions {

  /** Cast `array<float>` (parquet fixture layout) to `array<double>`;
    * float->double widening is exact, matching DuckDB's CAST. */
  def toDouble(v: Column): Column = v.cast("array<double>")

  /** Sequential-fold dot product: sum_i a_i * b_i, left-to-right. */
  def dotSeq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** L2 norm, same fold order as [[dotSeq]]. */
  def norm2(v: Column): Column = sqrt(dotSeq(v, v))

  /** True cosine similarity (both sides normalized). The reference's
    * "cosine" normalizes only the query (main.go:179-183, 246) — that
    * variant is expressed by pre-normalizing the query literal and calling
    * [[dotSeq]] directly; see VectorSearch.topK. Zero-norm input → null
    * (defined behavior, D5 — ANSI mode would otherwise throw
    * DIVIDE_BY_ZERO; the reference emits ±Inf/NaN). */
  def cosine(a: Column, b: Column): Column = {
    val denom = norm2(a) * norm2(b)
    org.apache.spark.sql.functions.when(denom > 0.0, dotSeq(a, b) / denom)
  }

  /** Euclidean distance, sequential fold of squared diffs. */
  def l2Dist(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x))

  // ---- driver-side scalar helpers (query vectors are plan constants) ----

  /** Deterministic synthetic query vector, q_i = sin(i+1). Generated on
    * the driver in the same JVM that renders the oracle SQL, so both
    * engines see the identical double literals. */
  def syntheticQuery(dim: Int): Array[Double] =
    Array.tabulate(dim)(i => math.sin(i + 1.0))

  /** q / ||q||_2 computed driver-side — the reference normalizes the query
    * once per request (main.go:179-183); in Spark it's a plan constant.
    * Zero-norm query → defined error (D5; the reference silently produces
    * ±Inf/NaN scores for every row, main.go:179-183). */
  def normalize(q: Array[Double]): Array[Double] = {
    val n = math.sqrt(q.foldLeft(0.0)((a, x) => a + x * x))
    require(n > 0.0, "cannot normalize a zero-norm query vector")
    q.map(_ / n)
  }

  /** Render a double[] as a Spark array literal column. */
  def vecLit(q: Array[Double]): Column = array(q.map(lit(_)).toIndexedSeq: _*)

  /** Render a double[] as a DuckDB list literal. Double.toString emits the
    * shortest string that round-trips to the same IEEE double; the literal
    * must carry an exponent so DuckDB types it DOUBLE directly — a bare
    * decimal literal is parsed as DECIMAL first and the DECIMAL->DOUBLE
    * cast is not correctly rounded (observed 1-ulp drift). */
  def vecSql(q: Array[Double]): String =
    q.map(doubleSql).mkString("[", ", ", "]::DOUBLE[]")

  /** One double as a DuckDB DOUBLE-typed literal (see [[vecSql]]). */
  def doubleSql(x: Double): String = {
    val s = x.toString
    if (s.contains("E") || s.contains("e") || s.contains("Infinity") || s == "NaN") s
    else s + "E0"
  }

  /** DuckDB fragment: sequential-fold dot of list expr `a` (1-based index)
    * against list expr `b`, both already DOUBLE, over dims 1..dim. Matches
    * [[dotSeq]] bit-for-bit. */
  def dotSeqSql(a: String, b: String, dim: Int): String =
    s"list_reduce(list_prepend(0.0, list_transform(range(1, ${dim + 1}), " +
      s"i -> ($a)[i] * ($b)[i])), (acc, x) -> acc + x)"
}
