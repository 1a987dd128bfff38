package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd polynomial rolling hash: h = fold over chars of
  * `(h*31 + code) mod 1e9+7` — bitwise identical to the HOF formulation
  * in [[TextFunctions.polyHash]] and the DuckDB oracle's `list_reduce`,
  * but a single tight loop instead of one interpreted lambda frame per
  * character (the HOF path is O(len^2) per string because each `substr`
  * rescans the UTF8 bytes; this is O(len)).
  *
  * `code` is the UTF-16 unit (== ASCII code point for the fixture data;
  * parity with DuckDB's `ascii()` is defined for ASCII input only).
  */
case class PolyHashExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes() =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"$prettyName requires string input")
  override def prettyName: String = "poly_hash"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var h = 0L
    var i = 0
    while (i < s.length) {
      h = (h * TextFunctions.HashMult + s.charAt(i)) % TextFunctions.HashMod
      i += 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
         |final String $s = $c.toString();
         |long $h = 0L;
         |for (int $i = 0; $i < $s.length(); $i++) {
         |  $h = ($h * ${TextFunctions.HashMult}L + $s.charAt($i))
         |    % ${TextFunctions.HashMod}L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object PolyHashExpr {
  def polyHashNative(c: Column): Column =
    ColumnShim.column(PolyHashExpr(ColumnShim.expression(c)))
}
