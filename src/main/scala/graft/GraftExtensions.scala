package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions._

/** SQL-surface registration for the engine's codegen expressions — the
  * extension mechanism the reference entirely lacks (SURVEY.md §2.2,
  * "UDF/UDAF/UDTF extension surface: none"). Reference parity needs
  * zero planner rules (SURVEY.md §4 — the engine's reference-derived
  * custom code is all expression-level); ONE deliberate
  * extension-surface rule is injected on top:
  * [[graft.plans.MetadataAggRule]], which answers a bare
  * `SELECT count(*)` over a `format("graft")` relation from the
  * manifest's `rows:` sidecar tokens without scheduling a task. This
  * class makes both reachable from `spark.sql(...)`:
  *
  * {{{
  * val spark = SparkSession.builder()
  *   .withExtensions(GraftExtensions.install)   // or via
  *   // spark.sql.extensions=graft.GraftExtensions
  *   .getOrCreate()
  * spark.sql("SELECT vec_dot(a.embedding, b.embedding) FROM ...")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.install(ext)
}

object GraftExtensions {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "")

  private type Builder = Seq[Expression] => Expression

  private def fn(name: String, usage: String, arity: Int)(b: Builder) =
    (FunctionIdentifier(name), info(name, usage), new Builder {
      def apply(args: Seq[Expression]): Expression = {
        require(args.length == arity,
          s"$name expects $arity argument(s), got ${args.length}")
        b(args)
      }
    })

  /** Plan-time evaluation of an argument that must be a literal (n, k,
    * marker list). Guarded: a column reference here would otherwise NPE
    * or silently capture a null-row value at plan time. */
  private def literal(name: String, arg: Expression, what: String): Any = {
    require(arg.foldable, s"$name: $what must be a literal, got ${arg.sql}")
    val v = arg.eval()
    require(v != null, s"$name: $what must not be NULL")
    v
  }

  val functions = Seq(
    fn("vec_dot", "vec_dot(a, b) - sequential-fold dot product", 2) {
      args => DotProductExpr(args(0), args(1))
    },
    fn("vec_l2sq", "vec_l2sq(a, b) - sequential-fold squared L2 distance", 2) {
      args => L2SquaredExpr(args(0), args(1))
    },
    fn("shingle_hashes", "shingle_hashes(words, n) - n-word shingle polynomial hashes", 2) {
      args => ShingleHashesExpr(args(0),
        literal("shingle_hashes", args(1), "n").asInstanceOf[Number].intValue())
    },
    fn("minhash_sig", "minhash_sig(hashes, k) - k-permutation MinHash signature", 2) {
      args => MinHashSigExpr(args(0),
        literal("minhash_sig", args(1), "k").asInstanceOf[Number].intValue())
    },
    fn("simhash32", "simhash32(word_hashes) - 32-bit frequency-weighted SimHash", 1) {
      args => SimHashExpr(args(0))
    },
    fn("word_stats", "word_stats(words) - (n_words, n_distinct, sum_len, bpe_tokens)", 1) {
      args => WordStatsExpr(args(0))
    },
    fn("marker_count", "marker_count(words, csv_markers) - count of words in the marker set", 2) {
      args => MarkerCountExpr(args(0),
        literal("marker_count", args(1), "csv_markers").toString.split(",").toSeq)
    },
    fn("topk_agg", "topk_agg(score, id, k) - aggregate: k best (score desc, id asc) pairs", 3) {
      args => TopKAgg(args(0), args(1),
        literal("topk_agg", args(2), "k").asInstanceOf[Number].intValue())
        .toAggregateExpression()
    },
    fn("kmv_sketch", "kmv_sketch(hash, k) - aggregate: KMV distinct sketch (kth_hash, est)", 2) {
      args => KmvSketchAgg(args(0),
        literal("kmv_sketch", args(1), "k").asInstanceOf[Number].intValue())
        .toAggregateExpression()
    },
    fn("repetition_signals",
      "repetition_signals(words) - (top_word_count, n_bigrams, n_distinct_bigrams)", 1) {
      args => RepetitionSignalsExpr(args(0))
    }
  )

  def install(ext: SparkSessionExtensions): Unit = {
    functions.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => graft.plans.MetadataAggRule)
  }
}
