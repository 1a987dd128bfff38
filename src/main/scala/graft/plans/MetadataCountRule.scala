package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

import graft.sources.GraftFileIndex

/** Metadata-only COUNT(*) for `format("graft")` relations — the
  * Delta `OptimizeMetadataOnlyQuery` pattern: a global
  * `Aggregate` whose every output is a bare `count(<non-null
  * literal>)` over an unfiltered graft relation is answered from the
  * snapshot's `rows:` sidecar tokens
  * ([[GraftFileIndex.metadataRowCount]]) as a [[LocalRelation]] — at
  * 100 TB, `SELECT count(*) FROM events_view` schedules ZERO tasks
  * and reads zero data files.
  *
  * Strictly proof-based, like the index's pruning:
  *   - only a GLOBAL aggregate (no grouping) of count-star-shaped
  *     expressions rewrites — `count(col)` (null-sensitive),
  *     `count(DISTINCT ...)`, FILTER clauses, and any other aggregate
  *     disqualify the whole node;
  *   - only `Project`/`SubqueryAlias` may sit between (both preserve
  *     cardinality); a `Filter` — even one the index could prove
  *     total — disqualifies;
  *   - every pinned segment must carry a `rows:` token; one pre-token
  *     segment means "must scan" and the plan is left alone.
  *
  * The count is the INDEX's pinned snapshot (same version the scan
  * would have read — a concurrent commit moves neither). Injected by
  * [[graft.GraftExtensions]]; also usable via
  * `spark.experimental.extraOptimizations`. */
object MetadataCountRule extends Rule[LogicalPlan] {

  /** `count(*)` / `count(1)`: a non-distinct, unfiltered Count of a
    * single non-null literal — the shapes whose value is exactly the
    * relation's row count. */
  private def isCountStar(ne: NamedExpression): Boolean = ne match {
    case Alias(AggregateExpression(
        Count(Seq(l: Literal)), _, false, None, _), _) => l.value != null
    case _ => false
  }

  /** The graft index under `p`, looking through cardinality-preserving
    * wrappers only. */
  private def graftIndex(p: LogicalPlan): Option[GraftFileIndex] =
    p match {
      case l: LogicalRelation => l.relation match {
        case h: HadoopFsRelation => h.location match {
          case g: GraftFileIndex => Some(g)
          case _ => None
        }
        case _ => None
      }
      case Project(_, child) => graftIndex(child)
      case SubqueryAlias(_, child) => graftIndex(child)
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformDown {
      case a @ Aggregate(Nil, aggs, child, _)
          if aggs.nonEmpty && aggs.forall(isCountStar) =>
        graftIndex(child).flatMap(_.metadataRowCount) match {
          case Some(n) =>
            LocalRelation(a.output,
              Seq(InternalRow.fromSeq(Seq.fill(aggs.size)(n))))
          case None => a
        }
    }
}
