package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Max, Min}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{ByteType, DoubleType, IntegerType, LongType, ShortType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.GraftFileIndex

/** Metadata-only aggregates for `format("graft")` relations — the
  * Delta `OptimizeMetadataOnlyQuery` pattern: a global `Aggregate`
  * whose every output is `count(<non-null literal>)`, `min(col)`, or
  * `max(col)` over an unfiltered graft relation is answered from the
  * snapshot's sidecars (`rows:` tokens for the count,
  * matching-kind zone-map bounds for the extremes) as a
  * [[LocalRelation]] — at 100 TB, `SELECT min(ts_us), max(ts_us),
  * count(*) FROM events_view` (the dashboard freshness probe)
  * schedules ZERO tasks and reads zero data files.
  *
  * Strictly proof-based, like the index's pruning:
  *   - only a GLOBAL aggregate (no grouping) rewrites, and EVERY
  *     output must be servable — `count(col)` (null-sensitive),
  *     `count(DISTINCT ...)`, FILTER clauses, min/max of
  *     non-integral non-string columns (their 's' bounds are string
  *     order, not value order), or any other aggregate disqualify
  *     the whole node;
  *   - only `Project`/`SubqueryAlias` may sit between (both preserve
  *     cardinality and pass attributes through unrenamed); a
  *     `Filter` — even one the index could prove total — disqualifies;
  *   - every pinned segment must prove its contribution: a `rows:`
  *     token for the count; for min/max, matching-kind bounds OR a
  *     recorded ZERO non-null count (min/max ignore nulls, so such a
  *     segment provably contributes nothing). One unprovable segment
  *     means "must scan" and the plan is left alone. A column with no
  *     non-null value anywhere serves NULL, matching the scan.
  *
  * The values are the INDEX's pinned snapshot (same version the scan
  * would have read — a concurrent commit moves neither). Injected by
  * [[graft.GraftExtensions]]; also usable via
  * `spark.experimental.extraOptimizations`. */
object MetadataAggRule extends Rule[LogicalPlan] {

  /** The graft index + relation output under `p`, looking through
    * cardinality-preserving wrappers only. */
  private def graftIndex(
      p: LogicalPlan): Option[(GraftFileIndex, Seq[Attribute])] =
    p match {
      case l: LogicalRelation => l.relation match {
        case h: HadoopFsRelation => h.location match {
          case g: GraftFileIndex => Some((g, l.output))
          case _ => None
        }
        case _ => None
      }
      case Project(_, child) => graftIndex(child)
      case SubqueryAlias(_, child) => graftIndex(child)
      case _ => None
    }

  /** The internal-row value serving `ne`, or None when `ne` is not a
    * provably-servable aggregate over this index. */
  private def serve(ne: NamedExpression, idx: GraftFileIndex,
      relOutput: Seq[Attribute]): Option[Any] = {
    // the aggregated attribute must BE a relation output column (same
    // exprId — an alias or computed column in between disqualifies)
    def relCol(a: AttributeReference): Option[Attribute] =
      relOutput.find(_.exprId == a.exprId)
    def extreme(a: AttributeReference, wantMax: Boolean): Option[Any] =
      relCol(a).flatMap { attr =>
        attr.dataType match {
          case ByteType | ShortType | IntegerType | LongType =>
            idx.metadataLongBounds(attr.name).map {
              case None => null
              case Some((lo, hi)) =>
                val v = if (wantMax) hi else lo
                attr.dataType match {
                  case ByteType => v.toByte
                  case ShortType => v.toShort
                  case IntegerType => v.toInt
                  case _ => v
                }
            }
          case StringType =>
            idx.metadataStringBounds(attr.name).map {
              case None => null
              case Some((lo, hi)) =>
                UTF8String.fromString(if (wantMax) hi else lo)
            }
          // 'd' bounds are recorded under Spark's own min/max float
          // ordering and served VERBATIM (sign of zero, NaN intact) —
          // bit-identical to the scan's aggregate; a FLOAT column's
          // widened double bound cannot narrow back provably, so only
          // DoubleType serves
          case DoubleType =>
            idx.metadataDoubleBounds(attr.name).map {
              case None => null
              case Some((lo, hi)) => if (wantMax) hi else lo
            }
          // any other type's 's' bounds are STRING order, not value
          // order — never servable
          case _ => None
        }
      }
    ne match {
      case Alias(AggregateExpression(
          Count(Seq(l: Literal)), _, false, None, _), _)
          if l.value != null =>
        idx.metadataRowCount.map(n => n: Any)
      case Alias(AggregateExpression(
          Min(a: AttributeReference), _, false, None, _), _) =>
        extreme(a, wantMax = false)
      case Alias(AggregateExpression(
          Max(a: AttributeReference), _, false, None, _), _) =>
        extreme(a, wantMax = true)
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformDown {
      case a @ Aggregate(Nil, aggs, child, _) if aggs.nonEmpty =>
        graftIndex(child) match {
          case Some((idx, relOutput)) =>
            val served = aggs.map(serve(_, idx, relOutput))
            if (served.forall(_.isDefined))
              LocalRelation(a.output,
                Seq(InternalRow.fromSeq(served.map(_.get))))
            else a
          case None => a
        }
    }
}
