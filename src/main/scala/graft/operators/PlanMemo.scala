package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** ONE implementation of the repo's memoize-by-canonicalized-plan
  * discipline (the CLAUDE.md invariant behind the Dedup shingle cache,
  * the Pipeline quota/histogram/gate caches, and the WAND hits
  * materialization): a materialized DataFrame keyed by (session,
  * canonicalized input plans [, extra]), living until [[release]].
  *
  * The caller's `build` owns HOW to materialize — `.persist()` for
  * cached relations, repartition + `localCheckpoint()` for lineage
  * cuts — and [[release]] frees EITHER storage kind eagerly: cache-
  * manager entries unpersist, a localCheckpoint's blocks are dropped
  * through its captured RDD (the cache manager never tracked them, and
  * waiting on GC + the context cleaner is not a release policy).
  *
  * SNAPSHOT semantics, by design and shared by every user: an entry
  * reflects its inputs AS OF first use — rewriting the underlying
  * files does NOT invalidate it (the canonicalized plan compares
  * equal). Writers call their module's releaseCaches() after mutating
  * inputs; the engine's mains do so on shutdown. After release,
  * previously returned frames are DEAD (storage dropped; a
  * checkpointed frame has no lineage to recompute from). */
private[operators] final class PlanMemo {
  private val m = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, Seq[LogicalPlan], Any), DataFrame]()

  /** Memoized `build` result for these input frames (plus an optional
    * non-plan key component, e.g. a quantization level). */
  def apply(inputs: Seq[DataFrame], extra: Any = ())(
      build: => DataFrame): DataFrame = {
    require(inputs.nonEmpty, "PlanMemo needs at least one input frame")
    val key = (inputs.head.sparkSession,
      inputs.map(_.queryExecution.analyzed.canonicalized), extra)
    m.computeIfAbsent(key, _ => build)
  }

  /** Eagerly free every entry's storage and forget it. */
  def release(): Unit = {
    val it = m.values().iterator()
    while (it.hasNext) {
      val df = it.next()
      df.queryExecution.logical match {
        case l: org.apache.spark.sql.execution.LogicalRDD =>
          l.rdd.unpersist(false): Unit
        case _ => df.unpersist(): Unit
      }
    }
    m.clear()
  }
}
