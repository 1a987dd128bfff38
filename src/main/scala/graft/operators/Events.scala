package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType, TimestampNTZType, TimestampType}

import graft.{QueryDef, Tables}

/** Time-series / event-log operators over the `events` fixture — the batch
  * faces of the streaming primitives in [[graft.streaming]] (the reference
  * has no streaming model at all; its "async" store is a fire-and-forget
  * goroutine, reference main.go:302-321).
  *
  * Timestamp handling: the fixture generator has shipped `events.ts` as
  * both parquet INT64 TIMESTAMP(NANOS) — which Spark 4 refuses to read
  * as a timestamp ([PARQUET_TYPE_ILLEGAL]) unless
  * `spark.sql.legacy.parquet.nanosAsLong` reads it as raw nanos — and
  * as plain TIMESTAMP(MICROS) (isAdjustedToUTC=false → TIMESTAMP_NTZ).
  * [[load]] normalizes BOTH physical layouts to the same epoch
  * MICROsecond long `ts_us`, which is what every declared output keys
  * on: the DuckDB oracle's `epoch_us(ts)` yields the identical naive
  * micros in either case, and longs hash identically across engines
  * while timestamps may not.
  */
object Events {

  /** Events table with a normalized `ts_us` epoch-micros long plus a
    * derived timestamp column, whatever the parquet physical type of
    * `ts` (see object doc). The conf is runtime-settable and only widens
    * behavior (nanos columns elsewhere would otherwise be unreadable).
    * `cast(ntz as timestamp)` is evaluated under the session timezone, so
    * load pins `spark.sql.session.timeZone=UTC` itself (not just in the
    * entry-point boilerplate — an embedder via GraftExtensions would
    * otherwise silently shift every ts_us by the local offset), making
    * the cast the identity on the naive value, same as the oracle's
    * `epoch_us`. */
  def load(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.conf.set("spark.sql.session.timeZone", "UTC")
    val raw = Tables(s, dir, "events")
    val tsUs = raw.schema("ts").dataType match {
      case LongType         => expr("ts div 1000") // NANOS read as raw nanos
      case TimestampNTZType => expr("unix_micros(cast(ts as timestamp))")
      case TimestampType    => expr("unix_micros(ts)")
      case other => throw new IllegalStateException(
        s"unsupported events.ts parquet type: $other")
    }
    raw.withColumn("ts_us", tsUs)
      .withColumn("event_time", timestamp_micros(col("ts_us")))
  }

  private val GapUs = 30L * 60 * 1000000 // 30-min session gap

  // ------------------------------------------------------------------
  // O: tumbling-window aggregation (batch face of streaming groupBy(window))
  // ------------------------------------------------------------------

  /** Hourly counts / exact sums / distinct users per event type. Shuffles
    * once on (window, type); partial aggregation runs map-side, so at
    * 100 TB the shuffle carries one row per (hour, type, partition). */
  def hourlyWindows(s: SparkSession, dir: String): DataFrame =
    load(s, dir)
      .groupBy(window(col("event_time"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 6))).cast("double").as("sum_value"),
        countDistinct(col("user_id")).as("n_users"))
      .select(unix_micros(col("window.start")).as("ws_us"), col("event_type"),
        col("n_events"), col("sum_value"), col("n_users"))
      .orderBy("ws_us", "event_type")

  // ------------------------------------------------------------------
  // O: sessionization (gap-based) — batch face of stateful streaming
  // ------------------------------------------------------------------

  /** Classic gap-based sessionization: a session breaks after >30 min of
    * user inactivity. One shuffle on user_id; both window passes reuse the
    * same partitioning (no second exchange). */
  def sessionize(s: SparkSession, dir: String): DataFrame =
    sessionizeOn(load(s, dir))

  /** Core of [[sessionize]] over any (user_id, ts_us, event_id) frame —
    * separable so the exactly-gap boundary semantics (the same
    * strictly-greater split rule as `session_window`: events exactly
    * `gap` apart still merge) are unit-testable. */
  def sessionizeOn(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev
      .select(col("user_id"), col("ts_us"), col("event_id"))
      .withColumn("prev_ts", lag(col("ts_us"), 1).over(w))
      .withColumn("new_sess",
        when(col("prev_ts").isNull || col("ts_us") - col("prev_ts") > GapUs, 1)
          .otherwise(0))
      .withColumn("session_seq", sum(col("new_sess")).over(wRun))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts_us")).as("start_us"),
        max(col("ts_us")).as("end_us"))
      .withColumn("duration_us", col("end_us") - col("start_us"))
      .orderBy("user_id", "session_seq")
  }

  // ------------------------------------------------------------------
  // O: event-type transition matrix (first-order Markov over user paths)
  // ------------------------------------------------------------------

  /** First-order Markov transition matrix over per-user event paths:
    * for every ordered (from_type → to_type) step in a user's
    * event sequence, the transition count and the row-normalized
    * probability p = n_trans / n_from — the product-analytics
    * "where do users go next" relation and the input to Markov churn /
    * next-action models.
    *
    * Scale shape: ONE shuffle on user_id for the lead() window (the
    * same partitioning sessionize uses), map-side partial aggregation
    * into at most |types|² rows, then the row-normalizing window runs
    * on that tiny aggregate — the normalization never touches the
    * event-scale relation. Ordering within a user is (ts_us,
    * event_id), the repo-wide total tiebreak. */
  def transitionMatrix(s: SparkSession, dir: String): DataFrame =
    transitionMatrixOn(load(s, dir))

  /** The raw per-user transition relation (one row per consecutive
    * event pair) — the batch face the streaming twin
    * ([[graft.streaming.EventStream.transitions]]) replays against. */
  private[graft] def transitionsOn(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    ev
      .select(col("user_id"), col("ts_us"), col("event_id"),
        col("event_type"))
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .withColumn("to_us", lead(col("ts_us"), 1).over(w))
      .where(col("to_type").isNotNull)
      .select(col("user_id"), col("event_type").as("from_type"),
        col("to_type"), col("ts_us").as("from_us"), col("to_us"))
  }

  def transitionMatrixOn(ev: DataFrame): DataFrame = {
    val trans = transitionsOn(ev)
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n_trans"))
    trans
      .withColumn("n_from",
        sum(col("n_trans")).over(Window.partitionBy(col("from_type"))))
      .select(col("from_type"), col("to_type"), col("n_trans"),
        col("n_from"),
        (col("n_trans").cast("double") / col("n_from").cast("double"))
          .as("p"))
      .orderBy("from_type", "to_type")
  }

  /** DAU / WAU / stickiness — the canonical engagement report: per
    * UTC day, distinct active users, the trailing-7-day distinct
    * actives, and DAU/WAU. The event-scale work is ONE distinct over
    * (day, user) — everything after runs on that collapsed relation:
    * the trailing window is an interval join of the (bounded,
    * calendar-sized — the hours×types-grid precedent) day grid
    * against user-days, so no event row is ever touched twice and no
    * distinct runs over a RANGE frame (which Spark can't do exactly).
    * Integer day arithmetic (epoch-µs div), exact distinct counts,
    * rational stickiness — bit-reproducible. */
  def dauWau(s: SparkSession, dir: String): DataFrame = {
    val ud = load(s, dir)
      .select(expr("ts_us div 86400000000").as("day"), col("user_id"))
      .distinct()
    val dau = ud.groupBy("day").agg(count(lit(1)).as("dau"))
    val days = ud.select("day").distinct()
    val wau = days.as("d")
      .join(ud.as("u"),
        col("u.day") >= col("d.day") - 6 && col("u.day") <= col("d.day"))
      .groupBy(col("d.day").as("day"))
      .agg(count_distinct(col("u.user_id")).as("wau"))
    dau.join(wau, "day")
      .select(col("day"), col("dau"), col("wau"),
        (col("dau").cast("double") / col("wau").cast("double"))
          .as("stickiness"))
      .orderBy("day")
  }

  /** [[transitionMatrix]] with SESSION-BOUNDED edges: a transition is
    * counted only when both events fall in the same gap-based session
    * (the analytics-correct formulation — a path across a 30-minute
    * absence is two visits, not one journey). Everything rides the ONE
    * user_id window: the session counter (the [[sessionizeOn]]
    * running sum), the lead() pair, and the lead's session id — an
    * edge survives iff the two session ids agree, so no second
    * partitioning and no join is ever introduced. */
  def sessionTransitionMatrix(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val trans = load(s, dir)
      .select(col("user_id"), col("ts_us"), col("event_id"),
        col("event_type"))
      .withColumn("prev_ts", lag(col("ts_us"), 1).over(w))
      .withColumn("new_sess",
        when(col("prev_ts").isNull || col("ts_us") - col("prev_ts") > GapUs, 1)
          .otherwise(0))
      .withColumn("session_seq", sum(col("new_sess")).over(wRun))
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .withColumn("to_sess", lead(col("session_seq"), 1).over(w))
      .where(col("to_type").isNotNull &&
        col("to_sess") === col("session_seq"))
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n_trans"))
    trans
      .withColumn("n_from",
        sum(col("n_trans")).over(Window.partitionBy(col("from_type"))))
      .select(col("from_type"), col("to_type"), col("n_trans"),
        col("n_from"),
        (col("n_trans").cast("double") / col("n_from").cast("double"))
          .as("p"))
      .orderBy("from_type", "to_type")
  }

  /** Top-K most common length-3 event-type paths (trigram user
    * journeys) — the second-order companion to [[transitionMatrix]].
    * Both lead() steps ride ONE user_id window (one shuffle, no
    * self-joins — the naive formulation is two event-scale joins),
    * the path counts partial-aggregate map-side, and the top-K is
    * `TakeOrderedAndProject` over the ≤|types|³ aggregate with a full
    * (n desc, path) tiebreak so the cut is deterministic. */
  def pathTopK(s: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    load(s, dir)
      .select(col("user_id"), col("ts_us"), col("event_id"),
        col("event_type").as("t0"))
      .withColumn("t1", lead(col("t0"), 1).over(w))
      .withColumn("t2", lead(col("t0"), 2).over(w))
      .where(col("t2").isNotNull)
      .groupBy("t0", "t1", "t2")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("t0"), col("t1"), col("t2"))
      .limit(k)
  }

  // ------------------------------------------------------------------
  // O: as-of join (nearest-earlier match) — absent from Spark's builtins
  // ------------------------------------------------------------------

  /** For every click, the most recent purchase (at or before it) by the
    * same user — an AS-OF join. Implemented the scalable way: tag both
    * sides, union, ONE shuffle on user_id, then a running `last(...,
    * ignoreNulls)` carries the latest purchase forward; a sort within
    * partitions replaces the quadratic join+filter a naive plan would use.
    * Purchases sort before clicks at the same microsecond (kind 0 < 1),
    * giving the oracle's `c.ts >= p.ts` tie semantics. */
  def asofClickPurchase(s: SparkSession, dir: String): DataFrame = {
    val ev = load(s, dir)
    val tagged = ev.where(col("event_type").isin("click", "purchase"))
      .select(col("user_id"), col("ts_us"), col("event_id"),
        when(col("event_type") === "purchase", 0).otherwise(1).as("kind"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("kind"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("purchase_id",
        last(when(col("kind") === 0, col("event_id")), ignoreNulls = true).over(w))
      .withColumn("purchase_ts",
        last(when(col("kind") === 0, col("ts_us")), ignoreNulls = true).over(w))
      .where(col("kind") === 1)
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts_us").as("click_ts"), col("purchase_id"), col("purchase_ts"),
        (col("ts_us") - col("purchase_ts")).as("gap_us"))
      .orderBy("click_id")
  }

  /** BOUNDED as-of join: like [[asofClickPurchase]] but a match only
    * counts inside an attribution window (purchase within `boundUs`
    * before the click) — the shape every conversion-attribution
    * pipeline runs. Because the running `last` already carries the
    * NEAREST earlier purchase, the bound is a pure post-projection:
    * nearest-too-old ⟹ every purchase is too old, so nulling the
    * carried match is exactly "no purchase within the window". Same
    * single user_id shuffle; no second pass. */
  def asofClickPurchaseBounded(s: SparkSession, dir: String,
      boundUs: Long = 24L * 3600 * 1000000): DataFrame = {
    val base = asofClickPurchase(s, dir)
    val inWindow = col("gap_us") <= boundUs // gap >= 0 by construction
    base.select(col("click_id"), col("user_id"), col("click_ts"),
        when(inWindow, col("purchase_id")).as("purchase_id"),
        when(inWindow, col("purchase_ts")).as("purchase_ts"),
        when(inWindow, col("gap_us")).as("gap_us"))
      .orderBy("click_id")
  }

  /** Exact p50/p90/p99 of the click→purchase attribution lag — the
    * conversion-latency numbers an SLO dashboard quotes — by composing
    * the as-of join's gap relation with the histogram-narrowing
    * selection ([[exactQuantilesOn]]): order statistics of a DERIVED
    * (joined) column with no global sort; each narrowing round
    * re-evaluates the one-shuffle as-of plan with the interval
    * predicate applied on top. Matched clicks only (an unmatched
    * click has no lag, not an infinite one). */
  def lagQuantiles(s: SparkSession, dir: String): DataFrame = {
    // the narrowing protocol caches its input for the protocol's
    // duration itself (r19) — the derived as-of gap relation rides
    // that cache, no caller-side persist needed
    exactQuantilesOn(asofClickPurchase(s, dir)
      .where(col("gap_us").isNotNull).select(col("gap_us")), "gap_us")
  }

  /** SLIDING-window rates: hourly windows every 15 minutes, so each
    * event lands in 4 overlapping windows — the smoothing shape
    * tumbling windows can't express. Spark plans one Expand (×4) before
    * the aggregation, so the shuffle carries (windows × types) partial
    * rows, not ×4 raw events. */
  def slidingRates(s: SparkSession, dir: String): DataFrame =
    load(s, dir)
      .groupBy(window(col("event_time"), "1 hour", "15 minutes"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(unix_micros(col("window.start")).as("ws_us"),
        col("event_type"), col("n_events"))
      .orderBy("ws_us", "event_type")

  /** Gap-filled hourly resampling: a dense (hour × event_type) grid over
    * the observed time range with zero-filled holes — what a downstream
    * rate model needs (missing hours ARE data). The grid is generated
    * with `sequence` + explode against the aggregated bounds (a 1-row
    * broadcast), then the sparse counts left-join in: no shuffle is ever
    * keyed on the raw events beyond the first aggregate. */
  def gapFilledHourly(s: SparkSession, dir: String): DataFrame = {
    val hourUs = 3600L * 1000000
    // ONE raw scan: bounds and the type set are tiny aggregates of the
    // hourly counts, collected to the driver as grid constants (a naive
    // formulation re-scans the raw events for bounds and again for the
    // distinct types — two redundant full scans at the 100 TB posture)
    val counts = load(s, dir)
      .select((col("ts_us") - col("ts_us") % hourUs).as("hr_us"),
        col("event_type"))
      .groupBy("hr_us", "event_type")
      .agg(count(lit(1)).as("n_events"))
      .persist() // tiny (hours × types); released via releaseCaches()
    retained.add(counts)
    val meta = counts.agg(min(col("hr_us")).as("lo"), max(col("hr_us")).as("hi"),
      sort_array(collect_set(col("event_type"))).as("types")).head
    if (meta.isNullAt(0)) // empty input: a defined empty grid
      return counts.select(col("hr_us"), col("event_type"), col("n_events"))
        .where(lit(false))
    val types = meta.getAs[scala.collection.Seq[String]]("types")
    val grid = s.range(1).select(explode(sequence(
        lit(meta.getAs[Long]("lo")), lit(meta.getAs[Long]("hi")),
        lit(hourUs))).as("hr_us"))
      .crossJoin(s.createDataFrame(types.map(Tuple1(_)).toSeq)
        .toDF("event_type"))
    grid.join(counts, Seq("hr_us", "event_type"), "left_outer")
      .select(col("hr_us"), col("event_type"),
        coalesce(col("n_events"), lit(0L)).as("n_events"))
      .orderBy("hr_us", "event_type")
  }

  /** Sessionization via Spark's NATIVE `session_window` aggregate — the
    * built-in face of [[sessionize]]'s hand-rolled window pass (and of
    * the streaming flatMapGroupsWithState sessionizer). Boundary
    * semantics MATCH [[sessionize]]: each event spans [t, t+gap] and
    * sessions merge on touch, so an exactly-gap separation still merges
    * and only a STRICTLY greater gap splits (pinned by the exactly-gap
    * unit test in PipelineSpec — an earlier `>=` reading of the split
    * rule was wrong and survived only because the fixture has no
    * exactly-gap pair). The two formulations differ only in the output
    * convention: window end = last event + gap. */
  def sessionWindows(s: SparkSession, dir: String): DataFrame =
    load(s, dir)
      .groupBy(col("user_id"),
        session_window(col("event_time"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_micros(col("sw.start")).as("ws_us"),
        unix_micros(col("sw.end")).as("we_us"),
        col("n_events"))
      .orderBy("user_id", "ws_us")

  /** Forward AS-OF join: for every click, the EARLIEST purchase at or
    * after it by the same user (the look-ahead twin of
    * [[asofClickPurchase]] — "did this click convert, and when").
    * Same single-shuffle union trick, with the frame reversed: clicks
    * sort before purchases at the same microsecond (kind 0 < 1) so a
    * same-instant purchase is inside the [current, +inf) frame, and
    * `first(..., ignoreNulls)` picks the nearest following purchase
    * (min event_id on ties — the oracle's ASOF `<=` + min). */
  def asofClickNextPurchase(s: SparkSession, dir: String): DataFrame =
    asofForwardOn(load(s, dir))

  /** Core of the forward as-of over any event frame (separable so edge
    * inputs — e.g. clicks with no purchases at all — are testable). */
  def asofForwardOn(ev: DataFrame): DataFrame = {
    val tagged = ev.where(col("event_type").isin("click", "purchase"))
      .select(col("user_id"), col("ts_us"), col("event_id"),
        when(col("event_type") === "purchase", 1).otherwise(0).as("kind"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("kind"), col("event_id"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    tagged
      .withColumn("purchase_id",
        first(when(col("kind") === 1, col("event_id")), ignoreNulls = true).over(w))
      .withColumn("purchase_ts",
        first(when(col("kind") === 1, col("ts_us")), ignoreNulls = true).over(w))
      .where(col("kind") === 0)
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts_us").as("click_ts"), col("purchase_id"), col("purchase_ts"),
        (col("purchase_ts") - col("ts_us")).as("gap_us"))
      .orderBy("click_id")
  }

  /** FULL OUTER join of two per-hour aggregates (clicks vs purchases):
    * hours with activity on only one side survive with a zero on the
    * other — the join type every reconciliation query needs and the one
    * the reference cannot express at all. Both sides aggregate BEFORE
    * the join, so the full-outer shuffle carries one row per hour, not
    * per event. */
  def hourlyClicksVsPurchases(s: SparkSession, dir: String): DataFrame = {
    val ev = load(s, dir)
    def hourly(tpe: String, out: String) = ev
      .where(col("event_type") === tpe)
      .groupBy((col("ts_us") - col("ts_us") % (3600L * 1000000)).as("hr_us"))
      .agg(count(lit(1)).as(out))
    hourly("click", "n_clicks")
      .join(hourly("purchase", "n_purchases"), Seq("hr_us"), "full_outer")
      .select(col("hr_us"),
        coalesce(col("n_clicks"), lit(0L)).as("n_clicks"),
        coalesce(col("n_purchases"), lit(0L)).as("n_purchases"))
      .orderBy("hr_us")
  }

  /** EWMA (α = 1/2) of the per-type hourly event-rate series — the
    * smoothed "current rate" an alerting/monitoring pipeline keeps per
    * stream, next to the raw series length and last bucket. Zero-
    * seeded: s_0 = 0, s_t = s_{t−1}·½ + c_t·½ over the hour-ordered
    * counts — a SEQUENTIAL left fold (the repo's float-determinism
    * rule) with α exactly representable, so both engines produce the
    * identical IEEE double.
    *
    * Scale shape: one partial-aggregated (type, hour) count shuffle —
    * the same relation every hourly dashboard already builds — then a
    * per-type fold over a months-of-hours array (720 entries/month;
    * bounded by the retention window, not the event count). No global
    * window, no per-row state. */
  def hourlyEwma(s: SparkSession, dir: String): DataFrame = {
    val hourUs = 3600L * 1000000
    load(s, dir)
      .where(col("ts_us").isNotNull && col("event_type").isNotNull)
      .groupBy(col("event_type"),
        (col("ts_us") - col("ts_us") % hourUs).as("hr_us"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_hours"),
        max(col("hr_us")).as("last_hr_us"),
        sort_array(collect_list(struct(col("hr_us"), col("cnt"))))
          .as("series"))
      .select(col("event_type"), col("n_hours"), col("last_hr_us"),
        // lambda reads only its parameters — no captured expressions
        aggregate(col("series"), lit(0.0), (acc, x) =>
          acc * lit(0.5) + x.getField("cnt").cast("double") * lit(0.5))
          .as("ewma"))
      .orderBy("event_type")
  }

  /** One week of microseconds — the funnel conversion window and the
    * retention cohort bucket. Weeks are epoch-aligned integer division
    * of epoch-µs (no calendar/timezone arithmetic), so both engines
    * bucket identically. */
  val WeekUs = 7L * 24 * 3600 * 1000000

  /** Ordered funnel steps for [[funnel]]. */
  val FunnelSteps = Seq("view", "click", "purchase")

  def funnel(s: SparkSession, dir: String): DataFrame =
    funnelOn(load(s, dir))

  /** SEQUENTIAL funnel conversion: of the users who viewed, how many
    * then clicked strictly after their first view, then purchased
    * strictly after that earliest qualifying click — all within one
    * [[WeekUs]] window anchored at the first view. "Strictly after"
    * is the ordered-funnel semantics: a click BEFORE any view (or a
    * purchase before the qualifying click) does not convert.
    *
    * Scale shape: ONE shuffle on user_id; both running-min window
    * passes and the per-user aggregate share that partitioning and its
    * (ts_us, event_id) sort — the running `min(step-k qualifying time
    * so far)` is what replaces the self-join-per-step formulation
    * (k corpus-sized joins) with k window projections. The final
    * 3-row unpivot runs on a single aggregated row. */
  def funnelOn(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val staged = ev
      .select(col("user_id"), col("ts_us"), col("event_id"),
        col("event_type"))
      .withColumn("t1_run",
        min(when(col("event_type") === FunnelSteps(0), col("ts_us"))).over(w))
      .withColumn("c2",
        when(col("event_type") === FunnelSteps(1) &&
          col("ts_us") > col("t1_run") &&
          col("ts_us") <= col("t1_run") + WeekUs, col("ts_us")))
      .withColumn("t2_run", min(col("c2")).over(w))
      .withColumn("c3",
        when(col("event_type") === FunnelSteps(2) &&
          col("ts_us") > col("t2_run") &&
          col("ts_us") <= col("t1_run") + WeekUs, col("ts_us")))
    staged.groupBy(col("user_id"))
      .agg(
        min(when(col("event_type") === FunnelSteps(0), col("ts_us"))).as("t1"),
        min(col("c2")).as("t2"),
        min(col("c3")).as("t3"))
      .agg(count(col("t1")).as("n1"), count(col("t2")).as("n2"),
        count(col("t3")).as("n3"))
      .select(expr(s"""stack(3,
          1, '${FunnelSteps(0)}', n1,
          2, '${FunnelSteps(1)}', n2,
          3, '${FunnelSteps(2)}', n3) AS (step, step_name, n_users)"""),
        col("n1"))
      .withColumn("conversion",
        when(col("n1") > 0,
          col("n_users").cast("double") / col("n1").cast("double")))
      .select(col("step"), col("step_name"), col("n_users"),
        col("conversion"))
      .orderBy("step")
  }

  def retentionCohorts(s: SparkSession, dir: String): DataFrame =
    retentionCohortsOn(load(s, dir))

  /** Weekly cohort retention: users bucketed by first-activity week;
    * for each (cohort, week offset), how many are still active and
    * what fraction of the cohort that is. The offset-0 row exists for
    * every cohort by construction (each user's first event IS at
    * offset 0), so cohort_size is never null and the division never
    * sees zero.
    *
    * Scale shape: the cohort week is a running property of the user's
    * partition (ONE shuffle on user_id), the (user, cohort, offset)
    * distinct collapses each user-week to one row before the count,
    * and the per-cohort size lookup is a window over the tiny
    * (cohort × offset) aggregate — no corpus-sized join anywhere. */
  def retentionCohortsOn(ev: DataFrame): DataFrame = {
    val wU = Window.partitionBy(col("user_id"))
    val wC = Window.partitionBy(col("cohort_wk"))
    ev.select(col("user_id"),
        call_function("div", col("ts_us"), lit(WeekUs)).as("wk"))
      .withColumn("cohort_wk", min(col("wk")).over(wU))
      .select(col("user_id"), col("cohort_wk"),
        (col("wk") - col("cohort_wk")).as("offset_wk"))
      .distinct()
      .groupBy(col("cohort_wk"), col("offset_wk"))
      .agg(count(lit(1)).as("n_active"))
      .withColumn("cohort_size",
        max(when(col("offset_wk") === 0, col("n_active"))).over(wC))
      .withColumn("retention",
        col("n_active").cast("double") / col("cohort_size").cast("double"))
      .orderBy("cohort_wk", "offset_wk")
  }

  /** Interval self-join: for every error event, the count and closest
    * gap of same-user events (any type) within +-5 minutes. Equi-key on
    * user_id carries the shuffle; the interval predicate filters inside
    * the join — the batch shape of the stream-stream time-bound join. */
  def errorContext(s: SparkSession, dir: String): DataFrame = {
    val ev = load(s, dir).select(col("user_id"), col("ts_us"), col("event_id"),
      col("event_type"))
    val errors = ev.where(col("event_type") === "error")
      .select(col("user_id"), col("ts_us").as("err_ts"),
        col("event_id").as("err_id"))
    val windowUs = 5L * 60 * 1000000
    errors.join(ev.where(col("event_type") =!= "error"),
        Seq("user_id"))
      .where(col("ts_us") >= col("err_ts") - windowUs &&
        col("ts_us") <= col("err_ts") + windowUs)
      .groupBy(col("err_id"), col("user_id"), col("err_ts"))
      .agg(count(lit(1)).as("n_nearby"),
        min(abs(col("ts_us") - col("err_ts"))).as("closest_gap_us"))
      .orderBy("err_id")
  }

  // ------------------------------------------------------------------
  // O: skew-resistant two-phase (salted) aggregation
  // ------------------------------------------------------------------

  /** Aggregation over a HOT grouping key (5 event types x millions of
    * rows at scale): phase 1 pre-aggregates on (key, salt) — spreading
    * each hot key over 16 reducers — phase 2 merges the 16 partials per
    * key. Decimal partial sums make the two-phase result EXACTLY equal
    * to the direct group-by (the oracle is the plain GROUP BY): this is
    * the salting pattern for when map-side partial aggregation alone
    * can't absorb the skew (e.g. high-cardinality distincts per key). */
  def saltedTypeStats(s: SparkSession, dir: String, salts: Int = 16): DataFrame =
    load(s, dir)
      .withColumn("salt", (col("event_id") % salts).cast("int"))
      .groupBy("event_type", "salt")
      .agg(count(lit(1)).as("n_part"),
        sum(col("value").cast(DecimalType(18, 6))).as("sum_part"))
      .groupBy("event_type")
      .agg(sum(col("n_part")).as("n_events"),
        sum(col("sum_part")).cast("double").as("sum_value"))
      .orderBy("event_type")

  /** Salt fan-out for [[saltedDimJoinOn]]. */
  val JoinSalts = 8

  def saltedDimJoin(s: SparkSession, dir: String): DataFrame =
    saltedDimJoinOn(load(s, dir))

  /** Skew-resistant SALTED JOIN — [[saltedTypeStats]]'s discipline
    * applied to the join side of the house: a fact table whose join
    * key is Zipf-hot (5 event types × millions of rows each at scale)
    * against a dimension too large — or, as here, too data-dependent —
    * for the broadcast gate. An unsalted shuffle join lands every
    * 'CLICK' row on ONE reducer (the straggler that decides the
    * stage's wall clock at 100 TB); salting spreads each hot key over
    * [[JoinSalts]] reducers: the FACT side salts on a row-local
    * attribute (`event_id % salts` — no extra shuffle, the salt rides
    * the join exchange), the DIM side REPLICATES once per salt (dim×S
    * rows — the bounded side pays the fan-out, never the corpus), and
    * the join keys become (key, salt). Results are provably the
    * unsalted join's: every fact row still meets exactly its key's dim
    * row (at its own salt), so the oracle is the plain unsalted SQL —
    * PlanSpec pins the replicated-dim fan-out, the (key, salt) shuffle
    * profile, and salted ≡ unsalted. The SHUFFLE_HASH hint keeps the
    * demo honest at fixture scale (a 5-row dim would broadcast and the
    * salt would prune to dead code); production keeps the broadcast
    * gate FIRST — salting is the remedy once the dim outgrows it.
    * The post-join report (events above their type's mean) divides
    * nowhere: value·n > Σvalue in exact decimal arithmetic on both
    * engines. */
  def saltedDimJoinOn(events: DataFrame,
      salts: Int = JoinSalts): DataFrame = {
    val clean = events
      .where(col("event_type").isNotNull && col("value").isNotNull)
    val dim = clean.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_type"),
        sum(col("value").cast(DecimalType(18, 6))).as("sum_type"))
    val dimRep = dim.withColumn("salt",
      explode(sequence(lit(0), lit(salts - 1))))
    clean
      // pmod, not %: Spark's % keeps the dividend's sign, so a
      // negative id would mint a salt outside the replicated 0..S-1
      // space and silently DROP the row from the inner join; a null id
      // coalesces to salt 0 — every fact row must keep exactly one
      // dim partner or salted ≡ unsalted breaks
      .withColumn("salt",
        pmod(coalesce(col("event_id"), lit(0L)), lit(salts.toLong))
          .cast("int"))
      .join(dimRep.hint("shuffle_hash"), Seq("event_type", "salt"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("value").cast(DecimalType(18, 6)) * col("n_type") >
          col("sum_type"), 1L).otherwise(0L)).as("n_above_avg"))
      .orderBy("event_type")
  }

  // ------------------------------------------------------------------
  // O: JSON extraction from a semi-structured props column
  // ------------------------------------------------------------------

  def jsonProps(s: SparkSession, dir: String): DataFrame =
    load(s, dir)
      .select(col("event_type"),
        // try_cast: a non-integer k yields null instead of an ANSI
        // CAST_INVALID_INPUT abort (mirrored by TRY_CAST in the oracle)
        expr("try_cast(get_json_object(props, '$.k') AS INT)").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"), sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))
      .orderBy("event_type")

  /** Semi-structured props via Spark 4's VARIANT type: parse once into
    * the binary variant encoding, then typed-path extraction — the
    * schema-on-read path that beats per-query JSON string parsing when
    * the same column is probed repeatedly (variant parses once per row;
    * get_json_object re-parses per extraction). Values verified against
    * DuckDB's JSON extraction. */
  def variantProps(s: SparkSession, dir: String): DataFrame =
    load(s, dir)
      .select(try_variant_get(try_parse_json(col("props")), "$.k", "int")
        .as("k"))
      .agg(count(lit(1)).as("n_events"),
        count(col("k")).as("n_with_k"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))

  /** Heavy-hitter cut: a user is "heavy" when its event count exceeds
    * [[HeavyNum]]/[[HeavyDen]] × the mean events-per-user. A RELATIVE
    * threshold (vs the classic count > n/k) because it is
    * scale-invariant: the mean is the corpus's own yardstick, so the
    * same query means the same thing at sf0.001 and at 100 TB. */
  val HeavyNum = 5L
  val HeavyDen = 4L

  def heavyHitters(s: SparkSession, dir: String): DataFrame =
    heavyHittersOn(load(s, dir))

  /** Heavy-hitter users — the abuse/bot-detection ops query: per-user
    * event counts (ONE partial+final aggregate on user_id — uniform key,
    * map-side combine, the corpus never shuffles raw rows), then the
    * (1-row) corpus totals broadcast back and the cut applied in EXACT
    * integer arithmetic (`n · n_users · HeavyDen > n_total · HeavyNum`
    * — no float mean, no division at all until the reported share).
    * The products ride WIDE integers (decimal(38,0) here, HUGEINT in
    * the oracle): long·long·const overflows int64 under extreme skew
    * (one user owning ~10¹² events among 10⁹ users), and under ANSI
    * both engines would ABORT the query rather than emit rows — the
    * wide types keep the comparison exact to ~10³⁸.
    * At 100 TB the per-user relation is user-cardinality — large, but
    * partitioned; nothing here is single-partition. */
  def heavyHittersOn(events: DataFrame): DataFrame =
    heavyCutOn(events.groupBy("user_id")
      .agg(count(lit(1)).as("n_events")))

  /** The cut over a precomputed (user_id, n_events) relation — split
    * out so the wide-integer comparison is testable at the count
    * magnitudes that overflow int64 (no fixture can carry 10¹² rows,
    * but a counts relation can claim them). */
  private[graft] def heavyCutOn(perUser: DataFrame): DataFrame = {
    val totals = perUser.agg(sum(col("n_events")).as("n_total"),
      count(lit(1)).as("n_users"))
    perUser.crossJoin(broadcast(totals)) // 1-row stats relation
      .where(col("n_events").cast("decimal(38,0)") * col("n_users")
          * HeavyDen >
        col("n_total").cast("decimal(38,0)") * HeavyNum)
      .select(col("user_id"), col("n_events"), col("n_total"),
        col("n_users"),
        (col("n_events").cast("double") / col("n_total").cast("double"))
          .as("share"))
      .orderBy(col("n_events").desc, col("user_id"))
  }

  // ------------------------------------------------------------------
  // count-min sketch — mergeable bounded-state frequency estimation
  // ------------------------------------------------------------------

  /** Grid geometry: [[CmsDepth]] rows × [[CmsWidth]] counters (power of
    * two — position is a bit mask, no ANSI `%` on the hot path beyond
    * the portable modular hash). */
  val CmsDepth = 4
  val CmsWidth = 1024
  /** Per-depth multipliers (odd, < 2^32): with the operand reduced mod
    * [[graft.functions.TextFunctions.HashMod]] first, every product
    * stays under ~2^62 — the pmod-before-multiply discipline that keeps
    * ANSI long arithmetic from aborting in either engine. */
  val CmsMult: Seq[Long] =
    Seq(2654435761L, 2246822519L, 3266489917L, 668265263L)
  /** Candidate-set size for the estimate-vs-exact report. */
  val CmsTopK = 10

  /** Depth-j counter position of a key — pure portable integer
    * arithmetic (identical in DuckDB), so the whole sketch is
    * DETERMINISTIC and oracle-able, unlike arrival-order-dependent
    * summaries (SpaceSaving/Misra-Gries). */
  private[graft] def cmsPos(u: Column, j: Int): Column =
    (((u % graft.functions.TextFunctions.HashMod) * CmsMult(j) +
      lit(j * 97L + 13L)) % graft.functions.TextFunctions.HashMod)
      .bitwiseAND(lit((CmsWidth - 1).toLong))

  private[graft] def cmsPosArray(u: Column): Column =
    array((0 until CmsDepth).map(j => cmsPos(u, j)): _*)

  /** The d×w cell relation — the sketch ITSELF, shared by the batch
    * report and the streaming face ([[graft.streaming.EventStream
    * .cmsCells]]): one partial-aggregated shuffle whose key space is
    * FIXED at d·w cells regardless of corpus size. */
  def cmsGrid(events: DataFrame): DataFrame =
    events
      .select(posexplode(cmsPosArray(col("user_id"))).as(Seq("depth", "pos")))
      .groupBy("depth", "pos").agg(count(lit(1)).as("n"))

  def cmsTopK(s: SparkSession, dir: String): DataFrame =
    cmsTopKOn(load(s, dir))

  /** COUNT-MIN frequency estimation next to its ground truth — the
    * bounded-state alternative to [[heavyHittersOn]]'s exact per-key
    * aggregate: the sketch is a fixed d×w grid of counters (d·w longs
    * TOTAL, whatever the key cardinality), each event incrementing one
    * cell per depth, and a key's estimate is the MIN of its d cells —
    * always ≥ the exact count (cells only ever over-count via
    * collisions), within ε·N of it with high probability (ε ≈ e/w).
    * At 100 TB this is the frequency summary that actually fits:
    * partial aggregation map-side combines every task's events into
    * ≤ d·w cells before the ONE tiny shuffle, the grid is fixed-size
    * plan metadata on the probe side (unconditional broadcast — the
    * codebook class, NOT corpus-dependent), and grids from disjoint
    * corpus slices MERGE by cell-wise addition (the count-min algebra —
    * same mergeability contract as [[graft.functions.KmvSketchAgg]]).
    * The declared query reports the top-[[CmsTopK]] exact keys with
    * their estimates and overcounts, so the sketch's error is OBSERVED
    * next to the truth it approximates (the measured-miss-rate
    * discipline every approximate path here follows). */
  def cmsTopKOn(events: DataFrame): DataFrame = {
    val cells = cmsGrid(events)
    val cand = events.groupBy("user_id")
      .agg(count(lit(1)).as("n_exact"))
      .orderBy(col("n_exact").desc, col("user_id"))
      .limit(CmsTopK)
    cand
      .select(col("user_id"), col("n_exact"),
        posexplode(cmsPosArray(col("user_id"))).as(Seq("depth", "pos")))
      .join(broadcast(cells), Seq("depth", "pos"))
      .groupBy("user_id", "n_exact")
      .agg(min(col("n")).as("n_cms"))
      .select(col("user_id"), col("n_exact"), col("n_cms"),
        (col("n_cms") - col("n_exact")).as("overcount"))
      .orderBy(col("n_exact").desc, col("user_id"))
  }

  /** Per-group candidate-set size for [[groupCmsTopKOn]]. */
  val GroupCmsTopK = 5

  /** The PER-GROUP sketch: (group, depth, pos) cells — the state a
    * multi-tenant monitor holds per tenant/type, bounded at
    * groups·d·w. Same mergeable algebra as [[cmsGrid]] (cell-wise
    * addition across corpus slices — property-pinned in EventsSpec). */
  def groupCmsGrid(events: DataFrame): DataFrame =
    events
      .select(col("event_type"),
        posexplode(cmsPosArray(col("user_id"))).as(Seq("depth", "pos")))
      .groupBy("event_type", "depth", "pos").agg(count(lit(1)).as("n"))

  /** The catch-all group every out-of-configuration key clamps into
    * on the bounded-state face ([[groupCmsCellsConfigured]]). */
  val CmsOtherGroup = "__other"

  /** [[groupCmsGrid]] on a CONFIGURED group set — the bounded-state
    * face [[graft.streaming.EventStream.groupCmsCells]] serves: a
    * stream cannot budget-guard a data-dependent group set up front
    * (the batch guard LIMITs a distinct fetch — a corpus operation),
    * so production CONFIGURES the tenant/type list, exactly as
    * monitoring systems do, and out-of-set groups CLAMP into the one
    * [[CmsOtherGroup]] catch-all instead of minting unbounded state —
    * [[driftCells]]'s clamped-grid contract applied to the group
    * axis. State is ≤ (allowed+1)·d·w rows forever; cells merge by
    * addition, so the micro-batch cut is invisible (replay ≡ batch
    * spec-pinned). Works on batch AND streaming frames.
    *
    * Deliberately ASYMMETRIC with [[groupCmsTopKOn]]'s fail-loud
    * budget guard: a batch job can abort and be re-run with a bigger
    * budget, a stream cannot — clamping here (and failing loud there)
    * is each regime's correct behavior, not a bug in either. */
  def groupCmsCellsConfigured(events: DataFrame,
      allowed: Seq[String]): DataFrame = {
    require(allowed.nonEmpty, "configured group set must be non-empty")
    // a configured group named like the catch-all would merge with all
    // clamped out-of-set traffic — its probes then overcount unbounded
    // by the CMS error guarantee; collide loud instead
    require(!allowed.contains(CmsOtherGroup),
      s"configured group set must not contain the '$CmsOtherGroup' " +
        "catch-all sentinel")
    events
      .where(col("event_type").isNotNull && col("user_id").isNotNull)
      .select(when(col("event_type").isin(allowed.map(x => x: Any): _*),
          col("event_type")).otherwise(lit(CmsOtherGroup))
          .as("event_type"),
        posexplode(cmsPosArray(col("user_id"))).as(Seq("depth", "pos")))
      .groupBy("event_type", "depth", "pos").agg(count(lit(1)).as("n"))
  }

  def groupCmsTopK(s: SparkSession, dir: String): DataFrame =
    groupCmsTopKOn(load(s, dir))

  /** PER-GROUP count-min heavy hitters — [[cmsTopKOn]]'s corpus-global
    * report turned into the query a multi-tenant pipeline actually
    * runs: per event type, the top-[[GroupCmsTopK]] exact keys next to
    * their sketch estimates and overcounts. The grid is
    * [[groupCmsGrid]]'s (group, depth, pos) relation — groups·d·w
    * cells TOTAL, one partial-aggregated shuffle — and the budget
    * guard fires BEFORE the driver (or a broadcast) materializes
    * anything: the distinct-group fetch is LIMITed to
    * budget/(d·w) + 1 rows, so a high-cardinality group column fails
    * loud with the driver never holding more than the budget's worth
    * ([[groupQuantileSketchOn]]'s guard discipline). The probe joins
    * candidates to cells through the size gate, NOT an unconditional
    * broadcast — post-guard the cell relation is budget-bounded, but
    * it still grows with group cardinality, which is data
    * (the repo's broadcast rule); a shuffle join over groups·K probe
    * rows is the correct degraded plan. Deterministic end to end
    * (portable modular hashing, total rank order), so the whole
    * report oracles exactly.
    *
    * Deliberately ASYMMETRIC with [[groupCmsCellsConfigured]]'s
    * `__other` clamp: a batch over-budget job should abort and be
    * re-run with a bigger budget, while a stream must keep running on
    * bounded state — do not "fix" this guard into a clamp (it would
    * silently merge surplus tenants) or the clamp into a guard (it
    * would crash a production stream on one new tenant). */
  def groupCmsTopKOn(events: DataFrame,
      budget: Long = QuantileDriverCellBudget): DataFrame = {
    val clean = events
      .where(col("event_type").isNotNull && col("user_id").isNotNull)
    val cellsPerGroup = CmsDepth.toLong * CmsWidth.toLong
    val maxGroups = math.max(budget / cellsPerGroup, 0L)
    val gRows = clean.select("event_type").distinct()
      .limit(math.min(maxGroups + 1L, Int.MaxValue.toLong).toInt)
      .collect()
    require(gRows.length <= maxGroups,
      s"grouped CMS has more than $maxGroups groups at $cellsPerGroup " +
        s"cells each — over budget $budget; shrink the grid or " +
        "pre-partition the group space")
    val cells = groupCmsGrid(clean)
    val wg = Window.partitionBy(col("event_type"))
      .orderBy(col("n_exact").desc, col("user_id"))
    val cand = clean.groupBy("event_type", "user_id")
      .agg(count(lit(1)).as("n_exact"))
      .withColumn("rnk", row_number().over(wg))
      .where(col("rnk") <= GroupCmsTopK)
    cand
      .select(col("event_type"), col("user_id"), col("n_exact"),
        col("rnk"),
        posexplode(cmsPosArray(col("user_id"))).as(Seq("depth", "pos")))
      .join(VectorSearch.broadcastIfSmall(cells),
        Seq("event_type", "depth", "pos"))
      .groupBy("event_type", "user_id", "n_exact", "rnk")
      .agg(min(col("n")).as("n_cms"))
      .select(col("event_type"), col("user_id"), col("n_exact"),
        col("n_cms"), (col("n_cms") - col("n_exact")).as("overcount"),
        col("rnk"))
      .orderBy(col("event_type"), col("rnk"))
  }

  /** Score threshold and stats-relation broadcast ceiling for
    * [[anomaly]]. */
  val AnomalyThreshold = 3.5
  val MaxAnomalyStatsRows = 100000L

  def anomaly(s: SparkSession, dir: String): DataFrame = anomalyOn(load(s, dir))

  /** Robust outlier detection — the monitoring query a pipeline ops
    * team runs over metric streams: per event type, the MEDIAN and the
    * MAD (median absolute deviation), then every event whose robust
    * z-score |value − med| / mad exceeds [[AnomalyThreshold]], worst
    * first. Median/MAD instead of mean/stddev for two reasons: the
    * estimator doesn't chase its own outliers (the point of robust
    * stats), and a distributed float stddev is ORDER-DEPENDENT —
    * banned by the repo's determinism rules — where rank statistics
    * are exactly reproducible. Exact MAD is inherently two dependent
    * medians, so the operator is three passes (median, deviations'
    * median, scoring); the per-type stats relations are
    * type-cardinality — persisted, count-gated onto broadcasts (the
    * [[Pipeline.domainMixDocsOn]] lesson: event_type is DATA, and the
    * stats estimator misprices tiny aggregates), so no pass shuffles
    * the corpus. At 100 TB swap the exact percentile for the mergeable
    * histogram ([[Relational.histogramMedian]]'s path) — the exact
    * formulation here is the oracle-checkable baseline. Division is
    * null-guarded (mad = 0 on a constant stream; ANSI throws on /0). */
  /** The per-type (med, mad) relation on its own — the batch-derived
    * STATE the streaming scorer
    * ([[graft.streaming.EventStream.scoreAnomalies]]) consumes as a
    * stream-static broadcast: rank statistics need the corpus, a
    * one-pass stream cannot derive them — the same batch-owns-state
    * boundary as the domain-mix quotas. Persisted + count-gated
    * (type-cardinality). */
  def anomalyStatsOn(events: DataFrame): DataFrame = {
    val med = events.groupBy("event_type")
      .agg(percentile(col("value"), lit(0.5)).as("med"))
      .persist()
    retained.add(med)
    val medH = if (med.count() <= MaxAnomalyStatsRows) broadcast(med) else med
    val stats = events.join(medH, "event_type")
      .withColumn("adev", abs(col("value") - col("med")))
      .groupBy("event_type")
      .agg(first(col("med")).as("med"),
        percentile(col("adev"), lit(0.5)).as("mad"))
      .persist()
    retained.add(stats)
    stats
  }

  /** The pure row-scoring predicate over (value, med, mad) — ONE
    * definition shared by the batch and streaming anomaly faces. */
  private[graft] def anomalyScore: Column =
    when(col("mad") > 0.0, (col("value") - col("med")) / col("mad"))

  def anomalyOn(events: DataFrame): DataFrame = {
    val stats = anomalyStatsOn(events)
    val statsH =
      if (stats.count() <= MaxAnomalyStatsRows) broadcast(stats) else stats
    events.join(statsH, "event_type")
      .withColumn("score", anomalyScore)
      .where(abs(col("score")) > AnomalyThreshold)
      .select(col("event_id"), col("event_type"), col("value"),
        col("med"), col("mad"), col("score"))
      .orderBy(abs(col("score")).desc, col("event_id"))
      .limit(50)
  }

  // ------------------------------------------------------------------
  // O: manifest-backed time-range scan (zone-map SEGMENT pruning)
  // ------------------------------------------------------------------

  /** Segment count for the manifest-backed events table — time-
    * contiguous slices, so the ts_us zone maps are disjoint and a range
    * read can prove most segments irrelevant. */
  val RangeSegs = 8

  /** Manifest-backed events table (implicit index, built once per
    * (session, sf dir) into a temp table path): the slim event relation
    * re-stored through [[graft.sources.ManifestStore]] as [[RangeSegs]]
    * time-contiguous segments under a `ts_us` zone-map config — the
    * ingest-ordered layout a streamed event log naturally has, where
    * each commit covers a narrow time window. Returns
    * (tablePath, min ts_us, max ts_us). At 100 TB this table IS the
    * store (segments arrive from the stream, [[EventStream]]-style);
    * here it is derived from the fixture once and torn down by
    * [[releaseCaches]]. */
  private[graft] def manifestEventsTable(s: SparkSession,
      dir: String): (String, Long, Long) =
    manifestTables(s, dir) { path =>
      val ev = load(s, dir)
        .select("event_id", "user_id", "event_type", "value", "ts_us")
      val r = ev.agg(min("ts_us"), max("ts_us")).head
      val (lo, hi) = (r.getLong(0), r.getLong(1))
      val w = (hi - lo) / RangeSegs
      graft.sources.ManifestStore.setZoneMapColumns(s, path, Seq("ts_us"))
      // blooms on the id axis: the time-sliced layout's zone maps
      // answer ts-range questions; event_id POINT lookups need the
      // per-segment "could this id be here at all" bit
      graft.sources.ManifestStore.setBloomColumns(s, path, Seq("event_id"))
      (0 until RangeSegs).foreach { i =>
        val sLo = lo + i * w
        val sHi = if (i == RangeSegs - 1) hi else sLo + w - 1
        // a degenerate span (hi - lo < RangeSegs ⇒ w = 0 ⇒ sLo > sHi
        // for every non-final slice) would commit empty segments whose
        // missing stats defeat pruning — skip them arithmetically
        if (sHi >= sLo) graft.sources.ManifestStore.store(
          ev.where(col("ts_us").between(sLo, sHi)), path, "events")
      }
      (path, lo, hi)
    }

  /** Segment count for the VALUE-clustered events table — the metric-
    * partitioned monitoring layout ([[valueEventsTable]]). */
  val ValueSegs = 6

  private val valueTables =
    new FixtureTables[(String, Double, Double)]("graft-ev-value-")(_._1)

  /** VALUE-clustered manifest events table (implicit index, built once
    * per (session, sf dir)): the slim event relation stored as
    * [[ValueSegs]] value-contiguous segments under a `value` ('d'-kind)
    * + `ts_us` ('l'-kind) zone-map config — the layout a metric store
    * clustered on its measurement axis has, where "values in this
    * band" queries prove most segments irrelevant. The double band
    * arithmetic (lo + (hi−lo)/segs·i) is a fixed IEEE op sequence the
    * oracle mirrors exactly. Returns (tablePath, min value, max
    * value). */
  private[graft] def valueEventsTable(s: SparkSession,
      dir: String): (String, Double, Double) =
    valueTables(s, dir) { path =>
      // persisted for the build only: the bounds job, the per-band
      // emptiness probes, and the per-band stores all read the cached
      // blocks instead of rescanning the parquet ~13×
      val ev = load(s, dir)
        .select("event_id", "event_type", "value", "ts_us")
        .where(col("value").isNotNull)
        .persist()
      graft.sources.ManifestStore.setZoneMapColumns(s, path,
        Seq("value", "ts_us"))
      val (lo, hi) =
        try {
          val r = ev.agg(min("value"), max("value")).head
          if (r.isNullAt(0)) {
            // zero non-null values: commit the (empty) relation once so
            // the collection exists with the right schema and the
            // connector faces answer empty instead of throwing
            graft.sources.ManifestStore.store(ev, path, "events")
            (0.0, 0.0)
          } else {
            val (lo0, hi0) = (r.getDouble(0), r.getDouble(1))
            // a NaN/±Inf value makes hi (Spark max orders NaN greatest)
            // and thus the band width non-finite; every band predicate
            // then compares false for FINITE rows too and the derived
            // table is silently built missing data. Fail loud instead —
            // the read side's NaN discipline has no write-side band for
            // non-finite values to live in.
            require(java.lang.Double.isFinite(lo0) &&
              java.lang.Double.isFinite(hi0),
              s"valueEventsTable: non-finite value bounds [$lo0, $hi0] " +
                "— the band predicates cannot partition non-finite rows")
            val w = (hi0 - lo0) / ValueSegs
            (0 until ValueSegs).foreach { i =>
              val slice =
                if (i == ValueSegs - 1)
                  ev.where(col("value") >= lo0 + w * i)
                else ev.where(col("value") >= lo0 + w * i &&
                  col("value") < lo0 + w * (i + 1))
              // a degenerate band (all-equal values ⇒ w = 0) holds no
              // rows — an empty segment carries no stats and would
              // defeat pruning. The emptiness probe must stay the
              // band's OWN predicate (a derived band index would
              // re-round the float arithmetic and could disagree with
              // the slice at a boundary — skipped rows = data loss)
              if (!slice.isEmpty)
                graft.sources.ManifestStore.store(slice, path, "events")
            }
            (lo0, hi0)
          }
        } finally { ev.unpersist(); () }
      (path, lo, hi)
    }

  /** VALUE-band aggregate through the `format("graft")` connector —
    * the 'd'-kind zone-map face: a `value` range filter over the
    * value-clustered table proves the out-of-band segments irrelevant
    * at planning time (double bounds compared under the canonical
    * NaN-greatest predicate order — [[graft.sources.ManifestStore
    * .readRangeDouble]]'s proof, GraftSourceSpec pins the NaN/-0.0
    * edges), and the residual double `between` still pushes into the
    * surviving parquet. The middle third [lo+2w, lo+4w) of the value
    * domain — EventsSpec pins that the plan keeps 2 of the 6
    * value-sliced segments. */
  def valueRangeScan(s: SparkSession, dir: String): DataFrame = {
    val (path, lo, hi) = valueEventsTable(s, dir)
    val w = (hi - lo) / ValueSegs
    s.read.format("graft").option("path", path)
      .option("collection", "events").load()
      .where(col("value") >= lo + w * 2 && col("value") < lo + w * 4)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 6))).cast("double")
          .as("sum_value"))
      .orderBy("event_type")
  }

  /** METADATA-SERVED value-band count — [[rangeCount]]'s 'd'-kind
    * twin over the value-clustered table: bands fully inside
    * [lo+2w, lo+4w] contribute their sidecar non-null counts without
    * a read, partial-overlap bands scan with the residual, and the
    * NaN discipline keeps the serve sound (a NaN-holding segment can
    * never prove full coverage under a finite bound — see
    * [[graft.sources.ManifestStore.countRangeDoublePlanned]]). The
    * serving split is spec-pinned; the oracle checks the count. */
  def valueRangeCount(s: SparkSession, dir: String): DataFrame = {
    val (path, lo, hi) = valueEventsTable(s, dir)
    val w = (hi - lo) / ValueSegs
    val (n, _, _, _) = graft.sources.ManifestStore
      .countRangeDoublePlanned(s, path, "events",
        lo + w * 2, lo + w * 4, "value")
    import s.implicits._
    Seq(n).toDF("n_events")
  }

  /** Time-range aggregate over the MIDDLE QUARTER of the event log,
    * served by [[graft.sources.ManifestStore.readRangeLong]]: the
    * driver consults the per-segment ts_us zone maps and never lists,
    * plans, or opens the segments outside [lo+3w, lo+5w] — with
    * [[RangeSegs]] = 8 equal slices that is 3 of 8 segments read, and
    * the residual predicate still pushes into the surviving parquet for
    * row-group skipping. The oracle re-derives the identical bounds
    * arithmetically from the raw table (integer floor division in both
    * engines). */
  def rangeScan(s: SparkSession, dir: String): DataFrame = {
    val (path, lo, hi) = manifestEventsTable(s, dir)
    val w = (hi - lo) / RangeSegs
    graft.sources.ManifestStore
      .readRangeLong(s, path, "events", lo + 3 * w, lo + 5 * w, "ts_us")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 6))).cast("double")
          .as("sum_value"),
        min("ts_us").as("min_ts_us"), max("ts_us").as("max_ts_us"))
      .orderBy("event_type")
  }

  /** The mid-log anchor VERSION — ONE definition of the anchor
    * arithmetic ([[anchoredReads]]'s comment made that a requirement;
    * the oracles' first-RangeSegs/2-slices cutoff depends on every
    * caller choosing the SAME version). */
  private def anchorVersion(s: SparkSession, path: String): Long = {
    val versions = graft.sources.ManifestStore
      .listVersions(s, path, "events").filterNot(_.tombstone)
    versions(math.max(0, versions.size / 2 - 1)).ptrSeq
  }

  /** (table path, [[anchorVersion]]'s COMMIT INSTANT) — the timestamp
    * twin of [[anchoredReads]]'s anchor, shared by [[timeTravelTs]]
    * and [[timeTravelSince]] so both faces probe the SAME instant
    * their oracles' slice cutoffs assume. The probe requires the
    * anchor's instant to address exactly the anchor version, which
    * holds on ANY filesystem since the durable-instant upgrade:
    * serialized commits (this fixture's) carry STRICTLY increasing
    * instants in their pointer bodies — no setTimes capability
    * involved, so the old S3A tie-then-resolve-forward hazard is
    * structurally gone. */
  private def anchorInstant(s: SparkSession, dir: String): (String, Long) = {
    val (path, _, _) = manifestEventsTable(s, dir)
    val anchor = anchorVersion(s, path)
    val tsMid = graft.sources.ManifestStore.history(s, path, "events")
      .where(col("ptr_seq") === anchor)
      .select("commit_ts_ms").head.getLong(0)
    (path, tsMid)
  }

  /** TIMESTAMP TIME TRAVEL over the manifest-backed events table —
    * Delta's `TIMESTAMP AS OF` re-expressed on the pointer log: the
    * mid-log anchor version's COMMIT INSTANT (DESCRIBE HISTORY's
    * `commit_ts_ms`, the durable instant stamped in the pointer body
    * at publish — monotone on any filesystem) is
    * resolved back through [[graft.sources.ManifestStore.readAsOfTimeInferred]]
    * and must serve exactly the anchor snapshot — the same first-half
    * time-slice prefix `ev_snapshot_drift`'s oracle derives from the
    * raw corpus (the version↔time-slice equivalence EventsSpec pins).
    * A second far-future probe pins the CEILING: a timestamp past the
    * latest commit addresses the latest version, not an error
    * ([[graft.sources.ManifestStore.versionAtTime]]'s readAsOf
    * parity). Both snapshots reduce to per-type aggregates, so the
    * oracle re-derives the whole report from the raw parquet with the
    * slice-cutoff predicate. Resolution is driver-side pointer-log
    * metadata (bounded by vacuum retention); the snapshots themselves
    * are ordinary pruned segment reads. */
  def timeTravelTs(s: SparkSession, dir: String): DataFrame = {
    val (path, tsMid) = anchorInstant(s, dir)
    val mid = graft.sources.ManifestStore
      .readAsOfTimeInferred(s, path, "events", tsMid)
    val fut = graft.sources.ManifestStore
      .readAsOfTimeInferred(s, path, "events", Long.MaxValue / 2)
    def report(df: DataFrame, probe: String): DataFrame = df
      .groupBy(lit(probe).as("probe"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 6))).cast("double")
          .as("sum_value"),
        min("ts_us").as("min_ts_us"), max("ts_us").as("max_ts_us"))
    report(mid, "anchor").unionByName(report(fut, "future"))
      .orderBy("probe", "event_type")
  }

  /** The TIMESTAMPED CHANGE FEED as a declared face — Delta's
    * `startingTimestamp` analogue under the driver's oracle gate:
    * "what landed since the anchor instant" must be exactly the
    * second-half time slices ([[timeTravelTs]]'s anchor arithmetic,
    * complemented), re-derived by the oracle from the raw parquet with
    * the same cutoff predicate. The resolution is driver-side pointer
    * metadata; the feed itself reads ONLY the appended segments —
    * the incremental-maintenance consumption pattern addressed by
    * wall clock instead of version. */
  def timeTravelSince(s: SparkSession, dir: String): DataFrame = {
    val (path, tsMid) = anchorInstant(s, dir)
    graft.sources.ManifestStore
      .readSinceTimeInferred(s, path, "events", tsMid)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 6))).cast("double")
          .as("sum_value"),
        min("ts_us").as("min_ts_us"), max("ts_us").as("max_ts_us"))
      .orderBy("event_type")
  }

  /** [[rangeScan]] through the `format("graft")` connector: the SAME
    * middle-quarter aggregate, but the segment skipping comes from the
    * Catalyst data filter reaching [[graft.sources.GraftFileIndex]] at
    * planning time — the declarative face (what a `USING graft` SQL
    * view serves) proven identical to the imperative
    * `readRangeLong` call, under the same oracle. The scan itself is
    * Spark's native vectorized parquet reader, so the residual
    * predicate still pushes into the surviving files' row groups. */
  def connectorRangeScan(s: SparkSession, dir: String): DataFrame = {
    val (path, lo, hi) = manifestEventsTable(s, dir)
    val w = (hi - lo) / RangeSegs
    s.read.format("graft").option("path", path)
      .option("collection", "events").load()
      .where(col("ts_us").between(lo + 3 * w, lo + 5 * w))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 6))).cast("double")
          .as("sum_value"),
        min("ts_us").as("min_ts_us"), max("ts_us").as("max_ts_us"))
      .orderBy("event_type")
  }

  /** METADATA-SERVED range count: events in the middle half of the
    * log, counted by [[graft.sources.ManifestStore.countRangeLongPlanned]] —
    * segments fully inside the range contribute their sidecar
    * non-null counts WITHOUT being listed, planned, or read; only the
    * two boundary segments are scanned (with the residual pushed into
    * their parquet). At 100 TB this is the "events this week"
    * dashboard query costing two boundary segments instead of the
    * week. The one-row report also exposes the serving split
    * (meta-served / scanned / pruned segment counts) so the
    * optimization is observable — and spec-pinned. */
  def rangeCount(s: SparkSession, dir: String): DataFrame = {
    val (path, lo, hi) = manifestEventsTable(s, dir)
    val w = (hi - lo) / RangeSegs
    val (n, _, _, _) = graft.sources.ManifestStore
      .countRangeLongPlanned(s, path, "events",
        lo + 2 * w, lo + 6 * w, "ts_us")
    import s.implicits._
    // the serving split (meta/scanned/pruned) is layout, not data —
    // EventsSpec pins it; the oracle checks the count
    Seq(n).toDF("n_events")
  }

  /** METADATA-SERVED table audit: the bare COUNT(*) answered entirely
    * from the per-segment `rows:` sidecar tokens
    * ([[graft.sources.GraftFileIndex.metadataRowCount]] — zero
    * segments listed, planned, or read), next to a NULL audit through
    * the `format("graft")` connector: `ts_us IS NULL` over segments
    * whose sidecars prove rows == non-null count plans ZERO files —
    * the IsNull proof arm, the same metadata one `cnt:` token already
    * funds. At 100 TB these are the "how big is this table / is the
    * ingest clean" dashboard probes costing sidecar reads instead of
    * the table. Both numbers come from ONE pinned snapshot (the
    * version is resolved once and passed as the `versionAsOf`
    * ceiling) — a commit landing between the two reads must not pair
    * an n_events with an n_null_ts from different versions. The
    * oracle checks the values. */
  def metaCount(s: SparkSession, dir: String): DataFrame = {
    val (path, _, _) = manifestEventsTable(s, dir)
    val seq = graft.sources.ManifestStore.currentPtrSeq(s, path, "events")
    val idx = new graft.sources.GraftFileIndex(s, path, "events", seq)
    val pinned = s.read.format("graft").option("path", path)
      .option("collection", "events")
      .option("versionAsOf", seq.toString).load()
    // sidecar-served when every pinned segment carries a rows: token;
    // the fallback scan reads the SAME pinned segment list
    val n = idx.metadataRowCount.getOrElse(pinned.count())
    val nNullTs = pinned.where(col("ts_us").isNull).count()
    import s.implicits._
    Seq((n, nNullTs)).toDF("n_events", "n_null_ts")
  }

  /** Exact-quantile knobs: percentile targets, histogram width, and
    * the row cap under which a bucket goes to direct selection. */
  val QuantilePcts = Seq(50, 90, 99)
  val QuantileBuckets = 4096L
  val QuantileSelectCap = 1L << 20

  /** EXACT distributed order statistics — p50/p90/p99 of `ts_us` —
    * WITHOUT a global sort: iterative histogram narrowing (the
    * classic distributed selection algorithm, BLMPRT-style
    * median-finding re-expressed declaratively).
    *
    * Each round is ONE column-pruned scan: every still-unresolved
    * percentile target tags its rows with a bucket index over its
    * current [lo, hi] candidate interval (integer width =
    * (hi−lo)/B + 1, so indexes stay in [0, B)), and a partial+final
    * aggregate ships ≤ targets × [[QuantileBuckets]] rows to the
    * driver — bounded metadata, the codebook-class collect. The
    * driver walks the cumulative histogram to the bucket holding the
    * k-th value, rebases k inside it, and narrows the interval; a
    * width-1 interval IS the answer, and a bucket under
    * [[QuantileSelectCap]] rows resolves in one final selection scan
    * (row_number over the ≤cap-row bucket, value at the rebased rank
    * — order-statistic semantics make tie order irrelevant).
    *
    * Scale shape: intervals shrink ×B per round — 10^12 rows resolve
    * in two histogram scans + one selection scan, and every scan's
    * interval predicate is range-pushed to the parquet scan (row-group
    * stats skip cold ranges). All arithmetic is integer, so the
    * result hash-matches DuckDB's rank-arithmetic oracle bitwise. */
  def exactQuantiles(s: SparkSession, dir: String): DataFrame =
    exactQuantilesOn(load(s, dir).select(col("ts_us"))
      .where(col("ts_us").isNotNull), "ts_us")


  /** Rank of the p-th percentile target: ceil(total·p/100) in exact
    * long arithmetic. This is DRIVER-side JVM math — no ANSI overflow
    * guard applies — so a total (row count or Σweight) above
    * Long.MaxValue/100 would silently wrap `total * 99` and yield a
    * wrong k with no error. Fail loud instead; ~9.2e16 rows/tokens is
    * two orders of magnitude past the 100 TB design point, and a
    * caller that big must pre-scale its weights. */
  private def quantileRank(total: Long, p: Int): Long = {
    require(total <= Long.MaxValue / 100L,
      s"quantile rank arithmetic would overflow: total $total > " +
        s"Long.MaxValue/100 (${Long.MaxValue / 100L}); pre-scale weights")
    (total * p + 99L) / 100L
  }

  /** Narrowing-round bound derived from the knobs: every histogram
    * round shrinks an interval's width from w to ≤ w/B + 1, so
    * log_B(2^64) + slack rounds always suffice — 12-ish at the
    * production B=4096, ~70 at a spec-forced B=2. A fixed constant
    * here was a real bug: tiny spec knobs legitimately need more
    * rounds (caught by the random-multiset property). */
  private def quantileMaxRounds(buckets: Long): Int = {
    val log2B = math.max(1,
      63 - java.lang.Long.numberOfLeadingZeros(math.max(2L, buckets)))
    4 + 64 / log2B
  }

  /** `selectCap`/`buckets` default to the scale knobs; specs force the
    * histogram-narrowing loop with tiny values (the fixtures are all
    * under the production cap) and assert loop ≡ direct selection —
    * the CC solvers' fast-path discipline. */
  /** Shared target validation for every exact-quantile face (scalar,
    * weighted, grouped, grouped+weighted): quantileRank's overflow
    * guard assumes 1 ≤ p ≤ 99 (the Long.MaxValue/100 bound plus the
    * +99 ceil term); p ≤ 0 would yield rank 0/negative and silently
    * drop rows. */
  private def requireValidPcts(pcts: Seq[Int]): Unit = {
    require(pcts.nonEmpty && pcts.distinct == pcts,
      s"percentile targets must be distinct and non-empty: $pcts")
    require(pcts.forall(p => p >= 1 && p <= 99),
      s"percentile targets must be in [1, 99]: $pcts")
  }

  def exactQuantilesOn(values: DataFrame, c: String,
      selectCap: Long = QuantileSelectCap,
      buckets: Long = QuantileBuckets,
      pcts: Seq[Int] = QuantilePcts): DataFrame = {
    requireValidPcts(pcts)
    // protocol-duration cache (lagQuantiles' discipline pushed into the
    // protocol itself): every narrowing round and the selection scan
    // otherwise re-derive `values` — one parquet scan + projection per
    // round. The result is a LOCAL relation (fully materialized before
    // return), so the unpersist can never force a recompute.
    val v = values.persist()
    try {
      // count(col) not count(*): a NULL value is invisible to min/max,
      // the bucket tags, and the selection scans — counting it into n
      // would silently shift every rank
      val head = v
        .agg(min(col(c)).as("lo"), max(col(c)).as("hi"),
          count(col(c)).as("n")).head
      exactQuantilesFrom(v, c, head, selectCap, buckets, pcts)
    } finally { v.unpersist(); () }
  }

  /** [[exactQuantilesOn]] with the (lo, hi, n) head Row already in
    * hand — the sketch face computes the identical aggregate for its
    * own grid geometry and passes it through, saving one full scan
    * per call (r19). */
  private[graft] def exactQuantilesFrom(values: DataFrame, c: String,
      head: org.apache.spark.sql.Row,
      selectCap: Long = QuantileSelectCap,
      buckets: Long = QuantileBuckets,
      pcts: Seq[Int] = QuantilePcts): DataFrame = {
    requireValidPcts(pcts)
    val s = values.sparkSession
    import s.implicits._
    if (head.isNullAt(2) || head.getLong(2) == 0L)
      return Seq.empty[(Int, Long, Long)].toDF("pct", "k", c)
    val n = head.getLong(2)
    // (pct, rank-within-interval, interval) per target; k-th smallest
    // overall = ceil(n·p/100)-th, then rebased as intervals narrow
    var open = pcts.map(p =>
      (p, quantileRank(n, p), head.getLong(0), head.getLong(1)))
    var done = Seq.empty[(Int, Long, Long)] // (pct, original k, value)
    val origK = open.map(t => t._1 -> t._2).toMap
    var rounds = 0
    val maxRounds = quantileMaxRounds(buckets)
    while (open.nonEmpty && rounds < maxRounds) {
      rounds += 1
      // resolved-by-pinch: a single-value interval is the answer
      val (pinched, active) = open.partition(t => t._3 == t._4)
      done = done ++ pinched.map(t => (t._1, origK(t._1), t._3))
      // small-bucket targets go to one shared selection scan
      val counts =
        if (active.isEmpty) Map.empty[Int, Long]
        else {
          val tagged = active.zipWithIndex.map { case ((_, _, lo, hi), i) =>
            when(col(c).between(lo, hi), lit(i)) }
          values
            .where(col(c).between(active.map(_._3).min, active.map(_._4).max))
            .select(explode(array_compact(array(tagged: _*))).as("tid"))
            .groupBy("tid").agg(count(lit(1)).as("cnt"))
            .collect().map(r => active(r.getAs[Int]("tid"))._1 ->
              r.getAs[Long]("cnt")).toMap
        }
      val (small, big) = active.partition(t =>
        counts.getOrElse(t._1, 0L) <= selectCap)
      if (small.nonEmpty) {
        val sel = small.zipWithIndex.map { case ((_, k, lo, hi), i) =>
          (i, k, lo, hi) }
        val tagged = sel.map { case (i, _, lo, hi) =>
          when(col(c).between(lo, hi), lit(i)) }
        val w = Window.partitionBy(col("tid")).orderBy(col(c))
        val kOf = typedLit(sel.map(t => t._1 -> t._2).toMap)
        val picked = values
          .where(col(c).between(small.map(_._3).min, small.map(_._4).max))
          .select(col(c), explode(array_compact(array(tagged: _*))).as("tid"))
          .withColumn("rn", row_number().over(w))
          .where(col("rn") === element_at(kOf, col("tid")))
          .select("tid", c).collect()
          .map(r => (small(r.getAs[Int]("tid"))._1,
            origK(small(r.getAs[Int]("tid"))._1), r.getAs[Long](c)))
        done = done ++ picked
      }
      // histogram round for the rest: walk to the k-th value's bucket
      open = if (big.isEmpty) Nil else {
        val tagged = big.zipWithIndex.map { case ((_, _, lo, hi), i) =>
          val width = (hi - lo) / buckets + 1L
          when(col(c).between(lo, hi),
            struct(lit(i).as("tid"),
              call_function("div", col(c) - lit(lo), lit(width)).as("b"))) }
        val hist = values
          .where(col(c).between(big.map(_._3).min, big.map(_._4).max))
          .select(explode(array_compact(array(tagged: _*))).as("tb"))
          .groupBy(col("tb.tid").as("tid"), col("tb.b").as("b"))
          .agg(count(lit(1)).as("cnt"))
          .collect().groupBy(_.getAs[Int]("tid"))
        big.zipWithIndex.map { case ((p, k, lo, hi), i) =>
          val width = (hi - lo) / buckets + 1L
          val cells = hist(i).map(r =>
            r.getAs[Long]("b") -> r.getAs[Long]("cnt")).sortBy(_._1)
          // inclusive-cumulative walk to the bucket holding the k-th
          val cums = cells.scanLeft((0L, 0L, 0L)) {
            case ((_, _, cum), (b, cnt)) => (b, cnt, cum + cnt) }.drop(1)
          val (b, cnt, cumIncl) = cums.find(_._3 >= k).get
          val before = cumIncl - cnt
          (p, k - before, lo + b * width, math.min(hi, lo + (b + 1) * width - 1L))
        }
      }
    }
    require(open.isEmpty, s"quantile narrowing did not converge: $open")
    done.toDF("pct", "k", c).orderBy("pct")
  }

  /** Cell count of the MERGEABLE quantile sketch — bounded state, like
    * [[CmsWidth]]·[[CmsDepth]] for frequencies. */
  val SketchBuckets = 4096L

  /** The quantile-sketch CELLS — a fixed-grid histogram over
    * [lo, lo + B·w): bucket index is exact integer arithmetic
    * ((v − lo) div w, identical in DuckDB), the relation is ≤ B rows
    * whatever the corpus size, and grids from disjoint corpus slices
    * MERGE by cellwise addition — the count-min algebra applied to
    * rank statistics ([[cmsGrid]]'s contract; property-pinned). This
    * is the single-pass bounded-state path a 100 TB streaming
    * deployment runs when [[exactQuantilesOn]]'s multi-round narrowing
    * scans are too expensive: partial aggregation map-side combines
    * every task into ≤ B cells before one tiny shuffle. */
  def quantileSketchCells(values: DataFrame, c: String, lo: Long,
      w: Long, buckets: Long = SketchBuckets): DataFrame = {
    require(w > 0, s"sketch bucket width must be positive, got $w")
    require(buckets > 0, s"sketch needs buckets > 0, got $buckets")
    // nulls are dropped HERE (not left to the caller): a NULL value's
    // bucket index is NULL and a driver-side getAs[Long] would unbox
    // it to cell 0, silently inflating the lowest bucket — the
    // streaming face feeds real monitoring data through this path.
    // Out-of-domain values CLAMP into the edge cells (b < 0 → 0,
    // b ≥ buckets → buckets−1): the streaming face runs this over a
    // CONFIGURED domain, and an unclamped index would let state grow
    // past the documented ≤ buckets bound on domain overshoot, while
    // Spark's toward-zero div would silently fold (lo−w, lo) into
    // bucket 0 but not (lo−2w, lo−w). Batch callers derive lo/w from
    // the data's own min/max, where the clamp is an exact identity —
    // the DuckDB oracles are unaffected.
    values.where(col(c).isNotNull)
      .select(least(greatest(
          call_function("div", col(c) - lit(lo), lit(w)), lit(0L)),
        lit(buckets - 1L)).as("b"))
      .groupBy("b").agg(count(lit(1)).as("bn"))
  }

  /** Driver-side CDF interpolation over collected sketch cells: walk
    * the cumulative histogram to the bucket holding the k-th value,
    * then interpolate linearly inside it. Every term is an exact
    * long cast to double before one fixed-order IEEE expression —
    * `CAST(lo + b·w) + CAST(w) · (CAST(k − before) / CAST(bn))` — so
    * the estimate hash-matches the DuckDB oracle bitwise. The error
    * vs the exact order statistic is bounded by one bucket width w
    * (the estimate lands inside the k-th value's own bucket). */
  private[graft] def sketchEstimate(cells: Seq[(Long, Long)],
      lo: Long, w: Long, k: Long): Double = {
    var cum = 0L
    cells.sortBy(_._1).foreach { case (b, bn) =>
      if (cum + bn >= k)
        return (lo + b * w).toDouble +
          w.toDouble * ((k - cum).toDouble / bn.toDouble)
      cum += bn
    }
    sys.error(s"rank $k beyond histogram mass $cum")
  }

  def quantileSketch(s: SparkSession, dir: String): DataFrame =
    quantileSketchOn(load(s, dir).select(col("ts_us"))
      .where(col("ts_us").isNotNull), "ts_us")

  /** MERGEABLE quantile sketch NEXT TO its exact ground truth — the
    * [[cmsTopKOn]] discipline applied to percentiles: one bounded-
    * state aggregate ([[quantileSketchCells]], ≤ [[SketchBuckets]]
    * cells however large the corpus) summarizes the distribution, the
    * CDF interpolation estimates each [[QuantilePcts]] target, and the
    * declared query reports the estimate IN THE SAME ROW as
    * [[exactQuantilesOn]]'s exact value and the signed error — the
    * measured-miss-rate discipline every approximate path here
    * follows. Deterministic (fixed grid, exact integer cells, fixed-
    * order IEEE interpolation), so it oracles bitwise — unlike
    * arrival-order-dependent sketches (t-digest, random KLL). At
    * 100 TB the sketch is what actually ships: one scan, cells merge
    * across slices/days by addition, error ≤ one bucket width of the
    * FULL domain split [[SketchBuckets]] ways. */
  def quantileSketchOn(values: DataFrame, c: String,
      buckets: Long = SketchBuckets,
      pcts: Seq[Int] = QuantilePcts): DataFrame = {
    val s = values.sparkSession
    import s.implicits._
    // protocol-duration cache + ONE head aggregate shared between the
    // sketch grid and the exact side (the exact protocol needed the
    // identical min/max/count — r19 removed its duplicate scan)
    val v = values.persist()
    try {
      // count(col) not count(*): the null-count discipline of
      // [[exactQuantilesOn]] — [[quantileSketchCells]] drops nulls, so
      // n must too or every rank shifts
      val head = v
        .agg(min(col(c)).as("lo"), max(col(c)).as("hi"),
          count(col(c)).as("n")).head
      if (head.isNullAt(2) || head.getLong(2) == 0L)
        return Seq.empty[(Int, Long, Long, Double, Double)]
          .toDF("pct", "k", "exact", "sketch", "err")
      val (lo, hi, n) = (head.getLong(0), head.getLong(1), head.getLong(2))
      val w = (hi - lo) / buckets + 1L
      // ≤ buckets cells: the codebook-class collect, like the narrowing
      // rounds' histograms
      val cells = quantileSketchCells(v, c, lo, w, buckets).collect()
        .map(r => (r.getAs[Long]("b"), r.getAs[Long]("bn"))).toSeq
      val exact = exactQuantilesFrom(v, c, head, pcts = pcts).collect()
        .map(r => r.getAs[Int]("pct") -> r.getAs[Long](c)).toMap
      pcts.sorted.map { p =>
        val k = quantileRank(n, p)
        val est = sketchEstimate(cells, lo, w, k)
        val ex = exact(p)
        (p, k, ex, est, est - ex.toDouble)
      }.toDF("pct", "k", "exact", "sketch", "err")
    } finally { v.unpersist(); () }
  }

  def groupQuantileSketch(s: SparkSession, dir: String): DataFrame =
    groupQuantileSketchOn(
      load(s, dir).select(col("event_type"), col("ts_us"))
        .where(col("ts_us").isNotNull && col("event_type").isNotNull),
      "event_type", "ts_us")

  /** GROUPED quantile sketch — [[quantileSketchOn]] per key, all keys
    * in one pass: the per-key monitoring summary (p50/p99 per event
    * type / per tenant) a dashboard holds as ≤ groups·B mergeable
    * cells. Each group grids its OWN [lo, hi] (a shared grid would
    * waste resolution on narrow groups); the per-group grid geometry
    * joins back through the size gate (the grouped exact core's
    * pattern — a literal-map lookup would linear-scan the group keys
    * per fact row), the cell
    * aggregate is ONE partial-aggregated shuffle on (group, bucket),
    * and the budget guard fires BEFORE the driver materializes
    * anything — the bounds fetch is LIMITed to budget/buckets + 1
    * rows, so a high-cardinality group column fails loud without the
    * driver ever holding more than the budget's worth of rows
    * ([[QuantileDriverCellBudget]]; the grouped exact protocol's wave
    * discipline). Estimates ride next to
    * [[groupQuantilesOn]]'s exact values with signed errors — the
    * measured-miss-rate discipline, per group. */
  def groupQuantileSketchOn(values: DataFrame, g: String, c: String,
      buckets: Long = SketchBuckets,
      budget: Long = QuantileDriverCellBudget): DataFrame = {
    // targets fixed to QuantilePcts: the exact side
    // ([[groupQuantilesOn]]) answers those, and the two relations must
    // share ranks row-for-row
    val pcts = QuantilePcts
    val s = values.sparkSession
    import s.implicits._
    require(values.schema(g).dataType ==
        org.apache.spark.sql.types.StringType,
      s"grouped sketch requires a StringType group column; '$g' is " +
        values.schema(g).dataType.simpleString)
    require(buckets > 0, s"sketch needs buckets > 0, got $buckets")
    // NOT cached: an r19 experiment persisted `clean` for the
    // protocol's duration and measured a ~1.2-1.3x REGRESSION — the
    // columnar cache build over the string group column costs more
    // than the three parquet re-scans it saves at this shape (the
    // scalar protocol, long-only, keeps its cache)
    val clean = values.where(col(c).isNotNull && col(g).isNotNull)
    val bounds = clean.groupBy(col(g))
      .agg(min(col(c)).as("lo"), max(col(c)).as("hi"),
        count(col(c)).as("n"))
    // budget guard BEFORE the driver materializes anything: fetch at
    // most maxGroups+1 bound rows — a high-cardinality group column
    // trips the budget with the driver never holding more than the
    // budget's worth of rows (the grouped exact protocol's wave
    // discipline, applied here as a limit). An unguarded
    // bounds.collect() would OOM a 100 TB driver before any
    // after-the-fact require could fire.
    val maxGroups = math.max(budget / buckets, 0L)
    val boundRows = bounds
      .limit(math.min(maxGroups + 1L, Int.MaxValue.toLong).toInt)
      .collect()
    require(boundRows.length <= maxGroups,
      s"grouped sketch has more than $maxGroups groups at $buckets " +
        s"cells each — over budget $budget; shrink buckets or " +
        "pre-partition the group space")
    val groups = boundRows
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3))).toMap
    if (groups.isEmpty)
      return Seq.empty[(String, Int, Long, Long, Double, Double)]
        .toDF(g, "pct", "k", "exact", "sketch", "err")
    // per-group grid geometry joins in through the size gate (the
    // grouped exact core's pattern) — a literal-map lookup would
    // linear-scan the group keys per fact row
    val geo = groups.toSeq.map {
      case (gv, (lo, hi, _)) => (gv, lo, (hi - lo) / buckets + 1L)
    }.toDF(g, "__lo", "__w")
    val cells = clean
      .join(VectorSearch.broadcastIfSmall(geo), Seq(g))
      .select(col(g), call_function("div",
        col(c) - col("__lo"), col("__w")).as("b"))
      .groupBy(col(g), col("b")).agg(count(lit(1)).as("bn"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSeq }
    // the exact side reads the SAME null-cleaned relation as the
    // cells — a null group/value row visible to one side only would
    // desync the ranks
    val exact = groupQuantilesOn(clean, g, c).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(3)).toMap
    groups.keys.toSeq.sorted.flatMap { gv =>
      val (gLo, gHi, n) = groups(gv)
      val gw = (gHi - gLo) / buckets + 1L
      pcts.sorted.map { p =>
        val k = quantileRank(n, p)
        val est = sketchEstimate(cells(gv), gLo, gw, k)
        val ex = exact((gv, p))
        (gv, p, k, ex, est, est - ex.toDouble)
      }
    }.toDF(g, "pct", "k", "exact", "sketch", "err")
      .orderBy(g, "pct")
  }

  /** WEIGHTED exact quantiles — the value v* at which the cumulative
    * WEIGHT first reaches p% of the total (ties share their cumulative
    * per SQL RANGE-frame semantics, so v* = min v with cum(w) ≥ k —
    * deterministic, engine-portable). Same narrowing protocol as
    * [[exactQuantilesOn]] with `sum(w)` everywhere `count` was: one
    * range-pushed scan per round, ≤ `buckets` cells to the driver,
    * selection once an interval's WEIGHT is under the cap (weights are
    * required ≥ 1, so weight bounds rows). Integer weights keep every
    * cumulative exact — the caller guarantees Σw < 2^63 (ANSI throws
    * on overflow rather than wrapping). The canonical use is
    * token-weighted corpus statistics: "the document length below
    * which half the TOKENS live" (`pl_token_weighted_len`), which
    * doc-count quantiles misstate badly on long-tailed corpora. */
  def weightedQuantilesOn(values: DataFrame, c: String, w: String,
      selectCap: Long = QuantileSelectCap,
      buckets: Long = QuantileBuckets,
      pcts: Seq[Int] = QuantilePcts): DataFrame = {
    requireValidPcts(pcts)
    val s = values.sparkSession
    import s.implicits._
    // a NULL value's weight must not seed the total: the row is
    // invisible to every later stage (the count(col) discipline)
    val vals = values.where(col(w) >= 1L && col(c).isNotNull)
    val head = vals
      .agg(min(col(c)).as("lo"), max(col(c)).as("hi"),
        coalesce(sum(col(w)), lit(0L)).as("tw")).head
    if (head.isNullAt(0) || head.getLong(2) == 0L)
      return Seq.empty[(Int, Long, Long)].toDF("pct", "k", c)
    val tw = head.getLong(2)
    var open = pcts.map(p =>
      (p, quantileRank(tw, p), head.getLong(0), head.getLong(1)))
    val origK = open.map(t => t._1 -> t._2).toMap
    var done = Seq.empty[(Int, Long, Long)]
    var rounds = 0
    val maxRounds = quantileMaxRounds(buckets)
    while (open.nonEmpty && rounds < maxRounds) {
      rounds += 1
      val (pinched, active) = open.partition(t => t._3 == t._4)
      done = done ++ pinched.map(t => (t._1, origK(t._1), t._3))
      // per-target interval WEIGHT decides selection vs histogram
      val weights =
        if (active.isEmpty) Map.empty[Int, Long]
        else {
          val tagged = active.zipWithIndex.map { case ((_, _, lo, hi), i) =>
            when(col(c).between(lo, hi),
              struct(lit(i).as("tid"), col(w).as("wt"))) }
          vals
            .where(col(c).between(active.map(_._3).min, active.map(_._4).max))
            .select(explode(array_compact(array(tagged: _*))).as("tw"))
            .groupBy(col("tw.tid").as("tid"))
            .agg(sum(col("tw.wt")).as("iw"))
            .collect().map(r => active(r.getAs[Int]("tid"))._1 ->
              r.getAs[Long]("iw")).toMap
        }
      val (small, big) = active.partition(t =>
        weights.getOrElse(t._1, 0L) <= selectCap)
      if (small.nonEmpty) {
        val sel = small.zipWithIndex.map { case ((_, k, lo, hi), i) =>
          (i, k, lo, hi) }.toDF("tid", "k", "slo", "shi")
        val wCum = Window.partitionBy(col("tid")).orderBy(col(c))
        val picked = vals
          .join(VectorSearch.broadcastIfSmall(sel),
            col(c).between(col("slo"), col("shi")))
          // RANGE default frame: tied values share their cumulative,
          // matching the oracle's windowed running sum exactly
          .withColumn("cw", sum(col(w)).over(wCum))
          .where(col("cw") >= col("k"))
          .groupBy(col("tid")).agg(min(col(c)).as("v"))
          .collect()
          .map { r =>
            val t = small(r.getAs[Int]("tid"))
            (t._1, origK(t._1), r.getAs[Long]("v")) }
        done = done ++ picked
      }
      open = if (big.isEmpty) Nil else {
        val tagged = big.zipWithIndex.map { case ((_, _, lo, hi), i) =>
          val width = (hi - lo) / buckets + 1L
          when(col(c).between(lo, hi),
            struct(lit(i).as("tid"),
              call_function("div", col(c) - lit(lo), lit(width)).as("b"),
              col(w).as("wt"))) }
        val hist = vals
          .where(col(c).between(big.map(_._3).min, big.map(_._4).max))
          .select(explode(array_compact(array(tagged: _*))).as("tb"))
          .groupBy(col("tb.tid").as("tid"), col("tb.b").as("b"))
          .agg(sum(col("tb.wt")).as("bw"))
          .collect().groupBy(_.getAs[Int]("tid"))
        big.zipWithIndex.map { case ((p, k, lo, hi), i) =>
          val width = (hi - lo) / buckets + 1L
          val cells = hist(i).map(r =>
            r.getAs[Long]("b") -> r.getAs[Long]("bw")).sortBy(_._1)
          val cums = cells.scanLeft((0L, 0L, 0L)) {
            case ((_, _, cum), (b, bw)) => (b, bw, cum + bw) }.drop(1)
          val (b, bw, cumIncl) = cums.find(_._3 >= k).get
          (p, k - (cumIncl - bw), lo + b * width,
            math.min(hi, lo + (b + 1) * width - 1L))
        }
      }
    }
    require(open.isEmpty,
      s"weighted quantile narrowing did not converge: $open")
    done.toDF("pct", "k", c).orderBy("pct")
  }

  /** Histogram width for the GROUPED narrowing: smaller than the
    * scalar knob because the driver collect is targets × B cells and
    * targets grows with group cardinality. */
  val GroupQuantileBuckets = 512L

  /** Driver budget for one grouped-histogram collect, in cells
    * (target × bucket longs): rounds split into waves of
    * budget/buckets targets, so a million-group table costs more
    * scans, never a driver OOM. */
  val QuantileDriverCellBudget = 1L << 22

  /** GROUPED exact order statistics — per-`event_type` p50/p90/p99 of
    * `ts_us` — the same histogram-narrowing protocol as
    * [[exactQuantilesOn]] but with every group's still-open targets
    * resolved in the SAME scan per round, and the per-round target
    * state carried as a size-gated broadcast relation
    * ([[VectorSearch.broadcastIfSmall]]) instead of a `when`-chain, so
    * group cardinality widens a join, never the projection.
    *
    * Per round: values ⋈ targets on group equality (+ interval range
    * as the probe-side residual) → groupBy(target, bucket) partial+
    * final aggregate → ≤ targets × [[GroupQuantileBuckets]] cells to
    * the driver. The histogram doubles as the interval row count, so
    * a target whose interval has dropped under [[QuantileSelectCap]]
    * rows resolves in the shared per-round selection scan
    * (row_number over its ≤cap rows at the rebased rank); width-1
    * intervals are answers outright. All-identical groups pinch in
    * round one (lo == hi).
    *
    * Scale shape: one scan per round TOTAL across all groups (not per
    * group — the failure mode of per-group percentile_exact), join
    * mass only the rows still inside some open interval, intervals
    * shrink ×B per round. Integer arithmetic throughout ⇒ bitwise
    * equal to DuckDB's per-group rank walk. */
  def groupQuantiles(s: SparkSession, dir: String): DataFrame =
    groupQuantilesOn(
      load(s, dir).select(col("event_type"), col("ts_us"))
        .where(col("ts_us").isNotNull && col("event_type").isNotNull),
      "event_type", "ts_us")

  def groupQuantilesOn(values: DataFrame, g: String, c: String,
      selectCap: Long = QuantileSelectCap,
      buckets: Long = GroupQuantileBuckets,
      cellBudget: Long = QuantileDriverCellBudget,
      pcts: Seq[Int] = QuantilePcts): DataFrame =
    groupQuantilesCore(values, g, c, lit(1L), selectCap, buckets,
      cellBudget, pcts)

  /** GROUPED + WEIGHTED exact order statistics — the
    * [[weightedQuantilesOn]] semantics per group, all groups per scan:
    * per-language token-weighted corpus statistics in one protocol run
    * (`pl_token_weighted_by_lang`). Weights must be ≥ 1 (the weight
    * cap then bounds selection rows); the caller pre-filters. */
  def groupWeightedQuantilesOn(values: DataFrame, g: String, c: String,
      w: String, selectCap: Long = QuantileSelectCap,
      buckets: Long = GroupQuantileBuckets,
      cellBudget: Long = QuantileDriverCellBudget,
      pcts: Seq[Int] = QuantilePcts): DataFrame =
    groupQuantilesCore(values.where(col(w) >= 1L), g, c, col(w),
      selectCap, buckets, cellBudget, pcts)

  /** Shared grouped core: `wt` = lit(1) gives count semantics (the
    * k-th order statistic), a weight column gives cumulative-weight
    * quantiles — selection is uniformly "min v whose RANGE-frame
    * cumulative weight reaches k", which with unit weights IS the
    * k-th value, so one mechanism serves both (property-pinned both
    * ways). */
  private def groupQuantilesCore(values: DataFrame, g: String, c: String,
      wt: Column, selectCap: Long, buckets: Long,
      cellBudget: Long, pcts: Seq[Int] = QuantilePcts): DataFrame = {
    requireValidPcts(pcts)
    val s = values.sparkSession
    import s.implicits._
    // the driver-side target state carries the group value as String
    // (and toDF re-types the output column) — a non-string group would
    // ClassCastException deep in the collect, so reject it at the door
    require(values.schema(g).dataType ==
        org.apache.spark.sql.types.StringType,
      s"grouped quantiles require a StringType group column; '$g' is " +
        values.schema(g).dataType.simpleString +
        " — cast it (or map it through a string key) first")
    // null discipline at the door: a NULL group or value row is
    // invisible to every later stage (bucket tags, selection scans),
    // so it must not seed n/Σw either — counting it would shift every
    // rank and strand its target (the count(col) fix, grouped form)
    val clean = values.where(col(g).isNotNull && col(c).isNotNull)
    // budget guard BEFORE the driver materializes anything: each group
    // seeds `pcts.size` driver-side targets, so fetch at most
    // maxGroups+1 bound rows — a high-cardinality group column
    // (user_id) trips the budget with the driver never holding more
    // than the budget's worth of rows (the sketch face's
    // LIMIT-then-require pattern, [[groupQuantileSketchOn]]; an
    // unguarded seed collect() would OOM a 100 TB driver before any
    // after-the-fact require could fire).
    val maxGroups = math.max(cellBudget / pcts.size, 0L)
    val boundRows = clean.groupBy(col(g))
      .agg(min(col(c)).as("lo"), max(col(c)).as("hi"),
        coalesce(sum(wt), lit(0L)).as("n"))
      .limit(math.min(maxGroups + 1L, Int.MaxValue.toLong).toInt)
      .collect()
    require(boundRows.length <= maxGroups,
      s"grouped quantiles have more than $maxGroups groups at " +
        s"${pcts.size} targets each — over budget $cellBudget; " +
        "pre-partition the group space or raise cellBudget")
    // one scan seeded the per-group bounds + total weight target state
    var open = boundRows.toSeq.flatMap { r =>
        val (gv, lo, hi, n) =
          (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
        pcts.map(p => (gv, p, quantileRank(n, p), lo, hi, n))
      }
    val origK = open.map(t => (t._1, t._2) -> t._3).toMap
    var done = Seq.empty[(String, Int, Long, Long)] // (gv, pct, k, value)
    var rounds = 0
    val maxRounds = quantileMaxRounds(buckets)
    while (open.nonEmpty && rounds < maxRounds) {
      rounds += 1
      val (pinched, unpinched) = open.partition(t => t._4 == t._5)
      done = done ++ pinched.map(t => (t._1, t._2, origK((t._1, t._2)), t._4))
      // interval under the cap (weight carried from last round's
      // histogram, or the seed scan) → this round's selection scan
      val (small, big) = unpinched.partition(_._6 <= selectCap)
      if (small.nonEmpty) {
        val sel = small.zipWithIndex.map { case ((gv, _, k, lo, hi, _), i) =>
          (i, gv, k, lo, hi) }
          .toDF("tid", "gv", "k", "slo", "shi")
        val wCum = Window.partitionBy(col("tid")).orderBy(col(c))
        val picked = values
          .join(VectorSearch.broadcastIfSmall(sel),
            col(g) === col("gv") && col(c).between(col("slo"), col("shi")))
          // RANGE default frame: ties share their cumulative — with
          // unit weights "cw ≥ k, min v" is exactly the k-th value
          .withColumn("cw", sum(wt).over(wCum))
          .where(col("cw") >= col("k"))
          .groupBy(col("tid")).agg(min(col(c)).as("v"))
          .collect()
          .map { r =>
            val t = small(r.getAs[Int]("tid"))
            (t._1, t._2, origK((t._1, t._2)), r.getAs[Long]("v")) }
        done = done ++ picked
      }
      // histogram round for the rest — in WAVES bounded by the driver
      // cell budget: the collect is targets × buckets cells, and a
      // million-group table must not turn it into a driver OOM. Each
      // wave is still one scan for all of ITS targets; waves only
      // bound per-collect driver memory, never the narrowing rate.
      val waveTargets = math.max(1, (cellBudget / buckets).toInt)
      open = if (big.isEmpty) Nil
      else big.grouped(waveTargets).toSeq.flatMap { wave =>
        val tgt = wave.zipWithIndex.map { case ((gv, _, _, lo, hi, _), i) =>
          (i, gv, lo, hi, (hi - lo) / buckets + 1L) }
          .toDF("tid", "gv", "lo", "hi", "width")
        val hist = values
          .join(VectorSearch.broadcastIfSmall(tgt),
            col(g) === col("gv") && col(c).between(col("lo"), col("hi")))
          .groupBy(col("tid"),
            call_function("div", col(c) - col("lo"), col("width")).as("b"))
          .agg(sum(wt).as("cnt"))
          .collect().groupBy(_.getAs[Int]("tid"))
        wave.zipWithIndex.map { case ((gv, p, k, lo, hi, _), i) =>
          val width = (hi - lo) / buckets + 1L
          val cells = hist(i).map(r =>
            r.getAs[Long]("b") -> r.getAs[Long]("cnt")).sortBy(_._1)
          val cums = cells.scanLeft((0L, 0L, 0L)) {
            case ((_, _, cum), (b, cnt)) => (b, cnt, cum + cnt) }.drop(1)
          val (b, cnt, cumIncl) = cums.find(_._3 >= k).get
          (gv, p, k - (cumIncl - cnt), lo + b * width,
            math.min(hi, lo + (b + 1) * width - 1L), cnt)
        }
      }
    }
    require(open.isEmpty, s"grouped quantile narrowing did not converge: $open")
    done.toDF(g, "pct", "k", c).orderBy(g, "pct")
  }

  /** DESCRIBE HISTORY as a declared face — the retained pointer log
    * read back as data, under the driver's oracle gate: per version,
    * the state-delta op classification (`create` then 7 `append`s for
    * the slice-ingested fixture), the live segment count, and the
    * version's OWN row count re-read through
    * [[graft.sources.ManifestStore.readAsOfInferred]] — which the
    * oracle re-derives from the raw parquet with the slice-cutoff
    * arithmetic (`ev_time_travel_ts`'s cumulative-prefix form, one row
    * per version). The DURABLE COMMIT INSTANTS are enforced in-query:
    * serialized fixture commits must carry strictly increasing
    * `commit_ts_ms`, on any filesystem, or the face fails loud —
    * instants are layout metadata the oracle cannot see, so the
    * fail-loud require is what puts their monotonicity under the gate
    * permanently (the rel_zorder_split discipline). Resolution cost:
    * ONE history pass (per-version segment sets replayed from its own
    * added/removed deltas) + one `rows:` sidecar read per DISTINCT
    * segment ever retained — zero Spark jobs, zero segments read, no
    * per-version snapshot index (which would be O(versions²) pointer
    * reads); a pre-token segment falls back to one pruned-snapshot
    * scan for its versions. Bounded by vacuum retention. */
  def historyOps(s: SparkSession, dir: String): DataFrame = {
    val (path, _, _) = manifestEventsTable(s, dir)
    historyOpsOn(s, path, "events")
  }

  /** [[historyOps]]' core over any serialized-committer manifest
    * collection. The PRE-UPGRADE FALLBACK is per version: a version
    * whose live set includes any segment without a `rows:` sidecar
    * token (pre-token segment, stripped/torn sidecar) is re-counted by
    * ONE pruned snapshot scan ([[graft.sources.ManifestStore
    * .readAsOfInferred]]`.count()`) instead of sidecar sums — at most
    * one scan per RETAINED version, bounded by vacuum retention, and
    * row-identical to the sidecar-served path (EventsSpec pins the
    * stripped-token fixture). */
  def historyOpsOn(s: SparkSession, path: String, c: String): DataFrame = {
    val h = graft.sources.ManifestStore.history(s, path, c)
      .orderBy("ptr_seq").collect()
    val inst = h.map(_.getLong(6)).toSeq
    require(inst == inst.sorted && inst.distinct == inst,
      "serialized fixture commits must carry strictly increasing " +
        s"durable instants; history read back $inst")
    // per-version live sets from the log's own state deltas
    var live = Set.empty[Long]
    val perVersion = h.toSeq.map { r =>
      live = live ++ r.getSeq[Long](3) -- r.getSeq[Long](4)
      (r.getLong(0), r.getString(1), r.getInt(2), live)
    }
    val rowsOf = graft.sources.ManifestStore.segRowCounts(
      s, path, c, perVersion.flatMap(_._4).distinct)
    import s.implicits._
    perVersion.map { case (seq, op, nLive, segs) =>
      val counts = segs.toSeq.map(rowsOf.getOrElse(_, None))
      val n = if (counts.forall(_.isDefined)) counts.flatten.sum
        else graft.sources.ManifestStore
          .readAsOfInferred(s, path, c, seq).count()
      (seq, op, nLive, n)
    }.toDF("ptr_seq", "op", "n_live", "n_events").orderBy("ptr_seq")
  }

  /** METADATA-SERVED table bounds: the dashboard freshness probe —
    * `min(ts_us), max(ts_us), count(*)` — answered entirely from the
    * snapshot's sidecars through [[graft.sources.GraftFileIndex]]'s
    * metadata faces (`rows:` tokens + 'l'-kind zone-map bounds): zero
    * segments listed, planned, or read. The same trio a SQL user gets
    * from [[graft.plans.MetadataAggRule]] as a plan-time
    * LocalRelation; here the imperative faces sit under the DuckDB
    * oracle. Fails LOUD if the fixture's sidecars ever stop proving
    * the answer (every segment carries tokens by construction). */
  def metaBounds(s: SparkSession, dir: String): DataFrame = {
    val (path, _, _) = manifestEventsTable(s, dir)
    val idx = new graft.sources.GraftFileIndex(s, path, "events")
    val n = idx.metadataRowCount.getOrElse(
      sys.error("events fixture segments must carry rows: tokens"))
    val (lo, hi) = idx.metadataLongBounds("ts_us").flatten.getOrElse(
      sys.error("events fixture segments must carry ts_us 'l' bounds"))
    import s.implicits._
    Seq((lo, hi, n)).toDF("min_ts_us", "max_ts_us", "n_events")
  }

  /** [[pointLookup]] THROUGH the `format("graft")` connector: the same
    * four id probes as one declarative `IN`-list — planning-time
    * pruning now comes from the Catalyst `In` filter consulting the
    * event_id BLOOM sidecars independently of zone-map coverage
    * (event_id is bloom-configured but NOT zone-mapped, so before the
    * independent probe this shape scanned every segment). The absent
    * ids exclude every segment; the present ids keep only segments
    * whose blooms answer "maybe here". Same oracle as the imperative
    * face. */
  def connectorPointLookup(s: SparkSession, dir: String): DataFrame = {
    val (path, _, _) = manifestEventsTable(s, dir)
    val b = load(s, dir)
      .agg(min("event_id").as("lo"), max("event_id").as("hi")).head
    val (lo, hi) = (b.getLong(0), b.getLong(1))
    val probes = Seq(lo, hi, lo + (hi - lo) / 2, -1L).distinct
    s.read.format("graft").option("path", path)
      .option("collection", "events").load()
      .where(col("event_id").isin(probes: _*))
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("ts_us"))
      .orderBy("event_id")
  }

  /** DOCUMENT point lookup by the reference's native identity — a
    * uuid-like STRING key (main.go:330; the `{collection}/{uuid}` object
    * key, main.go:334) — over the manifest document store, pruned by
    * STRING bloom sidecars on BOTH faces: the first and last doc keys
    * probe the imperative face ([[graft.sources.ManifestStore
    * .readPointString]]) and the connector face probes the same keys
    * plus a definitely-absent uuid through a declarative `IN` filter
    * (the Catalyst `In` consults the 's'-kind blooms segment by
    * segment). The fixture's two segments hold interleaved doc_id
    * ranges (%10 split), so key-range zone maps cannot separate a
    * point probe — the blooms are the discriminator, and the absent
    * key lists and plans ZERO files (GraftSourceSpec pins the scanned
    * counts). At 100 TB this is "show me document X" costing one
    * segment instead of the corpus. Both faces union under one oracle
    * — face parity is part of the assertion. */
  def docPointLookup(s: SparkSession, dir: String): DataFrame = {
    val (path, _) = Dedup.manifestDocsTable(s, dir)
    val b = Tables(s, dir, "documents")
      .agg(min("doc_id").as("lo"), max("doc_id").as("hi")).head
    // the ONE key spelling every face shares (Dedup.docKey*) —
    // distinct because lo == hi on a single-document corpus, where a
    // repeated probe would double the imperative face's rows while
    // the connector's IN (and the oracle's) dedup theirs
    val present = Seq(b.getLong(0), b.getLong(1)).distinct
      .map(Dedup.docKeyLocal)
    val imperative = present.map { k =>
      graft.sources.ManifestStore
        .readPointString(s, path, "docs", k, "doc_key")
        .select(col("doc_key"), col("doc_id"), col("lang"))
    }.reduce(_.unionByName(_))
    val connector = s.read.format("graft").option("path", path)
      .option("collection", "docs").load()
      .where(col("doc_key").isin(present :+ "doc-absent": _*))
      .select(col("doc_key"), col("doc_id"), col("lang"))
    imperative.unionByName(connector).orderBy("doc_key", "doc_id")
  }

  /** NEEDLE-IN-THE-LOG point lookups over the manifest store, pruned
    * by the event_id BLOOM sidecars ([[graft.sources.ManifestStore
    * .readPointLong]]): four probes — the log's first and last event
    * ids, the (usually absent) arithmetic midpoint, and a definitely-
    * absent key — each consulting per-segment blooms so only segments
    * that may hold the id are listed or planned (an absent id reads
    * NOTHING: every bloom answers "definitely not here"). At 100 TB
    * this is the audit/debug query ("show me event X") costing one
    * segment instead of the log. The probe ids are 1-row aggregate
    * metadata (the codebook-class collect); the oracle re-derives them
    * as scalar subqueries. */
  def pointLookup(s: SparkSession, dir: String): DataFrame = {
    val (path, _, _) = manifestEventsTable(s, dir)
    val b = load(s, dir)
      .agg(min("event_id").as("lo"), max("event_id").as("hi")).head
    val (lo, hi) = (b.getLong(0), b.getLong(1))
    val probes = Seq(lo, hi, lo + (hi - lo) / 2, -1L).distinct
    probes.map { k =>
      graft.sources.ManifestStore
        .readPointLong(s, path, "events", k, "event_id")
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("ts_us"))
    }.reduce(_.union(_))
      .orderBy("event_id")
  }

  /** INCREMENTAL AGGREGATE MAINTENANCE over the manifest change feed:
    * a mergeable per-type aggregate (count / exact decimal sum /
    * min / max) held as of an earlier pointer version is brought
    * current by aggregating ONLY the segments appended since
    * (`ManifestStore.readSinceInferred`) and merging partials — the
    * "never recompute 100 TB for today's batch" pattern (Delta/
    * Iceberg incremental ETL), proven equal to the full recompute by
    * the oracle. The anchor is the pointer version after half the
    * ingest; both sides aggregate partial+final before the
    * domains-sized merge, so the big side's rows were already reduced
    * when the base snapshot was first built — at scale the base
    * PARTIALS would be what's persisted, and only the delta scan
    * touches data. Mergeability is the whole contract: count/sum/min/
    * max (decimal-exact sums) recombine associatively, so base+delta
    * ≡ full — bit-for-bit, not approximately. */
  /** The anchored time-travel reads the incremental-maintenance family
    * shares: (base = the snapshot at the mid-log anchor version, delta
    * = segments appended since, cur = the latest snapshot). ONE
    * definition of the anchor arithmetic — the oracles' "first
    * RangeSegs/2 time slices" cutoff (EventsSpec-pinned) depends on
    * every caller choosing the SAME version. */
  private def anchoredReads(s: SparkSession,
      dir: String): (DataFrame, DataFrame, DataFrame) = {
    val (path, _, _) = manifestEventsTable(s, dir)
    val anchor = anchorVersion(s, path)
    val latest = graft.sources.ManifestStore
      .listVersions(s, path, "events").filterNot(_.tombstone).last.ptrSeq
    (graft.sources.ManifestStore
        .readAsOfInferred(s, path, "events", anchor),
      graft.sources.ManifestStore
        .readSinceInferred(s, path, "events", anchor),
      graft.sources.ManifestStore
        .readAsOfInferred(s, path, "events", latest))
  }

  def incrementalAgg(s: SparkSession, dir: String): DataFrame = {
    val (base, delta, _) = anchoredReads(s, dir)
    def partial(df: DataFrame): DataFrame = df.groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 6))).as("sum_dec"),
        min("ts_us").as("min_ts_us"), max("ts_us").as("max_ts_us"))
    partial(base).unionByName(partial(delta))
      .groupBy("event_type")
      .agg(sum(col("n_events")).as("n_events"),
        sum(col("sum_dec")).cast("double").as("sum_value"),
        min("min_ts_us").as("min_ts_us"), max("max_ts_us").as("max_ts_us"))
      .orderBy("event_type")
  }

  /** Engine-portable id hash for the KMV sketch, uniform on
    * [0, HashMod): the pre-mod keeps the product under 2^63 for any
    * id, and the multiplier is ~3P/4 so even SMALL sequential ids wrap
    * around P and spread uniformly — a small multiplier would leave
    * the bottom-k hashes clustered near 0 and the (k-1)·P/kth estimate
    * wildly inflated. Mirrored verbatim in the DuckDB oracle. */
  private[graft] def userIdHash: Column = {
    val P = graft.functions.TextFunctions.HashMod
    ((col("user_id") % lit(P)) * lit(756839017L) + lit(11L)) % lit(P)
  }

  /** INCREMENTAL DISTINCT-COUNT MAINTENANCE over the manifest change
    * feed — [[incrementalAgg]]'s missing aggregate: COUNT(DISTINCT) is
    * not mergeable, so the incremental face carries the KMV sketch
    * ([[graft.functions.SketchAggregate]]) instead, whose bounded
    * bottom-k state IS mergeable: bottom-k(base ∪ delta) ≡
    * bottom-k(bottom-k(base) ∪ bottom-k(delta)) — an algebraic
    * identity, so base+delta equals the full recompute BIT-FOR-BIT,
    * not approximately (the estimate only approximates the true
    * distinct count; the oracle recomputes the same estimate from
    * scratch and hashes it exactly). Per-type distinct users: the base
    * snapshot's per-type samples (≤ k longs each — what a production
    * deployment would persist) merge with samples aggregated from ONLY
    * the appended segments. Hashing is affine-mod integer arithmetic
    * (engine-portable; the MINSTD multiplier spreads sequential ids),
    * NOT a float or engine-internal HLL. */
  def incrementalDistinct(s: SparkSession, dir: String,
      k: Int = 64): DataFrame = {
    val (base, delta, _) = anchoredReads(s, dir)
    val hv = userIdHash
    def sample(df: DataFrame): DataFrame = df
      .where(col("user_id").isNotNull && col("event_type").isNotNull)
      .select(col("event_type"), hv.as("hv"))
      .groupBy("event_type")
      .agg(graft.functions.SketchAggregate.kmvSample(col("hv"), k)
        .as("sample"))
    sample(base).unionByName(sample(delta))
      .select(col("event_type"), explode(col("sample")).as("hv"))
      .groupBy("event_type")
      .agg(graft.functions.SketchAggregate.kmvSketch(col("hv"), k).as("sk"))
      .select(col("event_type"), col("sk.kth_hash").as("kth_hash"),
        col("sk.est").as("n_users_est"))
      .orderBy("event_type")
  }

  /** LINEARLY-INTERPOLATED hourly resample — [[gapFilledHourly]]'s
    * metric-series sibling: zero-filling is right for COUNTS (a missing
    * hour had zero events) but wrong for a sampled MEASUREMENT (a
    * missing hour is unknown, not zero), so each type's missing hours
    * take the straight line between the neighbouring observed hourly
    * means (edge gaps carry the nearest observation). Determinism: the
    * observed mean is one decimal-sum-over-count division, and the
    * interpolation pv + (nv−pv)·((hr−ph)/(nh−ph)) is a FIXED tree of
    * correctly-rounded IEEE ops over identically-derived operands —
    * mirrored token-for-token in the oracle, so even the interpolated
    * values hash bitwise. Scale shape: one partial-aggregated
    * (type, hour) shuffle over the corpus, then grid + both
    * neighbour windows on the types×hours relation (bounded by
    * retention, not event volume); all four neighbour columns ride ONE
    * window partitioning. */
  def gapInterpolatedHourly(s: SparkSession, dir: String): DataFrame = {
    val hourUs = 3600L * 1000000
    val hourly = load(s, dir)
      .where(col("ts_us").isNotNull && col("event_type").isNotNull &&
        col("value").isNotNull)
      .select(expr("ts_us div 3600000000").as("hr"), col("event_type"),
        col("value"))
      .groupBy("hr", "event_type")
      .agg(count(lit(1)).as("n_obs"),
        sum(col("value").cast(DecimalType(18, 6))).as("sv"))
      .select(col("hr"), col("event_type"), col("n_obs"),
        (col("sv").cast("double") / col("n_obs").cast("double"))
          .as("mean_obs"))
      .persist() // tiny (hours × types); released via releaseCaches()
    retained.add(hourly)
    val meta = hourly.agg(min(col("hr")).as("lo"), max(col("hr")).as("hi"),
      sort_array(collect_set(col("event_type"))).as("types")).head
    if (meta.isNullAt(0)) // empty input: a defined empty frame
      return hourly.select((col("hr") * hourUs).as("hr_us"),
        col("event_type"), col("n_obs"), col("mean_obs").as("value"),
        lit("obs").as("src")).where(lit(false))
    val types = meta.getAs[scala.collection.Seq[String]]("types")
    val grid = s.range(1).select(explode(sequence(
        lit(meta.getAs[Long]("lo")), lit(meta.getAs[Long]("hi"))))
        .as("hr"))
      .crossJoin(s.createDataFrame(types.map(Tuple1(_)).toSeq)
        .toDF("event_type"))
    val w = Window.partitionBy("event_type").orderBy("hr")
    val wPrev = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val obsHr = when(col("mean_obs").isNotNull, col("hr"))
    grid.join(hourly, Seq("hr", "event_type"), "left_outer")
      .withColumn("pv", last(col("mean_obs"), ignoreNulls = true).over(wPrev))
      .withColumn("ph", last(obsHr, ignoreNulls = true).over(wPrev))
      .withColumn("nv", first(col("mean_obs"), ignoreNulls = true).over(wNext))
      .withColumn("nh", first(obsHr, ignoreNulls = true).over(wNext))
      .select((col("hr") * hourUs).as("hr_us"), col("event_type"),
        coalesce(col("n_obs"), lit(0L)).as("n_obs"),
        when(col("mean_obs").isNotNull, col("mean_obs"))
          .when(col("pv").isNotNull && col("nv").isNotNull,
            col("pv") + (col("nv") - col("pv")) *
              ((col("hr") - col("ph")).cast("double") /
                (col("nh") - col("ph")).cast("double")))
          .otherwise(coalesce(col("pv"), col("nv"))).as("value"),
        when(col("mean_obs").isNotNull, "obs")
          .when(col("pv").isNotNull && col("nv").isNotNull, "interp")
          .otherwise("edge").as("src"))
      .orderBy("hr_us", "event_type")
  }

  /** Histogram resolution for [[snapshotDrift]]. */
  val DriftBuckets = 16

  /** SNAPSHOT DISTRIBUTION DRIFT — the per-ingest monitoring query a
    * training pipeline runs before trusting new data: the total-
    * variation distance between an earlier manifest VERSION's value
    * distribution and the current one, per event type, over a shared
    * fixed histogram grid. TVD = ½·Σ|p_i − q_i| is the drift metric
    * with an EXACT cross-engine form (PSI/KL need ln — libm-divergent):
    * clearing denominators, Σ|n_b·N_c − n_c·N_b| is pure integer
    * arithmetic (Spark decimal(38,0) ≡ DuckDB HUGEINT products — int64
    * would overflow first at corpus scale), and the ONE terminal
    * division is a correctly-rounded IEEE op, so the drift score
    * itself oracles bitwise. Scale shape: two histogram aggregates
    * (map-side combined to ≤ types×B cells each — the quantile-sketch
    * state bound), a full-outer join and a window on the CELL-sized
    * relation, nothing corpus-sized after the scans; the base
    * histogram is what a production deployment would persist with
    * each version. The base snapshot is the anchor version's time
    * travel read — same anchor arithmetic as [[incrementalAgg]], and
    * EventsSpec pins the version↔time-slice equivalence the oracle's
    * cutoff predicate relies on. */
  def snapshotDrift(s: SparkSession, dir: String,
      buckets: Int = DriftBuckets): DataFrame = {
    val (base, _, cur) = anchoredReads(s, dir)
    // the shared grid comes from the CURRENT snapshot's value bounds —
    // 1-row aggregate metadata (the codebook-class collect); both
    // snapshots bucket on the same grid or the distance is meaningless.
    // The bounds population must be EXACTLY the histogram population
    // (event_type filter included): a null-typed row holding the
    // extreme value would otherwise shift every bucket boundary off
    // the oracle's
    val b = cur.where(col("event_type").isNotNull && col("value").isNotNull)
      .agg(min("value"), max("value")).head
    // an EMPTY current snapshot has null bounds: degrade to the same
    // degenerate one-bucket grid as the all-values-equal case instead
    // of throwing on the unbox — base types then report n_cur = 0 with
    // NULL tvd, a defined frame (the gap-resample face handles its
    // analogous empty corner the same way)
    val (vlo, vhi) =
      if (b.isNullAt(0)) (0.0, 0.0) else (b.getDouble(0), b.getDouble(1))
    val bkt = // clamp(floor((v - lo)·B/span)) — edge value lands in B-1
      if (vhi > vlo)
        least(greatest(floor((col("value") - lit(vlo)) * lit(buckets.toDouble)
          / lit(vhi - vlo)), lit(0L)), lit(buckets - 1L))
      else lit(0L)
    def hist(df: DataFrame, n: String): DataFrame = df
      .where(col("event_type").isNotNull && col("value").isNotNull)
      .groupBy(col("event_type"), bkt.as("bkt"))
      .agg(count(lit(1)).as(n))
    tvdOfHists(hist(base, "n_b"), hist(cur, "n_c"))
  }

  /** The drift-score tail shared by [[snapshotDrift]] and the streaming
    * face's consumer: per-type total-variation distance from two
    * (event_type, bkt, count) histogram relations — pure cell-sized
    * arithmetic, the exact integer TVD form documented at
    * [[snapshotDrift]]. Inputs' count columns must be named n_b / n_c. */
  private[graft] def tvdOfHists(hb: DataFrame, hc: DataFrame): DataFrame = {
    val j = hb.join(hc, Seq("event_type", "bkt"), "full_outer")
      .select(col("event_type"), col("bkt"),
        coalesce(col("n_b"), lit(0L)).as("n_b"),
        coalesce(col("n_c"), lit(0L)).as("n_c"))
    val w = Window.partitionBy(col("event_type"))
    // long-range operand casts; the (19,0)×(19,0) products and their
    // sum widen to decimal(38,0) — EXACT integers to 38 digits, so the
    // numerator itself never overflows at any realistic corpus. The
    // BITWISE-oracle claim is narrower: the terminal numerator→double
    // casts are correctly rounded on both engines only while the
    // summed |n_b·N_c − n_c·N_b| stays under 2^53 (~9e15 — DuckDB's
    // decimal→double cast rounds wrong past it, per the repo's
    // float-determinism lore). Past that (≳1e8-row types) the score is
    // still exact-integer-derived and correct to double rounding on
    // the Spark side; only cross-engine hash parity weakens.
    val dec19 = DecimalType(19, 0)
    j.withColumn("nb_tot", sum(col("n_b")).over(w))
      .withColumn("nc_tot", sum(col("n_c")).over(w))
      .groupBy("event_type")
      .agg(max(col("nb_tot")).as("n_base"), max(col("nc_tot")).as("n_cur"),
        sum(abs(col("n_b").cast(dec19) * col("nc_tot").cast(dec19) -
          col("n_c").cast(dec19) * col("nb_tot").cast(dec19))).as("num"))
      .select(col("event_type"), col("n_base"), col("n_cur"),
        when(col("n_base") > 0 && col("n_cur") > 0,
          col("num").cast("double") /
            (lit(2.0) * col("n_base").cast("double") *
              col("n_cur").cast("double"))).as("tvd"))
      .orderBy("event_type")
  }

  /** Per-type value-histogram cells on a CONFIGURED grid
    * [vlo, vlo + B·w) — [[snapshotDrift]]'s live face, under
    * [[quantileSketchCells]]'s bounded-state discipline: a stream
    * cannot derive min/max up front, so the grid comes from the
    * metric's spec (monitoring-histogram style) and out-of-domain
    * values CLAMP into the edge cells instead of minting unbounded
    * out-of-grid state. Works on batch AND streaming frames (plain
    * grouped count — update mode, no watermark, ≤ types×B rows of
    * state forever; cells are monotone counters merging by addition,
    * so the micro-batch cut is invisible — replay ≡ batch is
    * spec-pinned). A consumer compares the live cells against a
    * persisted base version's cells with [[tvdOfHists]] — the
    * continuous drift monitor the batch `ev_snapshot_drift` validates
    * offline. */
  def driftCells(df: DataFrame, c: String, vlo: Double, w: Double,
      buckets: Long = DriftBuckets, countName: String = "n"): DataFrame = {
    require(w > 0, s"drift grid needs a positive bucket width, got $w")
    df.where(col("event_type").isNotNull && col(c).isNotNull)
      .groupBy(col("event_type"),
        least(greatest(floor((col(c) - lit(vlo)) / lit(w)), lit(0L)),
          lit(buckets - 1)).as("bkt"))
      .agg(count(lit(1)).as(countName))
  }

  /** Trailing window width for [[windowDistinctSketch]], in days. */
  val DistinctWindowDays = 7

  /** TRAILING-WINDOW DISTINCT USERS from daily mergeable sketches —
    * the pre-aggregated sketch-cube pattern: one pass builds a ≤k-long
    * KMV sample PER DAY (the tiny relation a production deployment
    * persists alongside each day's ingest), and ANY trailing window's
    * distinct-user estimate is then the bottom-k of its days' samples
    * unioned — no re-scan of the raw events, whatever the window. The
    * bottom-k union identity ([[incrementalDistinct]]) makes the
    * windowed sketch BIT-equal to a sketch computed from the window's
    * raw rows, which is exactly what the oracle recomputes. Scale
    * shape: one (day) partial-aggregated corpus pass; everything after
    * is days×k longs — the 7× fan-out rides the sample relation, never
    * the events. */
  def windowDistinctSketch(s: SparkSession, dir: String, k: Int = 64,
      windowDays: Int = DistinctWindowDays): DataFrame = {
    val daily = load(s, dir)
      .where(col("ts_us").isNotNull && col("user_id").isNotNull)
      .select(expr("ts_us div 86400000000").as("d"), userIdHash.as("hv"))
      .groupBy("d")
      .agg(graft.functions.SketchAggregate.kmvSample(col("hv"), k)
        .as("s"))
      .persist() // tiny (days × k longs), TWO consumers (day set +
    retained.add(daily) // contributions) — one corpus pass, not two
    val days = daily.select(col("d").as("day"))
    daily
      .select(col("d").as("src_d"),
        explode(sequence(lit(0L), lit(windowDays - 1L))).as("j"), col("s"))
      .select((col("src_d") + col("j")).as("day"), col("src_d"), col("s"))
      // a day's sample feeds the next windowDays trailing windows, but
      // only windows anchored at days that EXIST emit a row
      .join(VectorSearch.broadcastIfSmall(days), Seq("day"), "left_semi")
      .select(col("day"), col("src_d"), explode(col("s")).as("hv"))
      .groupBy("day")
      .agg(count_distinct(col("src_d")).as("n_days"),
        graft.functions.SketchAggregate.kmvSketch(col("hv"), k).as("sk"))
      .select(col("day"), col("n_days"),
        col("sk.kth_hash").as("kth_hash"),
        col("sk.est").as("n_users_est"))
      .orderBy("day")
  }

  /** Per-type HOURLY-RATE TREND: the OLS slope of hourly event counts
    * vs the hour index — the "is this event type growing?" monitoring
    * regression — in EXACT integer arithmetic: slope =
    * (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²) over integer (x, y) points, so
    * every operand of the ONE terminal division is an exactly-computed
    * integer (Spark 64-bit longs, DuckDB int128 sum intermediates) and
    * the division is a single correctly-rounded IEEE op — unlike
    * regr_slope's fold-order-dependent float accumulation, this
    * hash-matches across engines. x is re-based at the corpus's first
    * hour (slope is shift-invariant), and the slope arithmetic over
    * the per-type sums runs in decimal(38,0) — n·Σxy at ~1e6
    * events/hour over ~1e4 retained hours reaches ~1e18, past 2^53 and
    * near int64, where a long multiply would ANSI-throw; the decimal
    * path stays exact to 38 digits. Cross-engine HASH parity is
    * narrower than exactness: both engines' terminal numerator→double
    * casts round identically only while num/den sit under 2^53 —
    * true at retention-bounded hour counts × fixture-scale rates;
    * beyond it the Spark-side value is still exact-integer-derived.
    * Scale shape: one partial-aggregated (type, hour) count
    * shuffle — the hourly-dashboard relation [[hourlyEwma]] already
    * builds — then a per-type aggregate over a bounded-by-retention
    * hour set; the first-hour re-base is a 1-row broadcast. Types with
    * a single observed hour report NULL slope (zero denominator). */
  def hourlyTrend(s: SparkSession, dir: String): DataFrame = {
    val pts = load(s, dir)
      .where(col("ts_us").isNotNull && col("event_type").isNotNull)
      .groupBy(col("event_type"), expr("ts_us div 3600000000").as("hr"))
      .agg(count(lit(1)).as("y"))
      .persist() // tiny (types × hours), TWO consumers (re-base min +
    retained.add(pts) // points) — without it the corpus scans twice
    // per-type SCALAR arithmetic (tiny relation, zero perf cost):
    // long-range casts whose products widen to decimal(38,0)
    val d19 = DecimalType(19, 0)
    val num = col("n_hours").cast(d19) * col("sxy").cast(d19) -
      col("sx").cast(d19) * col("sy").cast(d19)
    val den = col("n_hours").cast(d19) * col("sxx").cast(d19) -
      col("sx").cast(d19) * col("sx").cast(d19)
    pts.crossJoin(broadcast(pts.agg(min(col("hr")).as("hr0"))))
      .select(col("event_type"), (col("hr") - col("hr0")).as("x"), col("y"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_hours"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("y")).as("sxy"))
      .select(col("event_type"), col("n_hours"),
        (col("sy").cast("double") / col("n_hours").cast("double"))
          .as("avg_per_hour"),
        when(den =!= 0, num.cast("double") / den.cast("double"))
          .as("slope_per_hour"))
      .orderBy("event_type")
  }

  /** VERSION-DIFF fixture (implicit index, built once per (session,
    * sf dir)): a dedicated manifest collection whose pointer log is a
    * deterministic three-commit CDC story derived arithmetically from
    * the event fixture — so [[graft.sources.ManifestStore.diffVersions]]
    * and [[graft.sources.ManifestStore.restoreVersion]] sit under the
    * driver's DuckDB oracle gate, not just unit specs:
    *   v1  the first half of the log by time (plain store)
    *   v2  one MERGE: second half inserted, `event_id % 7 == 0` rows
    *       upserted (event_type → 'UPD'), `% 11` (and not `% 7`) rows
    *       deleted — disjoint predicates, so every key has one fate
    *   v3  restoreVersion(v1) — rollback-as-a-new-commit
    * The oracle re-derives each diff classification from the raw
    * parquet with the same integer arithmetic (`//` floor division,
    * positive operands). The modulus predicates sit in FILTERS over a
    * non-null id (never under a join key — the ANSI-% nullability
    * trap is a lambda/join-key concern). Returns
    * (tablePath, v1, v2, v3). */
  private[graft] def diffScenarioTable(s: SparkSession,
      dir: String): (String, Long, Long, Long) =
    diffTables(s, dir) { path =>
      val ev = load(s, dir)
        .select("event_id", "user_id", "event_type", "value", "ts_us")
      val r = ev.agg(min("ts_us"), max("ts_us")).head
      val (lo, hi) = (r.getLong(0), r.getLong(1))
      val mid = lo + (hi - lo) / 2
      // zone-map the merge key so the CDC merge is a pruned rewrite,
      // not a full-collection one (the 100 TB posture; one segment
      // here either way)
      graft.sources.ManifestStore.setZoneMapColumns(s, path,
        Seq("event_id"))
      val first = ev.where(col("ts_us") <= mid)
      graft.sources.ManifestStore.store(first, path, "diff")
      val v1 = graft.sources.ManifestStore.currentPtrSeq(s, path, "diff")
      val changes = ev.where(col("ts_us") > mid)
          .withColumn("_deleted", lit(false))
        .unionByName(first.where(col("event_id") % 7 === 0)
          .withColumn("event_type", lit("UPD"))
          .withColumn("_deleted", lit(false)))
        .unionByName(first
          .where(col("event_id") % 11 === 0 && col("event_id") % 7 =!= 0)
          .withColumn("_deleted", lit(true)))
      graft.sources.ManifestStore.mergeCollection(s, path, "diff",
        changes, key = "event_id")
      val v2 = graft.sources.ManifestStore.currentPtrSeq(s, path, "diff")
      graft.sources.ManifestStore.restoreVersion(s, path, "diff", v1)
      val v3 = graft.sources.ManifestStore.currentPtrSeq(s, path, "diff")
      (path, v1, v2, v3)
    }

  /** AUDIT DIFF across the merge commit: every key the CDC batch
    * touched, classified. At 100 TB the cost is the two snapshot
    * reads' full-outer join (each zone-map-backed and segment-pruned);
    * the change-batch derivation here is fixture scaffolding — a real
    * log's versions already exist. */
  def versionDiff(s: SparkSession, dir: String): DataFrame = {
    val (path, v1, v2, _) = diffScenarioTable(s, dir)
    graft.sources.ManifestStore.diffVersions(s, path, "diff", v1, v2,
      key = "event_id")
  }

  /** The same audit across the RESTORE commit — the rollback reads as
    * the merge's exact inverse (inserted↔deleted, updates revert to
    * `updated`), which is the auditor's proof the restore undid the
    * batch and nothing else. */
  def restoreDiff(s: SparkSession, dir: String): DataFrame = {
    val (path, _, v2, v3) = diffScenarioTable(s, dir)
    graft.sources.ManifestStore.diffVersions(s, path, "diff", v2, v3,
      key = "event_id")
  }

  private val widenTables =
    new FixtureTables[(String, Long)]("graft-ev-widen-")(_._1)

  /** WIDEN-EVOLVED manifest events table (implicit index, built once
    * per (session, sf dir)): the first half of the time range stored
    * NARROW (event_id, user_id, ts_us), the second half stored WIDE
    * (+ event_type, value) — the widen-only schema-evolution lineage a
    * long-lived ingest pipeline accumulates when new fields ship
    * mid-stream ([[graft.sources.ManifestStore]]'s `requireWidenOnly`
    * door: columns may be ADDED or OMITTED, never retyped). The
    * narrow segment serves NULL for the late columns through the
    * footer-union read. Returns (tablePath, cut ts_us). */
  private[graft] def widenEventsTable(s: SparkSession,
      dir: String): (String, Long) =
    widenTables(s, dir) { path =>
      val ev = load(s, dir)
        .select("event_id", "user_id", "event_type", "value", "ts_us")
        .where(col("ts_us").isNotNull)
      val r = ev.agg(min("ts_us"), max("ts_us")).head
      val cut = r.getLong(0) + (r.getLong(1) - r.getLong(0)) / 2
      graft.sources.ManifestStore.store(
        ev.where(col("ts_us") <= cut)
          .select("event_id", "user_id", "ts_us"), path, "events")
      graft.sources.ManifestStore.store(
        ev.where(col("ts_us") > cut), path, "events")
      (path, cut)
    }

  /** SCHEMA-EVOLUTION READ as a declared face — the widen-only
    * contract under the driver's oracle gate: the inferred read of the
    * widen-evolved lineage ([[widenEventsTable]]) must surface the
    * late columns, serve NULL for them from the pre-widen segment, and
    * lose no rows; the oracle re-derives every count from the raw
    * parquet with the same cut arithmetic (a pre-cut row's event_type
    * reads as NULL because the narrow segment never carried it). The
    * in-query requires make a regressed union (column dropped,
    * segment missed) fail loud rather than hash-mismatch mysteriously.
    * At 100 TB this is the "new field shipped last month" table every
    * long-lived corpus becomes — old segments are never rewritten,
    * readers see one widened schema. */
  def schemaWiden(s: SparkSession, dir: String): DataFrame = {
    val (path, cut) = widenEventsTable(s, dir)
    val df = graft.sources.ManifestStore
      .readSinceInferred(s, path, "events", 0L)
    require(df.columns.contains("event_type") &&
      df.columns.contains("value"),
      s"widened columns missing from the inferred union: " +
        df.columns.mkString(", "))
    require(graft.sources.ManifestStore.currentSegments(s, path, "events")
      .fold(0)(_.size) == 2, "widen fixture must hold its 2 segments")
    df.agg(
      count(lit(1)).as("n_events"),
      count(col("event_type")).as("n_typed"),
      sum(when(col("ts_us") <= cut && col("event_type").isNull, 1L)
        .otherwise(0L)).as("n_pre_widen"))
  }

  private val manifestTables =
    new FixtureTables[(String, Long, Long)]("graft-ev-manifest-")(_._1)

  private val diffTables =
    new FixtureTables[(String, Long, Long, Long)]("graft-ev-diff-")(_._1)

  /** Persisted frames feeding callers' lazy results; released on demand
    * (same lifecycle contract as [[Dedup.releaseCaches]]). */
  private val retained =
    new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  def releaseCaches(): Unit = {
    var df = retained.poll()
    while (df != null) { df.unpersist(); df = retained.poll() }
    manifestTables.release()
    diffTables.release()
    valueTables.release()
    widenTables.release()
  }

  // ------------------------------------------------------------------
  // Declared queries + DuckDB oracles
  // ------------------------------------------------------------------

  val defs: Seq[QueryDef] = Seq(
    QueryDef.sql("ev_range_scan",
      s"""WITH b AS (
         |  SELECT min(epoch_us(ts)) AS lo,
         |    (max(epoch_us(ts)) - min(epoch_us(ts))) // $RangeSegs AS w
         |  FROM events)
         |SELECT event_type, count(*) AS n_events,
         |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
         |  min(epoch_us(ts)) AS min_ts_us, max(epoch_us(ts)) AS max_ts_us
         |FROM events, b
         |WHERE epoch_us(ts) BETWEEN b.lo + 3 * b.w AND b.lo + 5 * b.w
         |GROUP BY event_type
         |ORDER BY event_type""".stripMargin)(rangeScan),

    QueryDef.sql("ev_point_lookup",
      """WITH b AS (
        |  SELECT min(event_id) AS lo, max(event_id) AS hi FROM events)
        |SELECT e.event_id, e.user_id, e.event_type, epoch_us(e.ts) AS ts_us
        |FROM events e, b
        |WHERE e.event_id IN (b.lo, b.hi, b.lo + (b.hi - b.lo) // 2, -1)
        |ORDER BY event_id""".stripMargin)(pointLookup),

    QueryDef.sql("ev_heavy_hitters",
      s"""WITH u AS (
         |  SELECT user_id, count(*) AS n_events FROM events GROUP BY 1),
         |t AS (
         |  SELECT CAST(sum(n_events) AS BIGINT) AS n_total,
         |    count(*) AS n_users FROM u)
         |SELECT user_id, n_events, n_total, n_users,
         |  CAST(n_events AS DOUBLE) / CAST(n_total AS DOUBLE) AS share
         |FROM u, t
         |WHERE CAST(n_events AS HUGEINT) * n_users * $HeavyDen
         |  > CAST(n_total AS HUGEINT) * $HeavyNum
         |ORDER BY n_events DESC, user_id""".stripMargin)(heavyHitters),

    QueryDef.sql("ev_cms_topk", {
      val P = graft.functions.TextFunctions.HashMod
      val mults = CmsMult.zipWithIndex
        .map { case (m, j) => s"WHEN $j THEN $m" }.mkString(" ")
      val posSql = (u: String) =>
        s"((((($u) % $P) * (CASE d.j $mults END) + d.j * 97 + 13) % $P) " +
          s"& ${CmsWidth - 1})"
      s"""WITH d AS (SELECT unnest(range(0, $CmsDepth)) AS j),
         |ev AS (
         |  SELECT d.j, ${posSql("e.user_id")} AS pos
         |  FROM events e CROSS JOIN d),
         |cells AS (SELECT j, pos, count(*) AS n FROM ev GROUP BY 1, 2),
         |cand AS (
         |  SELECT user_id, count(*) AS n_exact FROM events GROUP BY 1
         |  ORDER BY n_exact DESC, user_id LIMIT $CmsTopK),
         |probe AS (
         |  SELECT c.user_id, c.n_exact, d.j, ${posSql("c.user_id")} AS pos
         |  FROM cand c CROSS JOIN d)
         |SELECT p.user_id, p.n_exact, min(cl.n) AS n_cms,
         |  min(cl.n) - p.n_exact AS overcount
         |FROM probe p JOIN cells cl ON p.j = cl.j AND p.pos = cl.pos
         |GROUP BY p.user_id, p.n_exact
         |ORDER BY n_exact DESC, user_id""".stripMargin
    })(cmsTopK),

    QueryDef.sql("ev_group_cms_topk", {
      val P = graft.functions.TextFunctions.HashMod
      val mults = CmsMult.zipWithIndex
        .map { case (m, j) => s"WHEN $j THEN $m" }.mkString(" ")
      val posSql = (u: String) =>
        s"((((($u) % $P) * (CASE d.j $mults END) + d.j * 97 + 13) % $P) " +
          s"& ${CmsWidth - 1})"
      s"""WITH d AS (SELECT unnest(range(0, $CmsDepth)) AS j),
         |ev AS (
         |  SELECT e.event_type, d.j, ${posSql("e.user_id")} AS pos
         |  FROM events e CROSS JOIN d
         |  WHERE e.event_type IS NOT NULL AND e.user_id IS NOT NULL),
         |cells AS (SELECT event_type, j, pos, count(*) AS n
         |  FROM ev GROUP BY 1, 2, 3),
         |cand AS (
         |  SELECT event_type, user_id, count(*) AS n_exact,
         |    CAST(row_number() OVER (PARTITION BY event_type
         |      ORDER BY count(*) DESC, user_id) AS INT) AS rnk
         |  FROM events
         |  WHERE event_type IS NOT NULL AND user_id IS NOT NULL
         |  GROUP BY event_type, user_id
         |  QUALIFY rnk <= $GroupCmsTopK),
         |probe AS (
         |  SELECT c.event_type, c.user_id, c.n_exact, c.rnk, d.j,
         |    ${posSql("c.user_id")} AS pos
         |  FROM cand c CROSS JOIN d)
         |SELECT p.event_type, p.user_id, p.n_exact, min(cl.n) AS n_cms,
         |  min(cl.n) - p.n_exact AS overcount, p.rnk
         |FROM probe p JOIN cells cl
         |  ON p.event_type = cl.event_type AND p.j = cl.j
         |  AND p.pos = cl.pos
         |GROUP BY p.event_type, p.user_id, p.n_exact, p.rnk
         |ORDER BY p.event_type, p.rnk""".stripMargin
    })(groupCmsTopK),

    QueryDef.sql("ev_hourly_windows",
      """SELECT epoch_us(time_bucket(INTERVAL 1 HOUR, ts)) AS ws_us,
        |  event_type, count(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
        |  count(DISTINCT user_id) AS n_users
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin)(hourlyWindows),

    QueryDef.sql("ev_funnel",
      s"""WITH e AS (
         |  SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type
         |  FROM events),
         |r1 AS (
         |  SELECT *,
         |    min(CASE WHEN event_type = '${FunnelSteps(0)}' THEN ts_us END) OVER w
         |      AS t1_run
         |  FROM e
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         |r2 AS (
         |  SELECT *, CASE WHEN event_type = '${FunnelSteps(1)}' AND ts_us > t1_run
         |      AND ts_us <= t1_run + $WeekUs THEN ts_us END AS c2
         |  FROM r1),
         |r3 AS (
         |  SELECT *, min(c2) OVER w AS t2_run
         |  FROM r2
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         |r4 AS (
         |  SELECT *, CASE WHEN event_type = '${FunnelSteps(2)}' AND ts_us > t2_run
         |      AND ts_us <= t1_run + $WeekUs THEN ts_us END AS c3
         |  FROM r3),
         |u AS (
         |  SELECT user_id,
         |    min(CASE WHEN event_type = '${FunnelSteps(0)}' THEN ts_us END) AS t1,
         |    min(c2) AS t2, min(c3) AS t3
         |  FROM r4 GROUP BY user_id),
         |a AS (
         |  SELECT CAST(count(t1) AS BIGINT) AS n1,
         |    CAST(count(t2) AS BIGINT) AS n2,
         |    CAST(count(t3) AS BIGINT) AS n3
         |  FROM u),
         |s AS (
         |  SELECT 1 AS step, '${FunnelSteps(0)}' AS step_name, n1 AS n_users, n1 FROM a
         |  UNION ALL
         |  SELECT 2, '${FunnelSteps(1)}', n2, n1 FROM a
         |  UNION ALL
         |  SELECT 3, '${FunnelSteps(2)}', n3, n1 FROM a)
         |SELECT step, step_name, n_users,
         |  CASE WHEN n1 > 0 THEN
         |    CAST(n_users AS DOUBLE) / CAST(n1 AS DOUBLE) END AS conversion
         |FROM s ORDER BY step""".stripMargin)(funnel),

    QueryDef.sql("ev_retention_cohorts",
      s"""WITH e AS (
         |  SELECT user_id, epoch_us(ts) // $WeekUs AS wk FROM events),
         |c AS (
         |  SELECT user_id, wk,
         |    min(wk) OVER (PARTITION BY user_id) AS cohort_wk
         |  FROM e),
         |d AS (
         |  SELECT DISTINCT user_id, cohort_wk, wk - cohort_wk AS offset_wk
         |  FROM c),
         |n AS (
         |  SELECT cohort_wk, offset_wk, CAST(count(*) AS BIGINT) AS n_active
         |  FROM d GROUP BY cohort_wk, offset_wk),
         |s AS (
         |  SELECT *, max(CASE WHEN offset_wk = 0 THEN n_active END)
         |    OVER (PARTITION BY cohort_wk) AS cohort_size
         |  FROM n)
         |SELECT cohort_wk, offset_wk, n_active,
         |  CAST(cohort_size AS BIGINT) AS cohort_size,
         |  CAST(n_active AS DOUBLE) / CAST(cohort_size AS DOUBLE)
         |    AS retention
         |FROM s ORDER BY cohort_wk, offset_wk""".stripMargin)(
      retentionCohorts),

    QueryDef.sql("ev_sessionize",
      """WITH flagged AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, event_id,
        |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
        |sessions AS (
        |  SELECT user_id, ts_us,
        |    CAST(SUM(new_sess) OVER (PARTITION BY user_id
        |      ORDER BY ts_us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS session_seq
        |  FROM flagged)
        |SELECT user_id, session_seq, count(*) AS n_events,
        |  min(ts_us) AS start_us, max(ts_us) AS end_us,
        |  max(ts_us) - min(ts_us) AS duration_us
        |FROM sessions
        |GROUP BY user_id, session_seq
        |ORDER BY user_id, session_seq""".stripMargin)(sessionize),

    QueryDef.sql("ev_range_count",
      s"""WITH b AS (
         |  SELECT min(epoch_us(ts)) AS lo,
         |    (max(epoch_us(ts)) - min(epoch_us(ts))) // $RangeSegs AS w
         |  FROM events)
         |SELECT count(*) AS n_events
         |FROM events, b
         |WHERE epoch_us(ts) BETWEEN b.lo + 2 * b.w AND b.lo + 6 * b.w""".stripMargin)(
      (s, dir) => rangeCount(s, dir)),

    QueryDef.sql("ev_meta_bounds",
      """SELECT min(epoch_us(ts)) AS min_ts_us,
        |  max(epoch_us(ts)) AS max_ts_us,
        |  count(*) AS n_events
        |FROM events""".stripMargin)((s, dir) => metaBounds(s, dir)),

    QueryDef.sql("ev_lag_quantiles",
      """WITH a AS (
        |  SELECT epoch_us(c.ts) - epoch_us(p.ts) AS gap_us
        |  FROM (SELECT * FROM events WHERE event_type = 'click') c
        |  ASOF JOIN (SELECT user_id, ts FROM events
        |    WHERE event_type = 'purchase' GROUP BY user_id, ts) p
        |    ON c.user_id = p.user_id AND c.ts >= p.ts),
        |n AS (SELECT count(*) AS n FROM a),
        |r AS (SELECT gap_us, row_number() OVER (ORDER BY gap_us) AS rn
        |  FROM a),
        |t AS (SELECT p, (n.n * p + 99) // 100 AS k
        |  FROM (VALUES (50), (90), (99)) AS q(p), n)
        |SELECT t.p AS pct, t.k AS k, r.gap_us
        |FROM t JOIN r ON r.rn = t.k ORDER BY pct""".stripMargin)(
      (s, dir) => lagQuantiles(s, dir)),

    QueryDef.sql("ev_ewma",
      """WITH h AS (
        |  SELECT event_type,
        |    epoch_us(ts) - epoch_us(ts) % 3600000000 AS hr_us,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM events
        |  WHERE ts IS NOT NULL AND event_type IS NOT NULL
        |  GROUP BY 1, 2)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_hours,
        |  max(hr_us) AS last_hr_us,
        |  list_reduce(list_prepend(0.0E0,
        |    list_transform(list(cnt ORDER BY hr_us),
        |      c -> CAST(c AS DOUBLE))),
        |    (a, x) -> a * 0.5E0 + x * 0.5E0) AS ewma
        |FROM h GROUP BY event_type ORDER BY event_type""".stripMargin)(
      (s, dir) => hourlyEwma(s, dir)),

    QueryDef.sql("ev_exact_quantiles",
      """WITH v AS (
        |  SELECT epoch_us(ts) AS ts_us FROM events WHERE ts IS NOT NULL),
        |n AS (SELECT count(*) AS n FROM v),
        |r AS (SELECT ts_us, row_number() OVER (ORDER BY ts_us) AS rn FROM v),
        |t AS (SELECT p, (n.n * p + 99) // 100 AS k
        |  FROM (VALUES (50), (90), (99)) AS q(p), n)
        |SELECT t.p AS pct, t.k AS k, r.ts_us
        |FROM t JOIN r ON r.rn = t.k ORDER BY pct""".stripMargin)(
      (s, dir) => exactQuantiles(s, dir)),

    QueryDef.sql("ev_quantile_sketch",
      s"""WITH v AS (
         |  SELECT epoch_us(ts) AS x FROM events WHERE ts IS NOT NULL),
         |s AS (SELECT min(x) AS lo, max(x) AS hi, count(*) AS n FROM v),
         |g AS (SELECT lo, n, (hi - lo) // $SketchBuckets + 1 AS w FROM s),
         |h AS (SELECT (x - g.lo) // g.w AS b, count(*) AS bn
         |  FROM v, g GROUP BY 1),
         |cum AS (SELECT b, bn, sum(bn) OVER (ORDER BY b) AS ci FROM h),
         |t AS (SELECT p, (g.n * p + 99) // 100 AS k
         |  FROM (VALUES (50), (90), (99)) AS q(p), g),
         |pick AS (SELECT t.p, t.k, min(c.b) AS b
         |  FROM t JOIN cum c ON c.ci >= t.k GROUP BY t.p, t.k),
         |est AS (SELECT pick.p, pick.k, c.b, c.bn,
         |    CAST(c.ci - c.bn AS BIGINT) AS cb
         |  FROM pick JOIN cum c ON c.b = pick.b),
         |r AS (SELECT x, row_number() OVER (ORDER BY x) AS rn FROM v)
         |SELECT e.p AS pct, e.k AS k, r.x AS exact,
         |  CAST(g.lo + e.b * g.w AS DOUBLE) + CAST(g.w AS DOUBLE)
         |    * (CAST(e.k - e.cb AS DOUBLE) / CAST(e.bn AS DOUBLE))
         |    AS sketch,
         |  (CAST(g.lo + e.b * g.w AS DOUBLE) + CAST(g.w AS DOUBLE)
         |    * (CAST(e.k - e.cb AS DOUBLE) / CAST(e.bn AS DOUBLE)))
         |    - CAST(r.x AS DOUBLE) AS err
         |FROM est e, g
         |JOIN r ON r.rn = e.k
         |ORDER BY pct""".stripMargin)(
      (s, dir) => quantileSketch(s, dir)),

    QueryDef.sql("ev_group_quantile_sketch",
      s"""WITH v AS (
         |  SELECT event_type AS g, epoch_us(ts) AS x FROM events
         |  WHERE ts IS NOT NULL AND event_type IS NOT NULL),
         |s AS (SELECT g, min(x) AS lo, max(x) AS hi, count(*) AS n
         |  FROM v GROUP BY g),
         |gg AS (SELECT g, lo, n,
         |  (hi - lo) // $SketchBuckets + 1 AS w FROM s),
         |h AS (SELECT v.g, (v.x - gg.lo) // gg.w AS b, count(*) AS bn
         |  FROM v JOIN gg ON v.g = gg.g GROUP BY 1, 2),
         |cum AS (SELECT g, b, bn,
         |  sum(bn) OVER (PARTITION BY g ORDER BY b) AS ci FROM h),
         |t AS (SELECT gg.g, p, (gg.n * p + 99) // 100 AS k
         |  FROM (VALUES (50), (90), (99)) AS q(p), gg),
         |pick AS (SELECT t.g, t.p, t.k, min(c.b) AS b
         |  FROM t JOIN cum c ON c.g = t.g AND c.ci >= t.k
         |  GROUP BY t.g, t.p, t.k),
         |est AS (SELECT pick.g, pick.p, pick.k, c.b, c.bn,
         |    CAST(c.ci - c.bn AS BIGINT) AS cb
         |  FROM pick JOIN cum c ON c.g = pick.g AND c.b = pick.b),
         |r AS (SELECT g, x,
         |  row_number() OVER (PARTITION BY g ORDER BY x) AS rn FROM v)
         |SELECT e.g AS event_type, e.p AS pct, e.k AS k, r.x AS exact,
         |  CAST(gg.lo + e.b * gg.w AS DOUBLE) + CAST(gg.w AS DOUBLE)
         |    * (CAST(e.k - e.cb AS DOUBLE) / CAST(e.bn AS DOUBLE))
         |    AS sketch,
         |  (CAST(gg.lo + e.b * gg.w AS DOUBLE) + CAST(gg.w AS DOUBLE)
         |    * (CAST(e.k - e.cb AS DOUBLE) / CAST(e.bn AS DOUBLE)))
         |    - CAST(r.x AS DOUBLE) AS err
         |FROM est e
         |JOIN gg ON gg.g = e.g
         |JOIN r ON r.g = e.g AND r.rn = e.k
         |ORDER BY event_type, pct""".stripMargin)(
      (s, dir) => groupQuantileSketch(s, dir)),

    QueryDef.sql("ev_group_quantiles",
      """WITH v AS (
        |  SELECT event_type, epoch_us(ts) AS ts_us FROM events
        |  WHERE ts IS NOT NULL AND event_type IS NOT NULL),
        |n AS (SELECT event_type, count(*) AS n FROM v GROUP BY event_type),
        |r AS (SELECT event_type, ts_us, row_number()
        |    OVER (PARTITION BY event_type ORDER BY ts_us) AS rn FROM v),
        |t AS (SELECT n.event_type, p, (n.n * p + 99) // 100 AS k
        |  FROM (VALUES (50), (90), (99)) AS q(p), n)
        |SELECT t.event_type, t.p AS pct, t.k AS k, r.ts_us
        |FROM t JOIN r ON r.event_type = t.event_type AND r.rn = t.k
        |ORDER BY t.event_type, pct""".stripMargin)(
      (s, dir) => groupQuantiles(s, dir)),

    QueryDef.sql("ev_connector_point",
      """WITH b AS (
        |  SELECT min(event_id) AS lo, max(event_id) AS hi FROM events)
        |SELECT e.event_id, e.user_id, e.event_type, epoch_us(e.ts) AS ts_us
        |FROM events e, b
        |WHERE e.event_id IN (b.lo, b.hi, b.lo + (b.hi - b.lo) // 2, -1)
        |ORDER BY event_id""".stripMargin)(
      (s, dir) => connectorPointLookup(s, dir)),

    QueryDef.sql("ev_doc_lookup",
      s"""WITH b AS (SELECT min(doc_id) AS lo, max(doc_id) AS hi
         |  FROM documents),
         |hits AS (
         |  SELECT ${Dedup.docKeySql("d.doc_id")} AS doc_key,
         |    d.doc_id, d.lang
         |  FROM documents d, b
         |  WHERE d.doc_id IN (b.lo, b.hi))
         |SELECT doc_key, doc_id, lang FROM hits
         |UNION ALL SELECT doc_key, doc_id, lang FROM hits
         |ORDER BY doc_key, doc_id""".stripMargin)(
      (s, dir) => docPointLookup(s, dir)),

    QueryDef.sql("ev_meta_count",
      """SELECT count(*) AS n_events,
        |  count(*) FILTER (WHERE ts IS NULL) AS n_null_ts
        |FROM events""".stripMargin)((s, dir) => metaCount(s, dir)),

    QueryDef.sql("ev_incremental_agg",
      """SELECT event_type, count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
        |  min(epoch_us(ts)) AS min_ts_us, max(epoch_us(ts)) AS max_ts_us
        |FROM events GROUP BY event_type
        |ORDER BY event_type""".stripMargin)((s, dir) => incrementalAgg(s, dir)),

    QueryDef.sql("ev_incremental_distinct",
      // (k-1)·P = 63 · 1000000007 — exact in both engines; the oracle
      // recomputes the sketch from scratch, proving base ⊎ delta ≡ full
      """WITH d AS (SELECT DISTINCT event_type,
        |    ((user_id % 1000000007) * 756839017 + 11) % 1000000007 AS hv
        |  FROM events
        |  WHERE user_id IS NOT NULL AND event_type IS NOT NULL
        |    AND ts IS NOT NULL),
        |g AS (SELECT event_type, count(*) AS nd,
        |  list_sort(list(hv)) AS hs FROM d GROUP BY event_type)
        |SELECT event_type,
        |  CASE WHEN nd >= 64 THEN hs[64]
        |       ELSE CAST(-1 AS BIGINT) END AS kth_hash,
        |  CASE WHEN nd >= 64
        |       THEN 63000000441.0E0 / CAST(hs[64] AS DOUBLE)
        |       ELSE CAST(nd AS DOUBLE) END AS n_users_est
        |FROM g ORDER BY event_type""".stripMargin)(
      (s, dir) => incrementalDistinct(s, dir)),

    QueryDef.sql("ev_snapshot_drift",
      // base = the anchor version = the first 4 of 8 time-slice
      // commits = t <= lo + 4w - 1 (EventsSpec pins the equivalence);
      // products in HUGEINT ≡ Spark decimal(38,0) — exact integers
      s"""WITH f AS (SELECT event_type, value, epoch_us(ts) AS t
         |  FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
         |    AND value IS NOT NULL),
         |bnd AS (SELECT min(t) AS lo, (max(t) - min(t)) // $RangeSegs AS w
         |  FROM f),
         |vb AS (SELECT min(value) AS vlo, max(value) AS vhi FROM f),
         |pts AS (SELECT event_type, t,
         |  CASE WHEN vhi > vlo THEN least(greatest(
         |      CAST(floor((value - vlo) * $DriftBuckets.0E0 / (vhi - vlo))
         |        AS BIGINT), 0), ${DriftBuckets - 1})
         |    ELSE 0 END AS bkt
         |  FROM f, vb),
         |hb AS (SELECT event_type, bkt, count(*) AS n_b FROM pts, bnd
         |  WHERE t <= lo + ${RangeSegs / 2} * w - 1 GROUP BY 1, 2),
         |hc AS (SELECT event_type, bkt, count(*) AS n_c FROM pts
         |  GROUP BY 1, 2),
         |j AS (SELECT coalesce(hb.event_type, hc.event_type) AS event_type,
         |    coalesce(hb.bkt, hc.bkt) AS bkt,
         |    coalesce(n_b, 0) AS n_b, coalesce(n_c, 0) AS n_c
         |  FROM hb FULL OUTER JOIN hc
         |    ON hb.event_type = hc.event_type AND hb.bkt = hc.bkt),
         |tot AS (SELECT event_type, n_b, n_c,
         |    SUM(n_b) OVER (PARTITION BY event_type) AS nb_tot,
         |    SUM(n_c) OVER (PARTITION BY event_type) AS nc_tot FROM j)
         |SELECT event_type,
         |  CAST(max(nb_tot) AS BIGINT) AS n_base,
         |  CAST(max(nc_tot) AS BIGINT) AS n_cur,
         |  CASE WHEN max(nb_tot) > 0 AND max(nc_tot) > 0 THEN
         |    CAST(SUM(ABS(CAST(n_b AS HUGEINT) * nc_tot
         |        - CAST(n_c AS HUGEINT) * nb_tot)) AS DOUBLE)
         |      / (2.0E0 * CAST(max(nb_tot) AS DOUBLE)
         |        * CAST(max(nc_tot) AS DOUBLE)) END AS tvd
         |FROM tot GROUP BY event_type
         |ORDER BY event_type""".stripMargin)(
      (s, dir) => snapshotDrift(s, dir)),

    QueryDef.sql("ev_window_distinct_sketch",
      // the oracle sketches each window's RAW rows from scratch —
      // equality with the daily-sample merge is the bottom-k union
      // identity, proven per window
      s"""WITH f AS (SELECT epoch_us(ts) // 86400000000 AS d,
         |    ((user_id % 1000000007) * 756839017 + 11) % 1000000007 AS hv
         |  FROM events
         |  WHERE ts IS NOT NULL AND user_id IS NOT NULL),
         |days AS (SELECT DISTINCT d FROM f),
         |w AS (SELECT days.d AS day, f.d AS src_d, f.hv FROM days
         |  JOIN f ON f.d BETWEEN days.d - ${DistinctWindowDays - 1}
         |    AND days.d),
        |dd AS (SELECT DISTINCT day, hv FROM w),
        |nd AS (SELECT day, count(DISTINCT src_d) AS n_days
        |  FROM w GROUP BY day),
        |g AS (SELECT day, count(*) AS ndist, list_sort(list(hv)) AS hs
        |  FROM dd GROUP BY day)
        |SELECT g.day AS day, nd.n_days,
        |  CASE WHEN ndist >= 64 THEN hs[64]
        |       ELSE CAST(-1 AS BIGINT) END AS kth_hash,
        |  CASE WHEN ndist >= 64
        |       THEN 63000000441.0E0 / CAST(hs[64] AS DOUBLE)
        |       ELSE CAST(ndist AS DOUBLE) END AS n_users_est
        |FROM g JOIN nd ON g.day = nd.day
        |ORDER BY g.day""".stripMargin)(
      (s, dir) => windowDistinctSketch(s, dir)),

    QueryDef.sql("ev_hourly_trend",
      """WITH h AS (
        |  SELECT event_type, epoch_us(ts) // 3600000000 AS hr,
        |    count(*) AS y
        |  FROM events
        |  WHERE ts IS NOT NULL AND event_type IS NOT NULL
        |  GROUP BY 1, 2),
        |b AS (SELECT min(hr) AS hr0 FROM h),
        |p AS (SELECT event_type, hr - hr0 AS x, y FROM h, b),
        |g AS (SELECT event_type, count(*) AS n_hours, sum(x) AS sx,
        |  sum(y) AS sy, sum(x*x) AS sxx, sum(x*y) AS sxy
        |  FROM p GROUP BY event_type)
        |SELECT event_type, n_hours,
        |  CAST(sy AS DOUBLE) / CAST(n_hours AS DOUBLE) AS avg_per_hour,
        |  CASE WHEN n_hours * sxx - sx * sx <> 0
        |    THEN CAST(n_hours * sxy - sx * sy AS DOUBLE)
        |      / CAST(n_hours * sxx - sx * sx AS DOUBLE)
        |  END AS slope_per_hour
        |FROM g ORDER BY event_type""".stripMargin)(
      (s, dir) => hourlyTrend(s, dir)),

    QueryDef.sql("ev_connector_range",
      s"""WITH b AS (
         |  SELECT min(epoch_us(ts)) AS lo,
         |    (max(epoch_us(ts)) - min(epoch_us(ts))) // $RangeSegs AS w
         |  FROM events)
         |SELECT event_type, count(*) AS n_events,
         |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
         |  min(epoch_us(ts)) AS min_ts_us, max(epoch_us(ts)) AS max_ts_us
         |FROM events, b
         |WHERE epoch_us(ts) BETWEEN b.lo + 3 * b.w AND b.lo + 5 * b.w
         |GROUP BY event_type
         |ORDER BY event_type""".stripMargin)(
      (s, dir) => connectorRangeScan(s, dir)),

    // timestamp time travel: the anchor version's commit instant must
    // serve the first-half slice prefix (the drift oracle's pinned
    // version↔time-slice equivalence); a far-future instant is a
    // CEILING addressing the latest version
    QueryDef.sql("ev_history_ops",
      s"""WITH f AS (SELECT epoch_us(ts) AS t FROM events
         |  WHERE ts IS NOT NULL),
         |b AS (SELECT min(t) AS lo, (max(t) - min(t)) // $RangeSegs AS w
         |  FROM f)
         |SELECT CAST(k.v AS BIGINT) AS ptr_seq,
         |  CASE WHEN k.v = 1 THEN 'create' ELSE 'append' END AS op,
         |  CAST(k.v AS INT) AS n_live,
         |  (SELECT CAST(count(*) AS BIGINT) FROM f, b
         |    WHERE k.v = $RangeSegs OR t <= b.lo + k.v * b.w - 1)
         |    AS n_events
         |FROM generate_series(1, $RangeSegs) AS k(v)
         |ORDER BY ptr_seq""".stripMargin)(
      (s, dir) => historyOps(s, dir)),

    // widen-only schema evolution under the gate: a pre-cut row's
    // event_type reads as NULL because the narrow segment never
    // carried the column — the oracle re-derives all three counts
    // from the raw parquet with the same cut arithmetic
    QueryDef.sql("ev_schema_widen",
      """WITH f AS (SELECT event_type, epoch_us(ts) AS t FROM events
        |  WHERE ts IS NOT NULL),
        |b AS (SELECT min(t) + (max(t) - min(t)) // 2 AS cut FROM f)
        |SELECT CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(count(CASE WHEN t > b.cut THEN event_type END) AS BIGINT)
        |    AS n_typed,
        |  CAST(sum(CASE WHEN t <= b.cut THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_pre_widen
        |FROM f, b""".stripMargin)((s, dir) => schemaWiden(s, dir)),

    QueryDef.sql("ev_time_travel_ts",
      s"""WITH f AS (SELECT event_type, value, epoch_us(ts) AS t
         |  FROM events WHERE ts IS NOT NULL),
         |b AS (SELECT min(t) AS lo, (max(t) - min(t)) // $RangeSegs AS w
         |  FROM f),
         |snap AS (
         |  SELECT 'anchor' AS probe, event_type, value, t FROM f, b
         |  WHERE t <= lo + ${RangeSegs / 2} * w - 1
         |  UNION ALL
         |  SELECT 'future' AS probe, event_type, value, t FROM f)
         |SELECT probe, event_type, count(*) AS n_events,
         |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
         |  min(t) AS min_ts_us, max(t) AS max_ts_us
         |FROM snap GROUP BY probe, event_type
         |ORDER BY probe, event_type""".stripMargin)(
      (s, dir) => timeTravelTs(s, dir)),

    // the timestamped CHANGE FEED: rows landed since the anchor
    // instant = exactly the second-half slices
    QueryDef.sql("ev_time_travel_since",
      s"""WITH f AS (SELECT event_type, value, epoch_us(ts) AS t
         |  FROM events WHERE ts IS NOT NULL),
         |b AS (SELECT min(t) AS lo, (max(t) - min(t)) // $RangeSegs AS w
         |  FROM f)
         |SELECT event_type, count(*) AS n_events,
         |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
         |  min(t) AS min_ts_us, max(t) AS max_ts_us
         |FROM f, b
         |WHERE t > lo + ${RangeSegs / 2} * w - 1
         |GROUP BY event_type
         |ORDER BY event_type""".stripMargin)(
      (s, dir) => timeTravelSince(s, dir)),

    // the 'd'-kind zone-map face: double band bounds derived with the
    // IDENTICAL IEEE op sequence (sub, div, mul, add) in both engines
    QueryDef.sql("ev_value_range",
      s"""WITH f AS (SELECT event_type, value FROM events
         |  WHERE value IS NOT NULL),
         |b AS (SELECT min(value) AS lo, max(value) AS hi FROM f)
         |SELECT event_type, count(*) AS n_events,
         |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
         |FROM f, b
         |WHERE value >= b.lo + (b.hi - b.lo) / $ValueSegs.0E0 * 2.0E0
         |  AND value < b.lo + (b.hi - b.lo) / $ValueSegs.0E0 * 4.0E0
         |GROUP BY event_type
         |ORDER BY event_type""".stripMargin)(
      (s, dir) => valueRangeScan(s, dir)),

    // the metadata-served count twin of ev_value_range: a CLOSED value
    // band so fully-covered segments serve from their cnt: tokens
    QueryDef.sql("ev_value_count",
      s"""WITH f AS (SELECT value FROM events WHERE value IS NOT NULL),
         |b AS (SELECT min(value) AS lo, max(value) AS hi FROM f)
         |SELECT count(*) AS n_events
         |FROM f, b
         |WHERE value BETWEEN b.lo + (b.hi - b.lo) / $ValueSegs.0E0 * 2.0E0
         |  AND b.lo + (b.hi - b.lo) / $ValueSegs.0E0 * 4.0E0""".stripMargin)(
      (s, dir) => valueRangeCount(s, dir)),

    QueryDef.sql("ev_version_diff",
      """WITH f AS (SELECT event_id, epoch_us(ts) AS t FROM events),
        |b AS (SELECT min(t) + (max(t) - min(t)) // 2 AS mid FROM f)
        |SELECT event_id,
        |  CASE WHEN t > mid THEN 'inserted'
        |       WHEN event_id % 7 = 0 THEN 'updated'
        |       ELSE 'deleted' END AS change_type
        |FROM f, b
        |WHERE t > mid OR event_id % 7 = 0 OR event_id % 11 = 0
        |ORDER BY event_id""".stripMargin)((s, dir) => versionDiff(s, dir)),

    QueryDef.sql("ev_restore_diff",
      """WITH f AS (SELECT event_id, epoch_us(ts) AS t FROM events),
        |b AS (SELECT min(t) + (max(t) - min(t)) // 2 AS mid FROM f)
        |SELECT event_id,
        |  CASE WHEN t > mid THEN 'deleted'
        |       WHEN event_id % 7 = 0 THEN 'updated'
        |       ELSE 'inserted' END AS change_type
        |FROM f, b
        |WHERE t > mid OR event_id % 7 = 0 OR event_id % 11 = 0
        |ORDER BY event_id""".stripMargin)((s, dir) => restoreDiff(s, dir)),

    QueryDef.sql("ev_transition_matrix",
      """WITH o AS (
        |  SELECT user_id, event_type,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) AS to_type
        |  FROM events),
        |t AS (SELECT event_type AS from_type, to_type,
        |    count(*) AS n_trans
        |  FROM o WHERE to_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, n_trans,
        |  CAST(SUM(n_trans) OVER (PARTITION BY from_type) AS BIGINT)
        |    AS n_from,
        |  CAST(n_trans AS DOUBLE) /
        |    CAST(CAST(SUM(n_trans) OVER (PARTITION BY from_type)
        |      AS BIGINT) AS DOUBLE) AS p
        |FROM t ORDER BY from_type, to_type""".stripMargin)(transitionMatrix),

    QueryDef.sql("ev_dau_wau",
      """WITH ud AS (
        |  SELECT DISTINCT epoch_us(ts) // 86400000000 AS day, user_id
        |  FROM events),
        |dau AS (SELECT day, count(*) AS dau FROM ud GROUP BY day),
        |days AS (SELECT DISTINCT day FROM ud),
        |wau AS (
        |  SELECT d.day, count(DISTINCT u.user_id) AS wau
        |  FROM days d JOIN ud u
        |    ON u.day >= d.day - 6 AND u.day <= d.day
        |  GROUP BY d.day)
        |SELECT day, dau, wau,
        |  CAST(dau AS DOUBLE) / CAST(wau AS DOUBLE) AS stickiness
        |FROM dau JOIN wau USING (day)
        |ORDER BY day""".stripMargin)((s, dir) => dauWau(s, dir)),

    QueryDef.sql("ev_session_transitions",
      """WITH flagged AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type,
        |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
        |o1 AS (
        |  SELECT user_id, ts_us, event_id, event_type,
        |    SUM(new_sess) OVER (PARTITION BY user_id
        |      ORDER BY ts_us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS session_seq
        |  FROM flagged),
        |o AS (
        |  SELECT user_id, event_type, session_seq,
        |    lead(event_type) OVER w AS to_type,
        |    lead(session_seq) OVER w AS to_sess
        |  FROM o1
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
        |t AS (SELECT event_type AS from_type, to_type, count(*) AS n_trans
        |  FROM o WHERE to_type IS NOT NULL AND to_sess = session_seq
        |  GROUP BY 1, 2)
        |SELECT from_type, to_type, n_trans,
        |  CAST(SUM(n_trans) OVER (PARTITION BY from_type) AS BIGINT)
        |    AS n_from,
        |  CAST(n_trans AS DOUBLE) /
        |    CAST(CAST(SUM(n_trans) OVER (PARTITION BY from_type)
        |      AS BIGINT) AS DOUBLE) AS p
        |FROM t ORDER BY from_type, to_type""".stripMargin)(
      (s, dir) => sessionTransitionMatrix(s, dir)),

    QueryDef.sql("ev_path_topk",
      """WITH o AS (
        |  SELECT user_id, event_type AS t0,
        |    lead(event_type, 1) OVER w AS t1,
        |    lead(event_type, 2) OVER w AS t2
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id
        |    ORDER BY epoch_us(ts), event_id))
        |SELECT t0, t1, t2, count(*) AS n
        |FROM o WHERE t2 IS NOT NULL
        |GROUP BY t0, t1, t2
        |ORDER BY n DESC, t0, t1, t2
        |LIMIT 10""".stripMargin)((s, dir) => pathTopK(s, dir)),

    QueryDef.sql("ev_asof_click_purchase",
      """SELECT c.event_id AS click_id, c.user_id,
        |  epoch_us(c.ts) AS click_ts,
        |  p.event_id AS purchase_id, epoch_us(p.ts) AS purchase_ts,
        |  epoch_us(c.ts) - epoch_us(p.ts) AS gap_us
        |FROM (SELECT * FROM events WHERE event_type = 'click') c
        |ASOF LEFT JOIN (SELECT user_id, ts, max(event_id) AS event_id
        |  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts) p
        |  ON c.user_id = p.user_id AND c.ts >= p.ts
        |ORDER BY click_id""".stripMargin)(asofClickPurchase),

    QueryDef.sql("ev_asof_bounded",
      """WITH a AS (
        |  SELECT c.event_id AS click_id, c.user_id,
        |    epoch_us(c.ts) AS click_ts,
        |    p.event_id AS purchase_id, epoch_us(p.ts) AS purchase_ts,
        |    epoch_us(c.ts) - epoch_us(p.ts) AS gap_us
        |  FROM (SELECT * FROM events WHERE event_type = 'click') c
        |  ASOF LEFT JOIN (SELECT user_id, ts, max(event_id) AS event_id
        |    FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts) p
        |    ON c.user_id = p.user_id AND c.ts >= p.ts)
        |SELECT click_id, user_id, click_ts,
        |  CASE WHEN gap_us <= 86400000000 THEN purchase_id END AS purchase_id,
        |  CASE WHEN gap_us <= 86400000000 THEN purchase_ts END AS purchase_ts,
        |  CASE WHEN gap_us <= 86400000000 THEN gap_us END AS gap_us
        |FROM a ORDER BY click_id""".stripMargin)(
      (s, dir) => asofClickPurchaseBounded(s, dir)),

    QueryDef.sql("ev_sliding_rates",
      """WITH e AS (SELECT epoch_us(ts) AS t, event_type FROM events),
        |x AS (
        |  SELECT t - t % 900000000 - j * 900000000 AS ws_us, event_type
        |  FROM e CROSS JOIN unnest(range(0, 4)) AS u(j))
        |SELECT ws_us, event_type, count(*) AS n_events
        |FROM x GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)(slidingRates),

    QueryDef.sql("ev_gap_filled_hourly",
      """WITH e AS (
        |  SELECT epoch_us(ts) - epoch_us(ts) % 3600000000 AS hr_us,
        |    event_type
        |  FROM events),
        |c AS (SELECT hr_us, event_type, count(*) AS n FROM e GROUP BY 1, 2),
        |b AS (SELECT min(hr_us) AS lo, max(hr_us) AS hi FROM e),
        |g AS (SELECT unnest(range(lo, hi + 3600000000, 3600000000)) AS hr_us
        |  FROM b),
        |t AS (SELECT DISTINCT event_type FROM e)
        |SELECT g.hr_us, t.event_type, coalesce(c.n, 0) AS n_events
        |FROM g CROSS JOIN t
        |LEFT JOIN c ON c.hr_us = g.hr_us AND c.event_type = t.event_type
        |ORDER BY 1, 2""".stripMargin)(gapFilledHourly),

    QueryDef.sql("ev_gap_interpolated",
      // the interpolation expression tree is mirrored token-for-token
      // (fixed IEEE op order) so interpolated values hash bitwise
      """WITH e AS (SELECT epoch_us(ts) // 3600000000 AS hr, event_type,
        |    value
        |  FROM events
        |  WHERE ts IS NOT NULL AND event_type IS NOT NULL
        |    AND value IS NOT NULL),
        |c AS (SELECT hr, event_type, count(*) AS n_obs,
        |    CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
        |      / CAST(count(*) AS DOUBLE) AS mean_obs
        |  FROM e GROUP BY 1, 2),
        |b AS (SELECT min(hr) AS lo, max(hr) AS hi FROM e),
        |g AS (SELECT unnest(range(lo, hi + 1)) AS hr FROM b),
        |t AS (SELECT DISTINCT event_type FROM e),
        |j AS (SELECT g.hr, t.event_type, c.n_obs, c.mean_obs
        |  FROM g CROSS JOIN t
        |  LEFT JOIN c ON c.hr = g.hr AND c.event_type = t.event_type),
        |w AS (SELECT hr, event_type, n_obs, mean_obs,
        |    LAST_VALUE(mean_obs IGNORE NULLS) OVER (PARTITION BY event_type
        |      ORDER BY hr ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS pv,
        |    LAST_VALUE(CASE WHEN mean_obs IS NOT NULL THEN hr END
        |      IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY hr
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ph,
        |    FIRST_VALUE(mean_obs IGNORE NULLS) OVER (PARTITION BY event_type
        |      ORDER BY hr ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        |      AS nv,
        |    FIRST_VALUE(CASE WHEN mean_obs IS NOT NULL THEN hr END
        |      IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY hr
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nh
        |  FROM j)
        |SELECT hr * 3600000000 AS hr_us, event_type,
        |  coalesce(n_obs, 0) AS n_obs,
        |  CASE WHEN mean_obs IS NOT NULL THEN mean_obs
        |       WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
        |         pv + (nv - pv) * (CAST(hr - ph AS DOUBLE)
        |           / CAST(nh - ph AS DOUBLE))
        |       ELSE coalesce(pv, nv) END AS value,
        |  CASE WHEN mean_obs IS NOT NULL THEN 'obs'
        |       WHEN pv IS NOT NULL AND nv IS NOT NULL THEN 'interp'
        |       ELSE 'edge' END AS src
        |FROM w ORDER BY hr_us, event_type""".stripMargin)(
      gapInterpolatedHourly),

    QueryDef.sql("ev_session_window",
      """WITH flagged AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, event_id,
        |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
        |sessions AS (
        |  SELECT user_id, ts_us,
        |    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seq
        |  FROM flagged)
        |SELECT user_id, min(ts_us) AS ws_us,
        |  max(ts_us) + 1800000000 AS we_us,
        |  count(*) AS n_events
        |FROM sessions GROUP BY user_id, seq
        |ORDER BY user_id, ws_us""".stripMargin)(sessionWindows),

    QueryDef.sql("ev_asof_forward",
      """SELECT c.event_id AS click_id, c.user_id,
        |  epoch_us(c.ts) AS click_ts,
        |  p.event_id AS purchase_id, epoch_us(p.ts) AS purchase_ts,
        |  epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
        |FROM (SELECT * FROM events WHERE event_type = 'click') c
        |ASOF LEFT JOIN (SELECT user_id, ts, min(event_id) AS event_id
        |  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts) p
        |  ON c.user_id = p.user_id AND c.ts <= p.ts
        |ORDER BY click_id""".stripMargin)(asofClickNextPurchase),

    QueryDef.sql("ev_hourly_full_outer",
      """WITH c AS (
        |  SELECT epoch_us(ts) - epoch_us(ts) % 3600000000 AS hr_us,
        |    count(*) AS n_clicks
        |  FROM events WHERE event_type = 'click' GROUP BY 1),
        |p AS (
        |  SELECT epoch_us(ts) - epoch_us(ts) % 3600000000 AS hr_us,
        |    count(*) AS n_purchases
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1)
        |SELECT coalesce(c.hr_us, p.hr_us) AS hr_us,
        |  coalesce(n_clicks, 0) AS n_clicks,
        |  coalesce(n_purchases, 0) AS n_purchases
        |FROM c FULL OUTER JOIN p ON c.hr_us = p.hr_us
        |ORDER BY hr_us""".stripMargin)(hourlyClicksVsPurchases),

    QueryDef.sql("ev_interval_join",
      """SELECT e.event_id AS err_id, e.user_id,
        |  epoch_us(e.ts) AS err_ts,
        |  count(*) AS n_nearby,
        |  min(abs(epoch_us(o.ts) - epoch_us(e.ts))) AS closest_gap_us
        |FROM (SELECT * FROM events WHERE event_type = 'error') e
        |JOIN (SELECT * FROM events WHERE event_type <> 'error') o
        |  ON e.user_id = o.user_id
        |  AND epoch_us(o.ts) >= epoch_us(e.ts) - 300000000
        |  AND epoch_us(o.ts) <= epoch_us(e.ts) + 300000000
        |GROUP BY e.event_id, e.user_id, epoch_us(e.ts)
        |ORDER BY err_id""".stripMargin)(errorContext),

    QueryDef.sql("ev_anomaly",
      s"""WITH st AS (
         |  SELECT event_type, quantile_cont(value, 0.5) AS med
         |  FROM events GROUP BY event_type),
         |ad AS (
         |  SELECT e.event_id, e.event_type, e.value, st.med,
         |    abs(e.value - st.med) AS adev
         |  FROM events e JOIN st USING (event_type)),
         |md AS (
         |  SELECT event_type, quantile_cont(adev, 0.5) AS mad
         |  FROM ad GROUP BY event_type),
         |sc AS (
         |  SELECT ad.event_id, ad.event_type, ad.value, ad.med, md.mad,
         |    CASE WHEN md.mad > 0.0E0 THEN (ad.value - ad.med) / md.mad
         |      END AS score
         |  FROM ad JOIN md USING (event_type))
         |SELECT event_id, event_type, value, med, mad, score
         |FROM sc WHERE abs(score) > ${AnomalyThreshold}E0
         |ORDER BY abs(score) DESC, event_id LIMIT 50""".stripMargin)(
      (s, dir) => anomaly(s, dir)),

    QueryDef.sql("ev_salted_agg",
      """SELECT event_type, count(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin)(
      (s, dir) => saltedTypeStats(s, dir)),

    // the salted JOIN twin: the oracle is the UNSALTED join — salting
    // is a pure execution-strategy change (PlanSpec pins the fan-out
    // and the (key, salt) shuffle profile)
    QueryDef.sql("ev_salted_join",
      """WITH e AS (SELECT event_type, value FROM events
        |  WHERE event_type IS NOT NULL AND value IS NOT NULL),
        |dim AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_type,
        |  SUM(CAST(value AS DECIMAL(18,6))) AS sum_type
        |  FROM e GROUP BY 1)
        |SELECT e.event_type, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(CASE WHEN CAST(e.value AS DECIMAL(18,6)) * d.n_type
        |      > d.sum_type THEN 1 ELSE 0 END) AS BIGINT) AS n_above_avg
        |FROM e JOIN dim d ON e.event_type = d.event_type
        |GROUP BY e.event_type
        |ORDER BY e.event_type""".stripMargin)(
      (s, dir) => saltedDimJoin(s, dir)),

    QueryDef.sql("ev_variant_props",
      """SELECT count(*) AS n_events,
        |  count(TRY_CAST(json_extract_string(props, '$.k') AS INT)) AS n_with_k,
        |  CAST(SUM(TRY_CAST(json_extract_string(props, '$.k') AS INT))
        |    AS BIGINT) AS sum_k,
        |  min(TRY_CAST(json_extract_string(props, '$.k') AS INT)) AS min_k,
        |  max(TRY_CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
        |FROM events""".stripMargin)(variantProps),

    QueryDef.sql("ev_json_props",
      """SELECT event_type, count(*) AS n_events,
        |  CAST(SUM(TRY_CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
        |  min(TRY_CAST(json_extract_string(props, '$.k') AS INT)) AS min_k,
        |  max(TRY_CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin)(jsonProps)
  )
}
