package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: irregular event streams onto fixed
  * per-key time grids. Feature pipelines, monitoring backfills and
  * as-of feature joins all want a row per (key, bucket) even when
  * nothing happened in the bucket — the gap IS the signal — with the
  * last observation carried forward across it.
  */
object TimeSeries {

  /** Per-key fixed-step grid from the key's first to last observation
    * (bucket = epoch-seconds floor-divided by `stepSeconds` — the grid
    * is absolute, not phase-shifted per key), with:
    *  - `filled_value`: last-observation-carried-forward at each grid
    *    point (NULL before the key's first value — the honest answer,
    *    never a synthetic zero);
    *  - `n_events`: observations inside that bucket (0 = the gap).
    *
    * LOCF is the union trick — events and grid points interleave in
    * ONE per-key ordered pass (`last(value, ignoreNulls)` over rows
    * unbounded-preceding), not an as-of join per grid point. Ties are
    * total-ordered: same-instant events sort before their grid point
    * (an observation AT the boundary is visible to it), equal-ts
    * events order by value so exact duplicates can't flap between
    * runs; a null-valued observation never overwrites a carried value
    * (ignoreNulls), and its position among same-ts rows provably can't
    * change which non-null value is last.
    *
    * Scale shape: one per-key bounds aggregate (partial, |keys| rows),
    * a grid explode of span/step rows per key, ONE shuffle on the key
    * for the ordered LOCF pass, and a partial-aggregated per-bucket
    * count joined back on (key, bucket). Everything partitions by key;
    * a single key's window holds its grid+events rows only — the same
    * hot-key caveat as sessionize, bounded by retention/step.
    */
  def gapFill(df: DataFrame, keyCol: String, tsCol: String,
              valueCol: String, stepSeconds: Long = 3600L): DataFrame = {
    require(stepSeconds > 0, s"stepSeconds must be positive, got $stepSeconds")
    // a null-ts observation has no place on a time grid — and Spark
    // sorts nulls FIRST ascending, so without this filter its value
    // would seed LOCF before the key's first real event (and DuckDB,
    // nulls-last, would disagree); FreshnessStream's explicit null-ts
    // convention, applied batch-side
    val ev = df.select(col(keyCol).as("k"), col(tsCol).as("t"),
      col(valueCol).as("v"))
      .filter(col("t").isNotNull)
    val vType = ev.schema("v").dataType
    val bucket = (c: String) =>
      expr(s"timestamp_seconds(unix_timestamp($c) div $stepSeconds * $stepSeconds)")
    val bounds = ev.groupBy("k").agg(min("t").as("t0"), max("t").as("t1"))
    val grid = bounds.select(col("k"),
      explode(expr(
        s"""sequence(timestamp_seconds(unix_timestamp(t0) div $stepSeconds * $stepSeconds),
           |         timestamp_seconds(unix_timestamp(t1) div $stepSeconds * $stepSeconds),
           |         interval $stepSeconds second)""".stripMargin)).as("t"))
    val unioned = ev.withColumn("is_grid", lit(0))
      .unionByName(grid.select(col("k"), col("t"),
        lit(null).cast(vType).as("v"), lit(1).as("is_grid")))
    val w = Window.partitionBy("k")
      .orderBy(col("t").asc, col("is_grid").asc, col("v").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = unioned
      .withColumn("fv", last(col("v"), ignoreNulls = true).over(w))
      .filter(col("is_grid") === 1)
    val counts = ev.select(col("k"), bucket("t").as("t"))
      .groupBy("k", "t").agg(count(lit(1)).as("n_events"))
    filled.join(counts, Seq("k", "t"), "left")
      .select(col("k").as(keyCol), col("t").as("bucket_ts"),
        col("fv").as("filled_value"),
        coalesce(col("n_events"), lit(0L)).as("n_events"))
  }

  /** Nearest-in-time join: each left event matched to the same key's
    * CLOSEST right event in EITHER direction — the sensor-alignment /
    * measurement-pairing join that as-of (backward-only) can't
    * express. Two ordered passes over the union (a forward LOCF for
    * the latest right at-or-before, a reversed one for the earliest
    * right at-or-after — never a per-row range probe), then one
    * comparison picks the closer side; exact |Δms| ties prefer the
    * backward match (the as-of convention). Same-instant rights count
    * for both directions with Δ = 0. Lefts with no right at all
    * report −1 sentinels (the tuple-hash gate convention).
    *
    * Scale shape: ONE shuffle on the key, two windows over the same
    * partitioning (Catalyst shares the exchange), per-row arithmetic
    * after. The sessionize hot-key caveat applies.
    */
  def nearestJoin(df: DataFrame, keyCol: String, tsCol: String,
                  typeCol: String, idCol: String,
                  leftType: String, rightType: String): DataFrame = {
    val tagged = df
      // null-ts rows have no position on the time axis: Spark sorts
      // nulls first ascending (DuckDB last), so an unfiltered null-ts
      // right would diverge between engines — drop them like gapFill
      .filter(col(typeCol).isin(leftType, rightType) && col(tsCol).isNotNull)
      .select(col(keyCol).as("k"), col(tsCol).as("t"), col(idCol).as("id"),
        when(col(typeCol) === leftType, 1).otherwise(0).as("is_left"))
      .withColumn("ms", expr("unix_millis(t)"))
    // backward pass: rights sort before lefts at the same instant so
    // a same-ts right is visible (Δ = 0); ties at one instant resolve
    // to the highest right id
    val wB = Window.partitionBy("k")
      .orderBy(col("ms").asc, col("is_left").asc, col("id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // forward pass: scan from the future; rights at the same instant
    // again come first, ties resolve to the lowest right id
    val wF = Window.partitionBy("k")
      .orderBy(col("ms").desc, col("is_left").asc, col("id").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val rightAt = (w: org.apache.spark.sql.expressions.WindowSpec, c: Column) =>
      last(when(col("is_left") === 0, c), ignoreNulls = true).over(w)
    val scored = tagged
      .withColumn("b_ms", rightAt(wB, col("ms")))
      .withColumn("b_id", rightAt(wB, col("id")))
      .withColumn("f_ms", rightAt(wF, col("ms")))
      .withColumn("f_id", rightAt(wF, col("id")))
      .filter(col("is_left") === 1)
      .withColumn("db", col("ms") - col("b_ms"))   // >= 0
      .withColumn("df", col("ms") - col("f_ms"))   // <= 0
      .withColumn("pick_b",
        col("b_id").isNotNull &&
          (col("f_id").isNull || col("db") <= -col("df")))
    scored.select(col("id").as("left_id"), col("k").as(keyCol),
      col("t").as("left_ts"),
      coalesce((col("b_id").isNotNull || col("f_id").isNotNull).cast("int"),
        lit(0)).as("has_nearest"),
      when(col("pick_b"), col("b_id"))
        .otherwise(coalesce(col("f_id"), lit(-1L))).as("nearest_id"),
      when(col("pick_b"), col("db"))
        .otherwise(when(col("f_id").isNotNull, col("df")).otherwise(lit(-1L)))
        .as("delta_ms"))
  }

  /** Interval union per key (the gaps-and-islands problem): merge
    * overlapping-or-touching [start, end) intervals into maximal
    * islands — the coverage question behind uptime/downtime math,
    * session-coverage billing, and crawl-window accounting, where
    * naive SUM(end−start) double-counts every overlap.
    *
    * One ordered pass per key: the running maximum of `end` over all
    * PRECEDING intervals decides whether the current one opens a new
    * island (start strictly beyond everything seen) or extends the
    * current; island ids are the running sum of those flags. Touching
    * intervals (start == previous max end) MERGE — [a,b)+[b,c) covers
    * [a,c) with no gap. All comparisons on the caller's (integer)
    * units: deterministic under ties, duplicate intervals collapse
    * into whichever island run the order visits first with identical
    * island output either way.
    *
    * Scale shape: ONE shuffle on the key, per-key window + one partial
    * agg; the same hot-key caveat as sessionize.
    */
  def mergeIntervals(df: DataFrame, keyCol: String,
                     startCol: String, endCol: String): DataFrame = {
    val iv = df.select(col(keyCol).as("k"),
        col(startCol).cast("long").as("s"), col(endCol).cast("long").as("e"))
      // an unbounded interval has no merge semantics; dropping beats
      // letting nulls sort to an arbitrary island
      .filter(col("s").isNotNull && col("e").isNotNull)
    val wPrev = Window.partitionBy("k").orderBy(col("s").asc, col("e").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wCum = Window.partitionBy("k").orderBy(col("s").asc, col("e").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    iv.withColumn("__pmax", max(col("e")).over(wPrev))
      .withColumn("__new",
        when(col("__pmax").isNull || col("s") > col("__pmax"), 1L)
          .otherwise(0L))
      .withColumn("island_idx", sum(col("__new")).over(wCum))
      .groupBy(col("k"), col("island_idx"))
      .agg(min(col("s")).as("island_start"), max(col("e")).as("island_end"),
        count(lit(1)).as("n_intervals"))
      .select(col("k").as(keyCol), col("island_idx"),
        col("island_start"), col("island_end"), col("n_intervals"))
  }

  /** Last-touch attribution: each conversion event attributed to the
    * key's most recent touch event at-or-before it, within a lookback
    * window — the funnel-closing query of behavioral analytics (and an
    * as-of join where both sides are the SAME stream, so the
    * per-grid-point join collapses into one ordered pass: touches
    * carry their identity forward LOCF-style, conversions read it).
    *
    * Determinism: the per-key order is (ts, kind, event id) with
    * touches before conversions at the same instant (a touch AT the
    * conversion timestamp is attributable, age 0) and same-instant
    * touches resolved to the highest id. Conversions with no touch
    * inside `lookbackSeconds` report has_touch = 0 with −1 sentinels
    * (never NULLs — the tuple-hash gate convention).
    *
    * Scale shape: one filtered scan (only touch/conversion types
    * survive — the filter pushes into the scan), ONE shuffle on the
    * key for the ordered pass, per-row arithmetic after. Same hot-key
    * caveat as sessionize.
    */
  def lastTouch(df: DataFrame, keyCol: String, tsCol: String,
                typeCol: String, idCol: String,
                touchType: String, convType: String,
                lookbackSeconds: Long): DataFrame = {
    require(lookbackSeconds > 0, "lookbackSeconds must be positive")
    val tagged = df
      // null-ts rows are unplaceable on the axis (see nearestJoin) —
      // a null-ts touch must never win an attribution
      .filter(col(typeCol).isin(touchType, convType) && col(tsCol).isNotNull)
      .select(col(keyCol).as("k"), col(tsCol).as("t"), col(idCol).as("id"),
        when(col(typeCol) === convType, 1).otherwise(0).as("is_conv"))
    val w = Window.partitionBy("k")
      .orderBy(col("t").asc, col("is_conv").asc, col("id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val touchAt = (c: Column) =>
      last(when(col("is_conv") === 0, c), ignoreNulls = true).over(w)
    tagged
      .withColumn("touch_ts", touchAt(col("t")))
      .withColumn("touch_id", touchAt(col("id")))
      .filter(col("is_conv") === 1)
      .withColumn("age_ms",
        expr("unix_millis(t)") - expr("unix_millis(touch_ts)"))
      // coalesce: a null-ts touch or conversion yields null age, and
      // a null flag would leak into the output instead of an honest 0
      .withColumn("has_touch",
        coalesce((col("touch_id").isNotNull &&
          col("age_ms") <= lookbackSeconds * 1000L).cast("int"), lit(0)))
      .select(col("id").as("conversion_id"), col("k").as(keyCol),
        col("t").as("conv_ts"), col("has_touch"),
        when(col("has_touch") === 1, col("touch_id"))
          .otherwise(lit(-1L)).as("touch_id"),
        when(col("has_touch") === 1, col("age_ms"))
          .otherwise(lit(-1L)).as("touch_age_ms"))
  }

  /** Trailing exponentially-weighted moving average per key — the
    * metric smoother monitors and anomaly scans read instead of raw
    * points: the j-th most recent of the last `k` events weighs
    * 2^(k−1−j), so influence halves per step back (the classic
    * α = 1/2 EWMA, TRUNCATED to a k-event horizon, which is what
    * makes it exact: the infinite recurrence never is).
    *
    * Integer-exact contract (round-9 convention): values quantize to
    * cents, the weighted numerator and the weight sum of the AVAILABLE
    * lags accumulate as longs, and the output is
    * (num·10) div den milli-units — matched truncation on both
    * engines, no float recurrence anywhere. Early rows (< k
    * predecessors) renormalize over the lags that exist, reported as
    * `n_window`; null-timestamp rows are dropped up front (engines
    * disagree on null ordering — the gapFill hardening).
    *
    * Scale shape: ONE key-hash exchange, one ordered window pass
    * computing all k lags (one sort, k row-buffer reads); pure per-row
    * arithmetic after — the q_rolling_window cost model with a k-row
    * frame instead of a time range.
    */
  def ewma(df: DataFrame, keyCol: String, tsCol: String, valueCol: String,
           idCol: String, k: Int = 4): DataFrame = {
    require(k >= 1 && k <= 16, s"k must be in [1, 16], got $k")
    // null ts: engines disagree on null ordering (the gapFill
    // hardening); null value: an all-null lag window would divide by
    // zero — both are dropped, not guessed at
    val base = df.filter(col(tsCol).isNotNull && col(valueCol).isNotNull)
      .select(col(keyCol), col(idCol),
        expr(s"unix_millis($tsCol)").as("ts_ms"),
        round(col(valueCol) * 100).cast("long").as("__q"))
    val w = Window.partitionBy(keyCol).orderBy(col("ts_ms"), col(idCol))
    val lagged = base.select(Seq(col(keyCol), col(idCol), col("ts_ms")) ++
      (0 until k).map(j => lag(col("__q"), j).over(w).as(s"__l$j")): _*)
    val num = (0 until k).map(j => when(col(s"__l$j").isNotNull,
      col(s"__l$j") * lit(1L << (k - 1 - j))).otherwise(lit(0L))).reduce(_ + _)
    val den = (0 until k).map(j => when(col(s"__l$j").isNotNull,
      lit(1L << (k - 1 - j))).otherwise(lit(0L))).reduce(_ + _)
    val nw = (0 until k).map(j =>
      when(col(s"__l$j").isNotNull, 1L).otherwise(0L)).reduce(_ + _)
    lagged.withColumn("__num", num).withColumn("__den", den)
      .select(col(keyCol), col(idCol), col("ts_ms"), nw.as("n_window"),
        expr("(__num * 10L) div __den").as("smoothed_milli"))
  }

  /** Trailing-window distinct-entity counts per day — "7-day active
    * users" and its siblings, the retention/reach metric family. The
    * naive plan is a calendar × events range join with a per-day
    * COUNT(DISTINCT) — every event re-counted `windowDays` times and a
    * distinct shuffle per day. This one never re-counts: each entity's
    * distinct activity days become [d, d+window) COVERAGE intervals,
    * [[mergeIntervals]] unions them into disjoint islands per entity
    * (the LINEAR pass), and exploding islands into days yields each
    * (entity, day) at most once BY CONSTRUCTION — so the final count
    * is a plain partial-aggregatable sum, no distinct at all.
    *
    * Day = unix_millis div 86 400 000 (integer; matched truncation,
    * and modern timestamps are positive anyway). Output days clamp to
    * the observed global max day (no counts projected past the data);
    * days with zero coverage are absent, not zero rows. Null
    * timestamps drop (the gapFill hardening).
    *
    * Scale shape: one distinct on (entity, day) — the only full-data
    * shuffle, map-side combined; islands per entity via ONE ordered
    * window pass; the explode emits ≤ window rows per distinct
    * activity day (fewer after merging — dense entities collapse to
    * few long islands); the day count is a tiny partial agg. The
    * hot-ENTITY window caveat is bounded: an entity has at most
    * (days-of-history) interval rows.
    */
  def slidingDistinct(df: DataFrame, entityCol: String, tsCol: String,
                      windowDays: Int): DataFrame = {
    require(windowDays >= 1 && windowDays <= 3650,
      s"windowDays in [1, 3650], got $windowDays")
    val ud = df.filter(col(tsCol).isNotNull)
      .select(col(entityCol).as("u"),
        expr(s"unix_millis($tsCol) div 86400000L").as("d"))
      .distinct()
    val islands = mergeIntervals(
      ud.select(col("u"), col("d").as("s"),
        (col("d") + windowDays.toLong).as("e")), "u", "s", "e")
    val bounds = ud.agg(max("d").as("dmax"))
    islands.crossJoin(broadcast(bounds))
      .select(explode(sequence(col("island_start"),
        least(col("island_end") - 1, col("dmax")))).as("day"))
      .groupBy("day").agg(count(lit(1)).as("n_active"))
  }

  /** Offline changepoint localization per key — WHERE did the level
    * shift? The batch complement of [[graft.streaming.EwmaStream]]'s
    * online drift flag (which says THAT a key's level moved, one
    * trigger late): given a key's full history, find the split that
    * best separates "before" from "after" — the CUSUM-style
    * maximum-deviation estimator (Page 1954 lineage; the single-
    * changepoint least-squares split), the question an incident
    * post-mortem or a corpus-release diff actually asks.
    *
    * Statistic, integer-exact end-to-end: values quantize to cents
    * (q_i as longs), and for a split after position i (of n, ordered
    * by (ts, id)) the scaled deviation is
    * `D_i = |n·P_i − i·T|` where P_i is the prefix sum and T the key's
    * total — algebraically n·i·|mean(1..i) − mean(1..n)|, the CUSUM
    * curve's distance from the zero-change diagonal, with all the
    * divisions cleared so no float (or rational) ever appears. The
    * changepoint is argmax_i D_i over i ∈ [1, n−1], ties to the
    * EARLIEST split; before/after means report in milli-units via
    * matched truncation (`div` ≡ DuckDB `//`, toward zero — the signed
    * contract every integer gate uses). Keys with n < 2 have no split
    * and are excluded. Overflow bound (documented, not checked row-wise):
    * n²·max|q| must stay under 2^63 — cents values to ±10⁹ are safe
    * through n ≈ 2 M events per key.
    *
    * Null ts/value rows are dropped up front (the ewma/gapFill
    * hardening: engines disagree on null ordering, and a null value
    * has no place in a mean).
    *
    * Scale shape: ONE key-hash exchange; the ordered window pass
    * computes prefix sums, and the per-key argmax is a struct-max
    * aggregate over the SAME partitioning (Catalyst reuses the
    * exchange — no second shuffle, no row_number re-sort), |keys| rows
    * out. The sessionize hot-key caveat applies to the window sort.
    */
  def changepoint(df: DataFrame, keyCol: String, tsCol: String,
                  valueCol: String, idCol: String): DataFrame = {
    val base = df.filter(col(tsCol).isNotNull && col(valueCol).isNotNull)
      .select(col(keyCol).as("k"), col(idCol).as("id"),
        expr(s"unix_millis($tsCol)").as("ms"),
        round(col(valueCol) * 100).cast("long").as("q"))
    val w = Window.partitionBy("k").orderBy(col("ms"), col("id"))
    val scored = base
      .withColumn("p", sum(col("q")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("i", row_number().over(w))
      .withColumn("n", count(lit(1)).over(
        w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .withColumn("t", sum(col("q")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .filter(col("i") < col("n"))
      .withColumn("d", abs(col("n") * col("p") - col("i") * col("t")))
    // lexicographic struct max: best D first, then EARLIEST split
    // (max of −i), remaining fields determined by (d, i) — one
    // aggregate on the window's own partitioning, no second sort
    scored
      .groupBy(col("k"))
      .agg(max(struct(col("d"), (-col("i")).as("ni"), col("id"), col("p"),
        col("n"), col("t"))).as("best"))
      .select(col("k").as(keyCol),
        col("best.n").as("n_events"),
        (-col("best.ni")).cast("long").as("cp_pos"),
        col("best.id").as("cp_event_id"),
        col("best.d").as("cusum_score"),
        expr("(best.p * 10L) div (-best.ni)").as("mean_before_milli"),
        expr("((best.t - best.p) * 10L) div (best.n + best.ni)")
          .as("mean_after_milli"))
  }

  /** Weekly-phase seasonal decomposition of per-key daily volume —
    * the seasonality axis the level/changepoint monitors deliberately
    * ignore (EWMA smooths THROUGH a weekend dip every week and a
    * z-score flags every Monday; the right baseline for periodic
    * traffic is the same-phase mean): per (key, day) the observed
    * count, the expected count for that day's weekly phase (mean of
    * the key's same-phase days, in exact milli-units), and the
    * integer residual — the number anomaly detection should consume
    * INSTEAD of the raw count on anything with a weekly pulse
    * (crawls, user events, ingestion feeds).
    *
    * The phase is `epoch_day mod 7` — a pure 7-bucket phase label, not
    * a calendar weekday claim: seasonality needs alignment, not
    * naming, and calendar/timezone arithmetic is exactly the
    * cross-engine divergence surface this file avoids (the unix_millis
    * convention). All arithmetic is long (milli-unit matched
    * truncation) — replays and engines agree bit-for-bit.
    *
    * Scale shape: one (key, day) partial-agg count over the scan, the
    * ≤ 7·|keys|-row phase table re-aggregated FROM those rows and
    * broadcast back — no window, no second scan; |key·days| rows out.
    */
  def seasonality(df: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    val days = df.filter(col(tsCol).isNotNull)
      .select(col(keyCol).as("k"),
        expr(s"unix_millis($tsCol) div 86400000L").as("day"))
      .groupBy("k", "day").agg(count(lit(1)).as("n"))
      .withColumn("phase", pmod(col("day"), lit(7L)))
    val phases = days.groupBy("k", "phase")
      .agg(sum(col("n")).as("pn"), count(lit(1)).as("pd"))
    days.join(broadcast(phases), Seq("k", "phase"))
      .select(col("k").as(keyCol), col("day"), col("phase"), col("n"),
        expr("(pn * 1000L) div pd").as("expected_milli"),
        expr("n * 1000L - (pn * 1000L) div pd").as("resid_milli"))
  }

  /** Lag autocorrelation sufficient statistics of per-key daily
    * volume — the period DETECTOR complementing [[seasonality]]'s
    * known-period decomposition: seasonality assumes the pulse is
    * weekly; this reports, for every lag 1..`maxLag`, the exact
    * integer sufficient statistics of the (xₜ, xₜ₊L) pair series, from
    * which r(L) = cov_num / √(varx_num·vary_num) — the lag whose
    * normalized autocorrelation peaks IS the feed's period (r(7)
    * spiking says "weekly", r(1) high says "trending/bursty"). The
    * division and square root are left to the READER (one |keys|·maxLag
    * row table) because they are the two ops with cross-engine ulp
    * surface; everything emitted is BIGINT: n_pairs, Σx, Σy, Σxy, Σx²,
    * Σy², and the centered numerators n·Σxy−ΣxΣy / n·Σx²−(Σx)² /
    * n·Σy²−(Σy)² (counts are day volumes, far inside 2⁶³ headroom —
    * overflow needs Σx² ≈ 9.2e18, i.e. ~3e9 events/day for a year).
    *
    * Missing days count as ZERO, not absent — autocorrelation over a
    * gappy series without the grid silently correlates "adjacent
    * observations" instead of "adjacent days" and a perfectly weekly
    * feed with quiet Sundays would lose its own period. The grid is
    * per-key [min_day, max_day].
    *
    * Scale shape: one (key, day) partial-agg count, a bounded
    * per-key span explode (days, not events), then ONE window
    * partitioned by key producing all `maxLag` leads in a single
    * pass — no self-join, no per-lag scan; the stack explode is
    * maxLag narrow integer rows per grid day, into a partial-agg
    * groupBy(key, lag) of |keys|·maxLag rows.
    */
  def autocorr(df: DataFrame, keyCol: String, tsCol: String,
               maxLag: Int = 10): DataFrame = {
    require(maxLag >= 1 && maxLag <= 60, s"maxLag in [1,60], got $maxLag")
    val days = df.filter(col(tsCol).isNotNull)
      .select(col(keyCol).as("k"),
        expr(s"unix_millis($tsCol) div 86400000L").as("day"))
      .groupBy("k", "day").agg(count(lit(1)).as("n"))
    val span = days.groupBy("k").agg(min("day").as("lo"), max("day").as("hi"))
    val grid = span.select(col("k"),
      explode(expr("sequence(lo, hi)")).as("day"))
    val filled = grid.join(days, Seq("k", "day"), "left")
      .select(col("k"), col("day"), coalesce(col("n"), lit(0L)).as("x"))
    val w = Window.partitionBy("k").orderBy("day")
    val withLeads = (1 to maxLag).foldLeft(filled) { (acc, l) =>
      acc.withColumn(s"y$l", lead(col("x"), l).over(w))
    }
    val stacked = withLeads.select(col("k"), col("x"),
      explode(array((1 to maxLag).map(l =>
        struct(lit(l.toLong).as("lag"), col(s"y$l").as("y"))): _*))
        .as("p"))
      .select(col("k"), col("p.lag").as("lag"), col("x"), col("p.y").as("y"))
      .filter(col("y").isNotNull)
    stacked.groupBy("k", "lag")
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .select(col("k").as(keyCol), col("lag"), col("n_pairs"),
        col("sx"), col("sy"), col("sxy"), col("sxx"), col("syy"),
        (col("n_pairs") * col("sxy") - col("sx") * col("sy"))
          .as("cov_num"),
        (col("n_pairs") * col("sxx") - col("sx") * col("sx"))
          .as("varx_num"),
        (col("n_pairs") * col("syy") - col("sy") * col("sy"))
          .as("vary_num"))
  }
}
