package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.util.Tables

/** General analytic query surface (SURVEY §2 B-block).
  *
  * Correctness-parity rules shared with the DuckDB oracles:
  *  - money/quantity aggregates are summed as decimal(18,2) (exact and
  *    order-independent — a double sum's value depends on partial-agg
  *    order across partitions) and only cast to double at the end;
  *  - averages are computed as cast(sum_dec as double)/count so both
  *    engines perform the identical single IEEE division;
  *  - every query has a deterministic output set (unique keys or an
  *    explicit tie-break ordering before any limit).
  *
  * Scale notes: all scans are column-pruned + filter-pushed (verified
  * via explain in `PlanAuditSpec`); dimension joins broadcast; fact-fact
  * joins shuffle once on the join key and AQE handles skew.
  */
object Analytics {

  private def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(18,2)")

  /** TPC-H Q1-style pricing summary. */
  def q1Agg(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir)
      .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        sum(dec($"l_quantity")).cast("double").as("sum_qty"),
        sum(dec($"l_extendedprice")).cast("double").as("sum_base_price"),
        sum((dec($"l_extendedprice") * (lit(1.0) - $"l_discount")).cast("decimal(18,4)"))
          .cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
  }

  /** TPC-H Q3-style shipping-priority revenue top-10. */
  def q3JoinAgg(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val cust = Tables.customer(spark, sfDir)
      .filter($"c_mktsegment" === "BUILDING").select("c_custkey")
    val ord = Tables.orders(spark, sfDir)
      .filter($"o_orderdate" < lit("1997-03-15").cast("timestamp"))
      .select("o_orderkey", "o_custkey", "o_orderdate")
    val li = Tables.lineitem(spark, sfDir)
      .filter($"l_shipdate" > lit("1997-03-15").cast("timestamp"))
      .select("l_orderkey", "l_extendedprice", "l_discount")
    li.join(ord, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(cust), $"o_custkey" === $"c_custkey")
      .groupBy($"l_orderkey", $"o_orderdate")
      .agg(sum((dec($"l_extendedprice") * (lit(1.0) - $"l_discount")).cast("decimal(18,4)"))
        .cast("double").as("revenue"))
      .orderBy($"revenue".desc, $"l_orderkey".asc)
      .limit(10)
  }

  /** TPC-H Q5-style local-supplier volume by nation. */
  def q5MultiJoin(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val reg = Tables.region(spark, sfDir).filter($"r_name" === "ASIA").select("r_regionkey")
    val nat = Tables.nation(spark, sfDir).select("n_nationkey", "n_name", "n_regionkey")
    val natAsia = nat.join(broadcast(reg), $"n_regionkey" === $"r_regionkey")
      .select("n_nationkey", "n_name")
    val cust = Tables.customer(spark, sfDir).select("c_custkey", "c_nationkey")
    val sup = Tables.supplier(spark, sfDir).select("s_suppkey", "s_nationkey")
    val ord = Tables.orders(spark, sfDir)
      .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
              $"o_orderdate" <  lit("1997-01-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey")
    val li = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    li.join(ord, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(sup), $"l_suppkey" === $"s_suppkey")
      .join(cust, $"o_custkey" === $"c_custkey" && $"c_nationkey" === $"s_nationkey")
      .join(broadcast(natAsia), $"s_nationkey" === $"n_nationkey")
      .groupBy($"n_name")
      .agg(sum((dec($"l_extendedprice") * (lit(1.0) - $"l_discount")).cast("decimal(18,4)"))
        .cast("double").as("revenue"))
  }

  /** Grouping-sets rollup: per-(flag,status) totals plus per-flag and
    * grand subtotals in one pass (Spark computes rollup with a single
    * expand + partial aggregation — no re-scan per grouping set).
    * Group keys are coalesced to 'ALL' sentinels: the source columns
    * are non-null, and the driver's hash compare can't equate NULLs.
    */
  def q1Rollup(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir)
      .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
      .rollup($"l_returnflag", $"l_linestatus")
      .agg(
        sum(dec($"l_quantity")).cast("double").as("sum_qty"),
        count(lit(1)).as("count_order"))
      .select(
        coalesce($"l_returnflag", lit("ALL")).as("l_returnflag"),
        coalesce($"l_linestatus", lit("ALL")).as("l_linestatus"),
        $"sum_qty", $"count_order")
  }

  /** Full grouping-sets CUBE: per-(priority, status) totals plus BOTH
    * single-dimension subtotals and the grand total — the cross-tab
    * q1_rollup's hierarchy can't express — still ONE expand +
    * partial-aggregation pass (2ⁿ grouping sets expand map-side; no
    * re-scan per set). Same 'ALL' sentinel convention as q1_rollup.
    */
  def qCube(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, sfDir)
      .cube($"o_orderpriority", $"o_orderstatus")
      .agg(count(lit(1)).as("n_orders"),
        sum(dec($"o_totalprice")).cast("double").as("sum_price"))
      .select(
        coalesce($"o_orderpriority", lit("ALL")).as("o_orderpriority"),
        coalesce($"o_orderstatus", lit("ALL")).as("o_orderstatus"),
        $"n_orders", $"sum_price")
  }

  /** Exact LOWER quantiles per group: the price at 0-based rank
    * floor(p·(n−1)) of the group's ascending order — an actual sampled
    * double, carried through untouched, so the output is bit-exact on
    * both engines (the round-9 output contract: interpolated
    * `percentile`/`quantile_cont` doubles drift by ulps across engine
    * builds — the class that hash-FAILED profile_embeddings in round
    * 8; a sampled value cannot). Rank thresholds are pure integer
    * division (p·(n−1) at p = k/4 is (n−1)·k div 4).
    *
    * Scale shape: a per-(group, value) count aggregate (partial) plus
    * ONE per-group ordered cumulative pass over the distinct values —
    * no full-group sort buffer, unlike Spark's `percentile`, which
    * collects each group; this plan also survives unbounded group
    * sizes (the window is over distinct values). At extreme distinct
    * counts use approx_percentile (t-digest, mergeable) instead.
    */
  def qPercentiles(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val pr = Tables.orders(spark, sfDir)
      .select($"o_orderpriority".as("g"), $"o_totalprice".as("v"))
    val counts = pr.groupBy("g", "v").agg(count(lit(1)).as("cnt"))
    val totals = pr.groupBy("g").agg(count(lit(1)).as("n_orders"))
    val wCum = Window.partitionBy("g").orderBy($"v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    counts.join(broadcast(totals), Seq("g"))
      .withColumn("cum", sum($"cnt").over(wCum))
      .groupBy($"g")
      .agg(
        min(when($"cum" >= expr("(n_orders - 1) div 4 + 1"), $"v")).as("p25"),
        min(when($"cum" >= expr("(n_orders - 1) div 2 + 1"), $"v")).as("p50"),
        min(when($"cum" >= expr("((n_orders - 1) * 3) div 4 + 1"), $"v")).as("p75"),
        max($"n_orders").as("n_orders"))
      .withColumnRenamed("g", "o_orderpriority")
  }

  /** Top-3 orders by total price within each order priority. */
  def qTopkWindow(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_orderpriority")
      .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
    Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_orderpriority", "o_totalprice")
      .withColumn("rank_in_priority", row_number().over(w))
      .filter($"rank_in_priority" <= 3)
  }

  /** Tumbling 1-hour window aggregation over the events stream table. */
  def qEventsWindow(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .groupBy(date_trunc("hour", $"ts").as("hour_start"), $"event_type")
      .agg(
        count(lit(1)).as("n_events"),
        sum($"value".cast("decimal(18,4)")).cast("double").as("sum_value"),
        count_distinct($"user_id").as("n_users"))
  }

  /** Sessionization: a new session starts after a >30-minute gap per
    * user. Single window shuffle on user_id; at 100 TB this is one
    * hash-partitioned sort per user which AQE sizes (no driver state).
    */
  def qEventsSessionize(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val byUser = Window.partitionBy($"user_id").orderBy($"ts".asc, $"event_id".asc)
    Tables.events(spark, sfDir)
      .select($"user_id", $"event_id", unix_millis($"ts").as("ts_ms"))
      .withColumn("prev_ms", lag($"ts_ms", 1).over(
        Window.partitionBy($"user_id").orderBy($"ts_ms".asc, $"event_id".asc)))
      .withColumn("new_session",
        when($"prev_ms".isNull || ($"ts_ms" - $"prev_ms") > 1800000L, 1L).otherwise(0L))
      .withColumn("session_seq", sum($"new_session").over(
        Window.partitionBy($"user_id").orderBy($"ts_ms".asc, $"event_id".asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select($"user_id", $"event_id", $"ts_ms", $"session_seq")
  }

  /** Point-in-time join: each click event annotated with the user's
    * latest purchase at-or-before the click (B8; graft.ops.AsOfJoin —
    * union + one per-key window, single shuffle).
    */
  def qAsofJoin(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, sfDir)
    val clicks = ev.filter($"event_type" === "click")
      .select($"event_id".as("click_id"), $"user_id", unix_millis($"ts").as("ts_ms"))
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", unix_millis($"ts").as("ts_ms"),
        $"event_id".as("purchase_id"), $"value".as("purchase_value"))
    // no-match sentinels (-1): ids are ≥ 0 and values ≥ 0.01, and the
    // driver's hash compare can't equate NULL/NaN across engines
    graft.ops.AsOfJoin.asOf(clicks, purchases, Seq("user_id"), "ts_ms",
      payloadCols = Seq("purchase_id", "purchase_value"),
      tieBreak = Seq("purchase_id"))
      .withColumn("purchase_id", coalesce($"purchase_id", lit(-1L)))
      .withColumn("purchase_value", coalesce($"purchase_value", lit(-1.0)))
  }

  /** Range (point-in-interval) join: clicks attributed to every 2-hour
    * promo window they fall in (windows anchored at a deterministic
    * subset of purchases). No equality key — the naive plan is a
    * broadcast-nested-loop comparing every click against every window;
    * `graft.ops.RangeJoin` bins the time axis so Catalyst plans an
    * ordinary broadcast HASH join on the bin (plan-audited): the click
    * side streams through one map-side stage, zero shuffles.
    */
  def qRangeJoin(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val winMs = 7200000L // 2 h, also the bin width (fan-out ≤ 2 bins/window)
    val ev = Tables.events(spark, sfDir)
    val clicks = ev.filter($"event_type" === "click")
      .select($"event_id".as("click_id"), unix_millis($"ts").as("ts_ms"), $"value")
    val promos = ev.filter($"event_type" === "purchase" && $"event_id" % 50 === 0)
      .select($"event_id".as("promo_id"), unix_millis($"ts").as("lo_ms"),
        (unix_millis($"ts") + winMs).as("hi_ms"))
    graft.ops.RangeJoin.pointInInterval(clicks, "ts_ms", promos, "lo_ms", "hi_ms", winMs)
      .groupBy($"promo_id")
      .agg(count(lit(1)).as("n_clicks"),
        sum($"value".cast("decimal(18,4)")).cast("double").as("click_value"))
  }

  /** Running cumulative quantity per supplier ordered by ship date.
    * The ORDER BY must be a TOTAL order for a ROWS frame to be
    * deterministic: the synthetic lineitem duplicates
    * (shipdate, orderkey, linenumber) within a supplier (one collision
    * at sf0.1, different quantities), and engines then disagree — or a
    * single engine disagrees with itself across parallel runs — on the
    * tied rows' partial sums. quantity+extendedprice break the tie.
    */
  def qRunningSum(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"l_suppkey")
      .orderBy($"l_shipdate".asc, $"l_orderkey".asc, $"l_linenumber".asc,
        $"l_quantity".asc, $"l_extendedprice".asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.lineitem(spark, sfDir)
      .select("l_suppkey", "l_orderkey", "l_linenumber", "l_shipdate",
        "l_quantity", "l_extendedprice")
      .withColumn("running_qty", sum(dec($"l_quantity")).over(w).cast("double"))
      .select("l_suppkey", "l_orderkey", "l_linenumber", "running_qty")
  }

  /** Time-based rolling aggregate: each event annotated with the
    * user's 24-hour trailing value sum and event count — a RANGE
    * frame over event-time milliseconds, NOT a ROWS frame: the frame
    * is defined by the ORDER-BY VALUE, so simultaneous events are
    * always in or out together and the result needs no tie-break
    * columns to be deterministic. One shuffle on user_id, per-user
    * sort, frame evaluated in a single pass (sliding accumulator).
    */
  def qRollingWindow(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts_ms".asc)
      .rangeBetween(-86400000L, 0L)
    Tables.events(spark, sfDir)
      .select($"user_id", $"event_id", unix_millis($"ts").as("ts_ms"), $"value")
      .withColumn("rolling_value",
        sum($"value".cast("decimal(18,4)")).over(w).cast("double"))
      .withColumn("rolling_events", count(lit(1)).over(w))
      .select("user_id", "event_id", "ts_ms", "rolling_value", "rolling_events")
  }

  /** Metric-anomaly scan (graft.ops.Profile.zscoreOutliers): events
    * whose value sits more than 3σ from their event type's mean —
    * exact-long moment sums (cents quantization) + one fixed IEEE
    * chain (×,−,÷,√ only, all correctly rounded), so the flagged set
    * and milli-z scores replay bit-for-bit in DuckDB.
    */
  def qAnomalyZscore(spark: SparkSession, sfDir: String): DataFrame =
    graft.ops.Profile.zscoreOutliers(
      Tables.events(spark, sfDir).select("event_id", "event_type", "value"),
      "event_type", "value", zThreshold = 3.0)
      .select("event_id", "event_type", "value", "z_milli")

  /** Robust (median/MAD) outlier scan — the heavy-tail-safe sibling
    * of q_anomaly_zscore: flags events > 5 MAD from their type's
    * median.
    */
  def qAnomalyMad(spark: SparkSession, sfDir: String): DataFrame =
    graft.ops.Profile.madOutliers(
      Tables.events(spark, sfDir).select("event_id", "event_type", "value"),
      "event_type", "value", k = 5.0)
      .select("event_id", "event_type", "value", "mad_score_milli")

  /** Robust feature scaling (graft.ops.Profile.robustScale): every
    * event's value re-expressed as milli-units of its type's IQR from
    * the type median — the model-input normalization that survives
    * the heavy tails that drag z-scores. Integer-exact: cents
    * quantization, LOWER exact quantiles, explicit floor division for
    * the signed deviation.
    */
  def qRobustScale(spark: SparkSession, sfDir: String): DataFrame =
    graft.ops.Profile.robustScale(
      Tables.events(spark, sfDir).select("event_id", "event_type", "value"),
      "event_type", "event_id", "value")

  /** Exact integer percent-rank per group — the distribution
    * normalizer behind quantile features and per-segment score
    * calibration: each order's price position inside its priority as
    * micro-units of [0, 1]. Total order (value, key) makes ranks
    * unique, so pr_micro = ((rn − 1)·10⁶) div (n − 1) is pure integer
    * arithmetic — no interpolated doubles anywhere. Scale shape: ONE
    * shuffle on the group key, per-group sort window (the standard
    * rank plan; the same hot-key caveat as topk_window).
    */
  def qPercentRank(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_orderpriority")
      .orderBy($"o_totalprice".asc, $"o_orderkey".asc)
    val wc = Window.partitionBy($"o_orderpriority")
    Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_orderpriority", "o_totalprice")
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(wc))
      .select($"o_orderkey", $"o_orderpriority",
        when($"n" > 1L, expr("((rn - 1) * 1000000) div (n - 1)"))
          .otherwise(lit(0L)).as("pr_micro"))
  }

  /** Semi-structured extraction: pull the numeric `k` field out of
    * the events JSON props column and aggregate per event type —
    * `get_json_object` is a codegen'd path expression, so extraction
    * fuses into the scan (no UDF, no parse-to-struct materialization)
    * and the aggregate is one partial-combined shuffle of |types|
    * rows.
    */
  def qPropsExtract(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("event_type")
      .agg(count(col("k")).as("n_with_k"), sum("k").as("sum_k"),
        min("k").as("min_k"), max("k").as("max_k"))

  /** Join-key skew profile of orders.o_custkey: top-20 heaviest keys
    * with corpus share — the diagnostic run before picking broadcast /
    * salt / AQE-skew strategy for the customer⋈orders join. One
    * shuffled aggregate (exchange reused for the total), ordered-limit
    * top-k (TakeOrderedAndProject, no global sort).
    */
  def qHeavyHitters(spark: SparkSession, sfDir: String): DataFrame =
    graft.ops.Profile.heavyHitters(
      Tables.orders(spark, sfDir).select("o_custkey"), "o_custkey", 20)

  /** Pivot: per-returnflag quantity totals spread across linestatus
    * columns (explicit pivot values keep the schema static — at scale
    * an inferred pivot would need an extra distinct pass). Absent
    * cells surface as 0, not NULL (driver hash contract).
    */
  def qPivot(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir)
      .select("l_returnflag", "l_linestatus", "l_quantity")
      .groupBy("l_returnflag").pivot("l_linestatus", Seq("F", "O"))
      .agg(sum(dec($"l_quantity")))
      .select($"l_returnflag",
        coalesce($"F", lit(0)).cast("double").as("qty_f"),
        coalesce($"O", lit(0)).cast("double").as("qty_o"))
  }

  /** Morton (Z-order) clustering key over (l_partkey, l_suppkey) —
    * the multi-dimensional layout key `graft.ops.ZOrder.writeClustered`
    * sorts by at write time so scan-time min/max pruning works for
    * filters on EITHER column. Pure codegen'd integer arithmetic,
    * bit-identical in DuckDB.
    */
  def qZorderKey(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
      .withColumn("zkey", graft.ops.ZOrder.zkey(
        Seq(pmod($"l_partkey", lit(65536L)), pmod($"l_suppkey", lit(65536L))), 16))
      .select("l_orderkey", "l_linenumber", "zkey")
  }

  /** Existential (semi-join) shape: orders with at least one returned
    * line item. The probe side is column-pruned to the join key before
    * the shuffle and duplicates never cross the wire — a semi join
    * ships ONE bit per key, where an inner-join + distinct would ship
    * every matching row and re-shuffle to dedup.
    */
  def qSemiJoin(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val late = Tables.lineitem(spark, sfDir)
      .filter($"l_returnflag" === "R")
      .select($"l_orderkey".as("o_orderkey"))
    Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_orderpriority")
      .join(late, Seq("o_orderkey"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_late_orders"))
  }

  /** Negated-existential (anti-join) shape: customers with NO order
    * above 300k — the NOT EXISTS plan, one shuffled anti join with
    * the probe side pruned to its key (non-empty at every sf).
    */
  def qAntiJoin(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val recent = Tables.orders(spark, sfDir)
      .filter($"o_totalprice" > 300000.0)
      .select($"o_custkey".as("c_custkey"))
    Tables.customer(spark, sfDir)
      .select("c_custkey", "c_mktsegment")
      .join(recent, Seq("c_custkey"), "left_anti")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_dormant"))
  }

  /** Skewed fact⋈dim via explicit salting (`graft.ops.SkewJoin.salted`):
    * the join key fans out ×8 so no single reducer owns a heavy part
    * key; the aggregate on top is unchanged. Result is row-identical
    * to the plain join — the oracle IS the plain join, so the gate
    * proves the salting rewrite loses/duplicates nothing.
    */
  def qSkewSaltedJoin(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, sfDir)
      .select($"l_partkey", $"l_extendedprice", $"l_discount")
    val pt = Tables.part(spark, sfDir)
      .filter($"p_size" <= 15)
      .select($"p_partkey".as("l_partkey"), $"p_brand")
    graft.ops.SkewJoin.salted(li, pt, "l_partkey", nSalts = 8)
      .groupBy("p_brand")
      .agg(sum((dec($"l_extendedprice") * (lit(1.0) - $"l_discount"))
          .cast("decimal(18,4)")).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** Selective dim join with a Bloom-filter pre-prune
    * (`graft.ops.SkewJoin.bloomPruned`): urgent orders are ~20% of the
    * dim, so ~80% of lineitem rows die map-side at the scan instead of
    * crossing the shuffle. The exact join above the filter removes
    * Bloom false positives — the oracle is the plain join.
    */
  def qBloomJoin(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val fact = Tables.lineitem(spark, sfDir)
      .select($"l_orderkey", $"l_extendedprice", $"l_returnflag")
    val dim = Tables.orders(spark, sfDir)
      .filter($"o_orderpriority" === "1-URGENT")
      .select($"o_orderkey")
    graft.ops.SkewJoin.bloomPruned(fact, dim, "l_orderkey", "o_orderkey",
        expectedItems = 1 << 20)
      .groupBy("l_returnflag")
      .agg(sum(dec($"l_extendedprice")).cast("double").as("urgent_revenue"),
        count(lit(1)).as("n_items"))
  }

  /** Distinct aggregate: distinct users + raw event count per type.
    * Spark plans COUNT(DISTINCT) with an Expand + two-phase partial
    * aggregation — the distinct set is reduced per-partition before
    * the shuffle, so wire bytes are bounded by local distinct counts,
    * not row counts. At truly unbounded cardinality swap in
    * approx_count_distinct (HLL, constant-size mergeable sketch).
    */
  def qDistinctAgg(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .groupBy($"event_type")
      .agg(countDistinct($"user_id").as("n_users"),
        count(lit(1)).as("n_events"))
  }

  /** Ordered conversion funnel (view → click → purchase): per user,
    * the first click AFTER the first view, then the first purchase
    * AFTER that click; output = one row of stage-survivor counts.
    *
    * Scale shape: three chained (agg on user_id → join on user_id)
    * stages all hash-partition by the SAME key, so after the first
    * exchange the rest are co-located (no re-shuffle of events); the
    * per-stage aggregates are partial min/count. No window over the
    * whole event stream, no per-user sort.
    */
  def qFunnel(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, sfDir).select("user_id", "event_type", "ts")
    val v = e.filter($"event_type" === "view")
      .groupBy("user_id").agg(min("ts").as("v_ts"))
    val c = e.filter($"event_type" === "click").join(v, "user_id")
      .filter($"ts" > $"v_ts")
      .groupBy("user_id").agg(min("ts").as("c_ts"))
    val p = e.filter($"event_type" === "purchase").join(c, "user_id")
      .filter($"ts" > $"c_ts")
      .groupBy("user_id").agg(min("ts").as("p_ts"))
    v.agg(count(lit(1)).as("n_view"))
      .crossJoin(c.agg(count(lit(1)).as("n_view_click")))
      .crossJoin(p.agg(count(lit(1)).as("n_full_funnel")))
  }

  /** Weekly cohort retention: cohort = week of a user's FIRST event,
    * k = whole weeks since the cohort week; cell = distinct users of
    * that cohort active in week k. First-event cohorts are one
    * partial-min aggregate; the activity matrix dedups (user, week)
    * pairs map-side (distinct over already user-partitioned rows),
    * joins cohorts on the SAME user_id partitioning, and the final
    * rollup is partial-counted. Week arithmetic is exact integer
    * days/7 between Monday-truncated stamps — identical on every
    * engine, no session-timezone dependence (UTC sessions).
    */
  def qCohortRetention(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, sfDir).select("user_id", "ts")
    val cohorts = e.groupBy("user_id")
      .agg(date_trunc("week", min("ts")).as("cohort_week"))
    val active = e.select($"user_id", date_trunc("week", $"ts").as("wk")).distinct()
    active.join(cohorts, "user_id")
      .groupBy($"cohort_week",
        (datediff($"wk", $"cohort_week") / 7).cast("long").as("week_k"))
      .agg(countDistinct($"user_id").as("n_active"))
  }

  /** Cohort lifetime value (B48): per (cohort week, age week), active
    * users, period value, and the CUMULATIVE value each cohort has
    * produced by that age — retention's revenue-weighted sibling.
    * Cents-exact BIGINT sums; the cumulative window is PARTITIONED by
    * cohort over the tiny (cohort × age) table. Same two-aggregation
    * shape as q_cohort_retention (cohort derivation shares one scan).
    */
  def qCohortLtv(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    graft.ops.Stats.cohortLtv(
      Tables.events(spark, sfDir)
        .filter($"ts".isNotNull && $"value".isNotNull)
        .select($"user_id", $"ts",
          round($"value" * 100).cast("long").as("cents")),
      "user_id", "ts", "cents")
  }

  /** Kaplan–Meier churn survival (B52; graft.ops.Stats.kaplanMeier):
    * customer lifetimes from orders (first→last order, 30-day
    * periods), right-censored inside 60 days of the stream horizon —
    * the estimator the cohort family lacks (a naive tenure-churn
    * table counts censored customers as churned and biases every
    * recent cohort down). Quantized-ln hazard/survival per the
    * micro-nat convention; poison flag keeps the undefined tail NULL.
    */
  def qSurvival(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    graft.ops.Stats.kaplanMeier(
      Tables.orders(spark, sfDir).filter($"o_orderdate".isNotNull),
      "o_custkey", col("o_orderdate"),
      periodDays = 30, churnGapDays = 60)
  }

  /** Layout prune-rate simulator (B15b; graft.ops.ZOrder.pruneSim):
    * the min/max-footer pruning report over three simulated layouts
    * of lineitem (range by partkey, range by suppkey, Z-order over
    * both) against a 16-cell predicate grid per dimension — the data
    * that decides a re-clustering job. 64 files, 10-bit masked
    * domains; all integer, the oracle replays the whole simulation
    * including the Morton key.
    */
  def qPruneSim(spark: SparkSession, sfDir: String): DataFrame =
    graft.ops.ZOrder.pruneSim(
      Tables.lineitem(spark, sfDir), "l_partkey", "l_suppkey",
      bitsPer = 10, nFiles = 64, nPreds = 16)

  /** Conversion latency (B53; graft.ops.Stats.timeToConvert): per
    * signup-cohort week, how many signups convert to a first purchase
    * and how fast — floor-ppm rate over ALL signups (unconverted stay
    * in the denominator) + lower weighted p50/p90 latency minutes of
    * the converted. The time dimension q_funnel's step counts drop.
    */
  def qTimeToConvert(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    graft.ops.Stats.timeToConvert(
      Tables.events(spark, sfDir),
      "user_id", $"ts", $"event_type", "signup", "purchase",
      qPpm = Seq(500000L, 900000L))
  }

  /** Session basket affinity (B51; graft.ops.Stats.basketAffinity):
    * which event types co-occur in a 30-minute session, with integer
    * lift — the unordered sibling of q_markov_transitions.
    */
  def qBasketAffinity(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    graft.ops.Stats.basketAffinity(
      Tables.events(spark, sfDir).filter($"ts".isNotNull)
        .select($"user_id", $"event_id", $"event_type",
          unix_millis($"ts").as("ts_ms")),
      "user_id", col("ts_ms"), col("event_id"), "event_type",
      gapMs = 1800000L)
  }

  /** RFM segmentation (B49): per-user recency (days since last
    * purchase, stream-time anchored), frequency (purchase count) and
    * monetary (cents), bucketed by fixed thresholds into the classic
    * 2×2×2 segment grid and counted per segment — the lifecycle
    * marketing table. One partial agg per user + a broadcast anchor +
    * one tiny segment agg; everything BIGINT.
    */
  def qRfm(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val p = Tables.events(spark, sfDir)
      .filter($"event_type" === "purchase" && $"ts".isNotNull &&
        $"value".isNotNull)
      .select($"user_id", expr("unix_millis(ts) DIV 86400000").as("day"),
        round($"value" * 100).cast("long").as("cents"))
    val anchor = p.agg(max("day").as("mx"))
    val rfm = p.groupBy("user_id")
      .agg(max("day").as("last_day"), count(lit(1)).as("frequency"),
        sum("cents").as("monetary_cents"))
      .crossJoin(broadcast(anchor))
      .withColumn("recency_days", $"mx" - $"last_day")
    rfm.groupBy(
        when($"recency_days" <= 1L, lit("R1")).otherwise(lit("R0")).as("r"),
        when($"frequency" >= 13L, lit("F1")).otherwise(lit("F0")).as("f"),
        when($"monetary_cents" >= 59000L, lit("M1")).otherwise(lit("M0"))
          .as("m"))
      .agg(count(lit(1)).as("n_users"),
        sum($"monetary_cents").as("segment_cents"))
  }

  /** DAU/MAU stickiness per stream month (B50): average daily actives
    * over monthly actives, in ppm — the engagement-density readout.
    * Exact integers: Σ per-day distinct counts over a month divided
    * by (days-in-month-with-data × monthly distinct). Two distinct
    * aggregations + a tiny per-month fold.
    */
  def qStickiness(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, sfDir).filter($"ts".isNotNull)
      .select($"user_id", expr("unix_millis(ts) DIV 86400000").as("day"))
      .withColumn("month", expr("day DIV 30"))
    val daily = e.select($"month", $"day", $"user_id").distinct()
      .groupBy("month", "day").agg(count(lit(1)).as("dau"))
      .groupBy("month").agg(sum("dau").as("dau_sum"),
        count(lit(1)).as("n_days"))
    val monthly = e.select($"month", $"user_id").distinct()
      .groupBy("month").agg(count(lit(1)).as("mau"))
    daily.join(monthly, "month")
      .select($"month", $"n_days", $"mau",
        expr("dau_sum * 1000000 DIV (n_days * mau)").as("stickiness_ppm"))
  }

  /** Join-strategy advisor on the lineitem⋈urgent-orders shape: two
    * partial-aggregated diagnostic passes emit one decision row
    * (broadcast / salt / bloom / shuffle) — see SkewJoin.advise.
    * Thresholds picked so the decision itself is scale-dependent:
    * at sf0.001 the urgent key set fits the broadcast budget, at
    * sf0.01+ it overflows and the ~20% match coverage flips the
    * recommendation to a Bloom prune.
    */
  def qJoinAdvise(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    graft.ops.SkewJoin.advise(
      Tables.lineitem(spark, sfDir).select("l_orderkey"),
      Tables.orders(spark, sfDir)
        .filter($"o_orderpriority" === "1-URGENT").select("o_orderkey"),
      "l_orderkey", "o_orderkey",
      broadcastRows = 1000L, skewRowsPerTask = 100L, bloomCoverage = 0.5)
  }

  /** Hourly LOCF resample of the event stream per user — B-block
    * time-series regularization (graft.ops.TimeSeries.gapFill).
    */
  def qGapFill(spark: SparkSession, sfDir: String): DataFrame =
    graft.ops.TimeSeries.gapFill(Tables.events(spark, sfDir),
        "user_id", "ts", "value", stepSeconds = 3600L)
      // gate hygiene: grid points before a key's first observation are
      // honestly NULL; the hash gate compares sorted tuples, so encode
      // null as (has_value = 0, value = 0.0) instead of a NaN that
      // breaks tuple ordering
      .select(col("user_id"), col("bucket_ts"),
        (col("filled_value").isNotNull).cast("int").as("has_value"),
        coalesce(col("filled_value"), lit(0.0)).as("filled_value"),
        col("n_events"))

  /** Last-touch attribution of purchases to clicks within 6 hours. */
  def qAttribution(spark: SparkSession, sfDir: String): DataFrame =
    graft.ops.TimeSeries.lastTouch(Tables.events(spark, sfDir),
      "user_id", "ts", "event_type", "event_id",
      touchType = "click", convType = "purchase",
      lookbackSeconds = 6L * 3600L)

  /** Coverage accounting: events open 30-minute activity windows;
    * merged per-user islands give exact covered time (overlaps never
    * double-counted), island count and the longest stretch.
    */
  def qGapsIslands(spark: SparkSession, sfDir: String): DataFrame =
    graft.ops.TimeSeries.mergeIntervals(
        Tables.events(spark, sfDir).select(col("user_id"),
          expr("unix_millis(ts)").as("s"),
          (expr("unix_millis(ts)") + lit(1800000L)).as("e")),
        "user_id", "s", "e")
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_islands"),
        sum(col("island_end") - col("island_start")).as("covered_ms"),
        max(col("island_end") - col("island_start")).as("max_island_ms"),
        sum(col("n_intervals")).as("n_events"))

  /** Each click matched to the user's closest purchase in either
    * direction (ties prefer the backward/as-of match).
    */
  def qNearestJoin(spark: SparkSession, sfDir: String): DataFrame =
    graft.ops.TimeSeries.nearestJoin(Tables.events(spark, sfDir),
      "user_id", "ts", "event_type", "event_id",
      leftType = "click", rightType = "purchase")

  /** Per-user trailing EWMA of event values (TimeSeries.ewma, k = 4
    * lags, halving weights, integer milli output). */
  def qEwma(spark: SparkSession, sfDir: String): DataFrame =
    graft.ops.TimeSeries.ewma(Tables.events(spark, sfDir),
      "user_id", "ts", "value", "event_id", k = 4)

  /** Period-over-period volume report — the release-dashboard number
    * next to q_seasonality's residuals: per event type, row counts in
    * the trailing 7 stream-days vs the 7 before, with the exact
    * integer delta ppm. The period anchor is STREAM time (global max
    * epoch-day, one broadcast row), never wall clock — reruns are
    * byte-identical. One scan, one conditional-sum groupBy.
    */
  def qPeriodCompare(spark: SparkSession, sfDir: String): DataFrame = {
    val days = Tables.events(spark, sfDir)
      .filter(col("ts").isNotNull)
      .select(col("event_type"),
        expr("unix_millis(ts) div 86400000L").as("day"))
    val maxd = days.agg(max(col("day")).as("maxd"))
    days.crossJoin(broadcast(maxd))
      .groupBy("event_type")
      .agg(
        sum(when(col("day") > col("maxd") - 7L, 1L).otherwise(0L)).as("cur"),
        sum(when(col("day") <= col("maxd") - 7L &&
          col("day") > col("maxd") - 14L, 1L).otherwise(0L)).as("prev"))
      .withColumn("delta_ppm",
        expr("((cur - prev) * 1000000L) div greatest(prev, 1L)"))
  }

  /** Weekly-phase seasonal decomposition of per-type daily event
    * volume: observed vs same-phase expected counts, exact integer
    * residuals.
    */
  def qSeasonality(spark: SparkSession, sfDir: String): DataFrame =
    graft.ops.TimeSeries.seasonality(Tables.events(spark, sfDir),
      "event_type", "ts")

  /** Lag-autocorrelation period detection (TimeSeries.autocorr) over
    * per-event-type daily volume: exact integer sufficient statistics
    * for lags 1..10 — the report that says WHAT period q_seasonality
    * should decompose at. Zero-filled per-key day grid; one window
    * pass, one groupBy.
    */
  def qAutocorr(spark: SparkSession, sfDir: String): DataFrame =
    graft.ops.TimeSeries.autocorr(Tables.events(spark, sfDir),
      "event_type", "ts", maxLag = 10)

  /** Interval-overlap join (RangeJoin.overlapJoin): each click opens a
    * 10-minute activity window, each purchase a 10-minute settlement
    * window; pair every overlapping (click, purchase) window per user
    * with the exact overlap length. binWidth = the window length, so
    * interval fan-out is exactly 2 bins.
    */
  def qIntervalJoin(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, sfDir)
    def side(t: String, key: String, id: String) =
      ev.filter($"event_type" === t && $"ts".isNotNull)
        .select(col("user_id").as(key), col("event_id").as(id),
          expr("unix_millis(ts)").as(s"${id}_s"),
          (expr("unix_millis(ts)") + lit(600000L)).as(s"${id}_e"))
    graft.ops.RangeJoin.overlapJoin(
        side("click", "k_l", "click_id"), "click_id_s", "click_id_e",
        side("purchase", "k_r", "purchase_id"), "purchase_id_s", "purchase_id_e",
        Seq(("k_l", "k_r")), binWidth = 600000L)
      .select(col("k_l").as("user_id"), col("click_id"), col("purchase_id"),
        greatest(col("click_id_s"), col("purchase_id_s")).as("o_start_ms"),
        (least(col("click_id_e"), col("purchase_id_e"))
          - greatest(col("click_id_s"), col("purchase_id_s"))).as("overlap_ms"))
  }

  /** Trailing 7-day active users per day (TimeSeries.slidingDistinct):
    * coverage-island plan — no per-day COUNT(DISTINCT), no calendar
    * range join; the oracle IS that naive plan.
    */
  def qSlidingDistinct(spark: SparkSession, sfDir: String): DataFrame =
    graft.ops.TimeSeries.slidingDistinct(Tables.events(spark, sfDir),
      "user_id", "ts", windowDays = 7)

  /** Per-user CUSUM changepoint: the split of the user's value history
    * that maximizes the scaled before/after mean separation
    * (TimeSeries.changepoint — integer-exact, ties to the earliest
    * split, before/after means in milli-units). */
  def qChangepoint(spark: SparkSession, sfDir: String): DataFrame =
    graft.ops.TimeSeries.changepoint(Tables.events(spark, sfDir),
      "user_id", "ts", "value", "event_id")

  /** Edit-distance record linkage (FuzzyJoin.join): suppliers vs a
    * deterministically corrupted re-issue (one char substituted at an
    * id-derived position — both engines construct the identical
    * corruption), q-gram blocked, levenshtein-verified. Keys carry an
    * id-derived hex tail: raw TPC-H names share a 15-char template
    * prefix, the operator's DOCUMENTED adversarial population (every
    * pair shares the template's grams, the count bound stops pruning,
    * and ~all |L|·|R| pairs reach the DP — measured 29 s at sf0.1);
    * the tail is the realistic discriminative-content case, where the
    * raised bound prunes non-twin pairs BEFORE the DP and cost is
    * ~linear in the match count. The bad case stays spec-guarded
    * (RandomizedSpec brute-force equality) and scaladoc-documented.
    */
  def qFuzzyJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val keyed = Tables.supplier(spark, sfDir)
      .select(col("s_suppkey").as("id"),
        concat(col("s_name"), lit("-"),
          substring(md5(col("s_suppkey").cast("string")), 1, 8)).as("name"))
    val mutated = keyed
      .withColumn("p", col("id") % 24 + lit(3))
      .select((col("id") + 100000L).as("id"),
        expr("concat(substr(name, 1, p - 1), 'z', " +
          "substr(name, p + 1, length(name)))").as("name"))
    graft.ops.FuzzyJoin.join(keyed, mutated, "id", "name", "id", "name",
      maxDist = 1, q = 3)
  }

  /** First-order Markov transition matrix over per-user event
    * sequences (B42; graft.ops.Stats.transitionMatrix): which
    * event_type follows which, with floor-ppm transition
    * probabilities. One shuffle on user_id for the lead window; the
    * normalization window runs over the |states|² table only.
    */
  def qMarkovTransitions(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    graft.ops.Stats.transitionMatrix(
      Tables.events(spark, sfDir)
        .select($"user_id", $"event_id", $"event_type",
          unix_millis($"ts").as("ts_ms")),
      "user_id", Seq($"ts_ms".asc, $"event_id".asc), "event_type")
  }

  /** Exact weighted quantiles (B43; graft.ops.Stats.weightedQuantiles):
    * quantity-weighted price quartile/median/tails per return flag —
    * the "what price does the pth shipped unit pay" table. Duplicate
    * prices collapse in a partial agg before the per-group cumulative
    * window; thresholds are all-BIGINT; prices pass through bit-exact.
    */
  def qWeightedPercentile(spark: SparkSession, sfDir: String): DataFrame =
    graft.ops.Stats.weightedQuantiles(
      Tables.lineitem(spark, sfDir)
        .select("l_returnflag", "l_extendedprice", "l_quantity"),
      "l_returnflag", "l_extendedprice", col("l_quantity"),
      Seq(250000L, 500000L, 900000L, 990000L))

  /** Grouped OLS fit price ~ quantity per return flag (B44;
    * graft.ops.Stats.linReg): slope/intercept/R² in micro units from
    * DECIMAL-exact power sums of cent-quantized prices — one partial
    * aggregation, no join, no window, DuckDB-replayable bit-for-bit.
    */
  def qLinReg(spark: SparkSession, sfDir: String): DataFrame =
    graft.ops.Stats.linReg(
      Tables.lineitem(spark, sfDir)
        .select("l_returnflag", "l_quantity", "l_extendedprice"),
      "l_returnflag", col("l_quantity").cast("long"),
      round(col("l_extendedprice") * 100).cast("long"))

  /** Theil–Sen robust trend per event type over the daily-volume
    * series (B45; graft.ops.Stats.theilSen): the pairwise-slope lower
    * median — outlier days can't drag it the way they drag OLS. The
    * per-key series is the bounded daily aggregate, so the O(L²) pair
    * join is by construction small; null timestamps drop.
    */
  def qTheilSen(spark: SparkSession, sfDir: String): DataFrame = {
    val daily = Tables.events(spark, sfDir)
      .filter(col("ts").isNotNull)
      .groupBy(col("event_type"),
        expr("unix_millis(ts) DIV 86400000").as("day"))
      .agg(count(lit(1)).as("n"))
    graft.ops.Stats.theilSen(daily, "event_type", col("day"), col("n"))
  }

  /** Top session-opening paths (B46; graft.ops.Stats.sessionPaths):
    * 30-minute sessionization, each session's first 3 event types as
    * a '>'-joined path, counted corpus-wide. One event shuffle on
    * user_id drives every window.
    */
  def qSessionPaths(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    graft.ops.Stats.sessionPaths(
      Tables.events(spark, sfDir).filter($"ts".isNotNull)
        .select($"user_id", $"event_id", $"event_type",
          unix_millis($"ts").as("ts_ms")),
      "user_id", col("ts_ms"), col("event_id"), "event_type",
      gapMs = 1800000L, k = 3)
  }

  /** Two-cohort Welch comparison per event type (B47;
    * graft.ops.Stats.abTest): even/odd user split, cent-quantized
    * values, exact DECIMAL sufficient statistics, micro-quantized
    * mean difference and Welch z. One partial aggregation.
    */
  def qAbTest(spark: SparkSession, sfDir: String): DataFrame =
    graft.ops.Stats.abTest(
      Tables.events(spark, sfDir).filter(col("value").isNotNull)
        .select("event_type", "user_id", "value"),
      "event_type", col("user_id") % 2 === 1,
      round(col("value") * 100).cast("long"))

  /** Mann–Whitney rank-sum per event type (B54;
    * graft.ops.Stats.mannWhitney): the same even/odd-user cohort
    * split and cent quantization as q_ab_test, so the two queries
    * read as the parametric/nonparametric pair on one experiment.
    * Exact midrank/tie integers, group-partitioned cumulative window
    * on the (group, value) grain, z replayed bit-for-bit.
    */
  def qMannWhitney(spark: SparkSession, sfDir: String): DataFrame =
    graft.ops.Stats.mannWhitney(
      Tables.events(spark, sfDir).filter(col("value").isNotNull)
        .select("event_type", "user_id", "value"),
      "event_type", col("user_id") % 2 === 1,
      round(col("value") * 100).cast("long"))

  /** BH FDR sweep over a 35-hypothesis Welch battery (B55;
    * graft.ops.Stats.bhFdr): one Welch test per (event_type,
    * epoch-day mod 7) segment — the composite-group form of
    * q_ab_test — with a PLANTED +30.00 treatment shift on segments
    * whose day slot is 0 or 1 (an all-null battery would gate only
    * the k*=0 branch); BH at α = 0.05 then separates the planted
    * segments from the uniform-p noise. p from z via the shared
    * Abramowitz–Stegun expression, reject decisions in exact
    * integers, rank window over the 35-row battery (tiny-relation
    * class, whitelisted in the plan sweep).
    */
  def qBhFdr(spark: SparkSession, sfDir: String): DataFrame = {
    val tests = graft.ops.Stats.abTest(
      Tables.events(spark, sfDir)
        .filter(col("value").isNotNull && col("ts").isNotNull)
        .select(col("user_id"), col("value"),
          concat(col("event_type"), lit(":"),
            (pmod(unix_millis(col("ts")) / lit(86400000L), lit(7L)))
              .cast("long").cast("string")).as("seg"),
          (pmod(unix_millis(col("ts")) / lit(86400000L), lit(7L)) < 2L)
            .as("planted")),
      "seg", col("user_id") % 2 === 1,
      round(col("value") * 100).cast("long")
        + when(col("user_id") % 2 === 1 && col("planted"), 3000L)
          .otherwise(0L))
    graft.ops.Stats.bhFdr(tests, "seg", col("z_micro"))
  }

  /** Difference-in-differences per event type (B56;
    * graft.ops.Stats.didTest): treat = odd users, post = second half
    * of the feed's time range (1-row broadcast midpoint), with a
    * PLANTED +20.00 treatment-post shift so the interaction term has
    * signal; one conditional partial aggregation computes all four
    * (cohort × period) cells' exact DECIMAL statistics, then DiD and
    * its four-cell Welch z replay bit-for-bit.
    */
  def qDid(spark: SparkSession, sfDir: String): DataFrame = {
    val base = Tables.events(spark, sfDir)
      .filter(col("value").isNotNull && col("ts").isNotNull)
      .select(col("event_type"), col("user_id"),
        round(col("value") * 100).cast("long").as("cents"),
        unix_millis(col("ts")).as("ts_ms"))
    val mid = base.agg(
      expr("(min(ts_ms) + max(ts_ms)) div 2").as("mid"))
    val e = base.crossJoin(broadcast(mid))
      .select(col("event_type"), col("user_id"),
        (col("ts_ms") >= col("mid")).as("post"),
        (col("cents") + when(col("user_id") % 2 === 1
            && col("ts_ms") >= col("mid"), 2000L).otherwise(0L)).as("y"))
    graft.ops.Stats.didTest(e, "event_type",
      col("user_id") % 2 === 1, col("post"), col("y"))
  }

  /** Stationary distribution of the q_markov_transitions chain (B57;
    * graft.ops.Stats.stationaryDistribution): 8 exact-integer power
    * iterations of the long-run state-occupancy vector on the
    * |states|-squared transition table; the oracle unrolls all 8 as
    * chained CTEs with identical floor division per term.
    */
  def qMarkovStationary(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    graft.ops.Stats.stationaryDistribution(
      graft.ops.Stats.transitionMatrix(
        Tables.events(spark, sfDir)
          .select($"user_id", $"event_id", $"event_type",
            unix_millis($"ts").as("ts_ms")),
        "user_id", Seq($"ts_ms".asc, $"event_id".asc), "event_type"),
      iters = 8)
  }

  /** Two-sample KS per event type (B58; graft.ops.Stats.ksTest):
    * even/odd user split with a PLANTED +10.00 shift on odd users for
    * click and purchase only — exactly those two distributions
    * reject at the Smirnov 5% critical value, the other three hold
    * (the null D on ~1000-per-side cohorts sits well under c(0.05)).
    */
  def qKsTest(spark: SparkSession, sfDir: String): DataFrame =
    graft.ops.Stats.ksTest(
      Tables.events(spark, sfDir).filter(col("value").isNotNull)
        .select("event_type", "user_id", "value"),
      "event_type", col("user_id") % 2 === 1,
      round(col("value") * 100).cast("long")
        + when(col("user_id") % 2 === 1
            && col("event_type").isin("click", "purchase"), 1000L)
          .otherwise(0L))

  /** Minimum detectable effect per event type (B59;
    * graft.ops.Stats.mde): the same even/odd split and cent
    * quantization as q_ab_test, answering "what shift could this
    * experiment even have seen" at α=0.05 / 80% power — the
    * underpowered-test honesty number, absolute and relative.
    */
  def qMde(spark: SparkSession, sfDir: String): DataFrame =
    graft.ops.Stats.mde(
      Tables.events(spark, sfDir).filter(col("value").isNotNull)
        .select("event_type", "user_id", "value"),
      "event_type", col("user_id") % 2 === 1,
      round(col("value") * 100).cast("long"))

  /** CUPED-adjusted comparison per event type (B60;
    * graft.ops.Stats.cuped): users aggregate to exact pre/post cent
    * sums around the broadcast time midpoint (users with no pre rows
    * carry x = 0 — the published convention), a +200.00 post-period
    * shift plants the treatment effect (user-level sums carry ~250.00
    * of between-user noise, so a small plant would drown), and the
    * pooled-θ adjustment
    * chain replays bit-for-bit.
    */
  def qCuped(spark: SparkSession, sfDir: String): DataFrame = {
    val base = Tables.events(spark, sfDir)
      .filter(col("value").isNotNull && col("ts").isNotNull)
      .select(col("event_type"), col("user_id"),
        round(col("value") * 100).cast("long").as("cents"),
        unix_millis(col("ts")).as("ts_ms"))
    val mid = base.agg(expr("(min(ts_ms) + max(ts_ms)) div 2").as("mid"))
    val users = base.crossJoin(broadcast(mid))
      .groupBy(col("event_type"), col("user_id"))
      .agg(
        sum(when(col("ts_ms") < col("mid"), col("cents")).otherwise(0L))
          .as("x"),
        (sum(when(col("ts_ms") >= col("mid"), col("cents")).otherwise(0L))
          + when(col("user_id") % 2 === 1, 20000L).otherwise(0L)).as("y"))
    graft.ops.Stats.cuped(users, "event_type",
      col("user_id") % 2 === 1, col("x"), col("y"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_cuped" -> qCuped,
    "q_mde" -> qMde,
    "q_ks_test" -> qKsTest,
    "q_markov_stationary" -> qMarkovStationary,
    "q_did" -> qDid,
    "q_bh_fdr" -> qBhFdr,
    "q_mann_whitney" -> qMannWhitney,
    "q_ab_test" -> qAbTest,
    "q_theil_sen" -> qTheilSen,
    "q_session_paths" -> qSessionPaths,
    "q_markov_transitions" -> qMarkovTransitions,
    "q_weighted_percentile" -> qWeightedPercentile,
    "q_linreg" -> qLinReg,
    "q_fuzzy_join" -> qFuzzyJoin,
    "q_ewma" -> qEwma,
    "q_seasonality" -> qSeasonality,
    "q_autocorr" -> qAutocorr,
    "q_period_compare" -> qPeriodCompare,
    "q_changepoint" -> qChangepoint,
    "q_interval_join" -> qIntervalJoin,
    "q_sliding_distinct" -> qSlidingDistinct,
    "q_nearest_join" -> qNearestJoin,
    "q_gaps_islands" -> qGapsIslands,
    "q_attribution" -> qAttribution,
    "q_gap_fill" -> qGapFill,
    "q_join_advise" -> qJoinAdvise,
    "q_funnel" -> qFunnel,
    "q_cohort_retention" -> qCohortRetention,
    "q_cohort_ltv" -> qCohortLtv,
    "q_survival" -> qSurvival,
    "q_time_to_convert" -> qTimeToConvert,
    "q_prune_sim" -> qPruneSim,
    "q_rfm" -> qRfm,
    "q_basket_affinity" -> qBasketAffinity,
    "q_stickiness" -> qStickiness,
    "q_semi_join" -> qSemiJoin,
    "q_anti_join" -> qAntiJoin,
    "q_skew_salted_join" -> qSkewSaltedJoin,
    "q_bloom_join" -> qBloomJoin,
    "q_distinct_agg" -> qDistinctAgg,
    "q_heavy_hitters" -> qHeavyHitters,
    "q_pivot" -> qPivot,
    "q_zorder_key" -> qZorderKey,
    "q1_agg" -> q1Agg,
    "q1_rollup" -> q1Rollup,
    "q_cube" -> qCube,
    "q_percentiles" -> qPercentiles,
    "q3_join_agg" -> q3JoinAgg,
    "q5_multijoin" -> q5MultiJoin,
    "q_topk_window" -> qTopkWindow,
    "q_events_window" -> qEventsWindow,
    "q_events_sessionize" -> qEventsSessionize,
    "q_running_sum" -> qRunningSum,
    "q_rolling_window" -> qRollingWindow,
    "q_range_join" -> qRangeJoin,
    "q_anomaly_zscore" -> qAnomalyZscore,
    "q_anomaly_mad" -> qAnomalyMad,
    "q_robust_scale" -> qRobustScale,
    "q_percent_rank" -> qPercentRank,
    "q_props_extract" -> qPropsExtract,
    "q_asof_join" -> qAsofJoin)

  val oracles: Map[String, String] = Map(
    "q_cuped" ->
      """WITH b AS (SELECT event_type AS grp, user_id,
        |        CAST(round(value * 100) AS BIGINT) AS cents,
        |        epoch_ms(ts) AS ts_ms
        |      FROM events WHERE value IS NOT NULL AND ts IS NOT NULL),
        |mm AS (SELECT (min(ts_ms) + max(ts_ms)) // 2 AS mid FROM b),
        |u AS (SELECT grp, user_id, user_id % 2 = 1 AS t,
        |        sum(CASE WHEN ts_ms < mm.mid THEN cents ELSE 0 END) AS x,
        |        sum(CASE WHEN ts_ms >= mm.mid THEN cents ELSE 0 END)
        |          + CASE WHEN user_id % 2 = 1 THEN 20000 ELSE 0 END AS y
        |      FROM b, mm GROUP BY 1, 2, 3),
        |s AS (SELECT grp,
        |   CAST(count(*) FILTER (WHERE NOT t) AS BIGINT) AS na,
        |   sum(x) FILTER (WHERE NOT t) AS sxa,
        |   sum(y) FILTER (WHERE NOT t) AS sya,
        |   sum(x*y) FILTER (WHERE NOT t) AS sxya,
        |   sum(x*x) FILTER (WHERE NOT t) AS sxxa,
        |   sum(y*y) FILTER (WHERE NOT t) AS syya,
        |   CAST(count(*) FILTER (WHERE t) AS BIGINT) AS nb,
        |   sum(x) FILTER (WHERE t) AS sxb,
        |   sum(y) FILTER (WHERE t) AS syb,
        |   sum(x*y) FILTER (WHERE t) AS sxyb,
        |   sum(x*x) FILTER (WHERE t) AS sxxb,
        |   sum(y*y) FILTER (WHERE t) AS syyb
        | FROM u GROUP BY 1),
        |d AS (SELECT grp, na, nb,
        |   CAST((na+nb)*(sxya+sxyb) - (sxa+sxb)*(sya+syb) AS DOUBLE)
        |     / CAST((na+nb)*(sxxa+sxxb) - (sxa+sxb)*(sxa+sxb) AS DOUBLE)
        |     AS theta,
        |   CAST((na+nb)*(sxxa+sxxb) - (sxa+sxb)*(sxa+sxb) AS DOUBLE)
        |     AS thden,
        |   sxa, sya, sxya, sxxa, syya, sxb, syb, sxyb, sxxb, syyb
        | FROM s),
        |e AS (SELECT grp, na, nb, theta, thden,
        |   (CAST(syb AS DOUBLE) / CAST(nb AS DOUBLE)
        |     - theta * (CAST(sxb AS DOUBLE) / CAST(nb AS DOUBLE)))
        |   - (CAST(sya AS DOUBLE) / CAST(na AS DOUBLE)
        |     - theta * (CAST(sxa AS DOUBLE) / CAST(na AS DOUBLE)))
        |     AS diff,
        |   (CAST(na*syya - sya*sya AS DOUBLE)
        |     - 2 * theta * CAST(na*sxya - sxa*sya AS DOUBLE)
        |     + theta * theta * CAST(na*sxxa - sxa*sxa AS DOUBLE))
        |    / (CAST(na AS DOUBLE) * CAST(na AS DOUBLE)
        |       * (CAST(na AS DOUBLE) - 1)) AS va,
        |   (CAST(nb*syyb - syb*syb AS DOUBLE)
        |     - 2 * theta * CAST(nb*sxyb - sxb*syb AS DOUBLE)
        |     + theta * theta * CAST(nb*sxxb - sxb*sxb AS DOUBLE))
        |    / (CAST(nb AS DOUBLE) * CAST(nb AS DOUBLE)
        |       * (CAST(nb AS DOUBLE) - 1)) AS vb
        | FROM d)
        |SELECT grp AS event_type, na AS n_a, nb AS n_b,
        |  CASE WHEN na < 2 OR nb < 2 OR thden = 0 THEN NULL
        |       ELSE CAST(round(theta * 1e6) AS BIGINT) END AS theta_micro,
        |  CASE WHEN na < 2 OR nb < 2 OR thden = 0 THEN NULL
        |       ELSE CAST(round(diff * 1e6) AS BIGINT) END AS diff_adj_micro,
        |  CASE WHEN na < 2 OR nb < 2 OR thden = 0 THEN NULL
        |       ELSE CAST(round(diff / sqrt(va + vb) * 1e6) AS BIGINT)
        |  END AS z_micro
        |FROM e""".stripMargin,
    "q_mde" ->
      """WITH e AS (SELECT event_type AS grp, user_id % 2 = 1 AS b,
        |        CAST(round(value * 100) AS BIGINT) AS y
        |      FROM events WHERE value IS NOT NULL),
        |s AS (SELECT grp,
        |   CAST(count(*) FILTER (WHERE NOT b) AS BIGINT) AS na,
        |   sum(y) FILTER (WHERE NOT b) AS sya,
        |   sum(y*y) FILTER (WHERE NOT b) AS syya,
        |   CAST(count(*) FILTER (WHERE b) AS BIGINT) AS nb,
        |   sum(y) FILTER (WHERE b) AS syb,
        |   sum(y*y) FILTER (WHERE b) AS syyb
        | FROM e GROUP BY 1),
        |d AS (SELECT grp, na, nb, sya, syb,
        |   (1.9599639845400545 + 0.8416212335729143)
        |     * sqrt(CAST(na*syya - sya*sya AS DOUBLE)
        |              / (CAST(na AS DOUBLE)*CAST(na AS DOUBLE)
        |                 *(CAST(na AS DOUBLE)-1))
        |          + CAST(nb*syyb - syb*syb AS DOUBLE)
        |              / (CAST(nb AS DOUBLE)*CAST(nb AS DOUBLE)
        |                 *(CAST(nb AS DOUBLE)-1))) AS mded
        | FROM s)
        |SELECT grp AS event_type, na AS n_a, nb AS n_b,
        |  CASE WHEN na < 2 OR nb < 2 THEN NULL
        |       ELSE CAST(round(mded * 1e6) AS BIGINT) END AS mde_micro,
        |  CASE WHEN na < 2 OR nb < 2 OR sya + syb = 0 THEN NULL
        |       ELSE CAST(round(mded
        |         / (CAST(sya + syb AS DOUBLE) / CAST(na + nb AS DOUBLE))
        |         * 1e6) AS BIGINT)
        |  END AS rel_mde_ppm
        |FROM d""".stripMargin,
    "q_ks_test" ->
      """WITH e AS (SELECT event_type AS grp, user_id % 2 = 1 AS b,
        |        CAST(round(value * 100) AS BIGINT)
        |          + CASE WHEN user_id % 2 = 1
        |                  AND event_type IN ('click', 'purchase')
        |                 THEN 1000 ELSE 0 END AS v
        |      FROM events WHERE value IS NOT NULL),
        |vals AS (SELECT grp, v,
        |        CAST(count(*) FILTER (WHERE NOT b) AS BIGINT) AS ca,
        |        CAST(count(*) FILTER (WHERE b) AS BIGINT) AS cb
        |      FROM e GROUP BY 1, 2),
        |cum AS (SELECT grp, ca, cb,
        |        sum(ca) OVER (PARTITION BY grp ORDER BY v
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cuma,
        |        sum(cb) OVER (PARTITION BY grp ORDER BY v
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumb,
        |        sum(ca) OVER (PARTITION BY grp) AS na,
        |        sum(cb) OVER (PARTITION BY grp) AS nb
        |      FROM vals),
        |g AS (SELECT grp, max(na) AS n_a, max(nb) AS n_b,
        |        max(abs(cuma * nb - cumb * na)) AS dnum
        |      FROM cum GROUP BY 1)
        |SELECT grp AS event_type,
        |  CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
        |  CASE WHEN n_a = 0 OR n_b = 0 THEN NULL
        |       ELSE CAST((dnum * 1000000) // (n_a * n_b) AS BIGINT)
        |  END AS d_ppm,
        |  CASE WHEN n_a = 0 OR n_b = 0 THEN NULL
        |       ELSE CAST(round(1.358
        |         * sqrt(CAST(n_a + n_b AS DOUBLE)
        |             / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)))
        |         * 1e6) AS BIGINT)
        |  END AS crit_ppm,
        |  CASE WHEN n_a = 0 OR n_b = 0 THEN NULL
        |       ELSE CAST(CAST(dnum AS DOUBLE)
        |              / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))
        |            > 1.358 * sqrt(CAST(n_a + n_b AS DOUBLE)
        |                / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)))
        |            AS INT)
        |  END AS reject
        |FROM g""".stripMargin,
    "q_did" ->
      """WITH b AS (SELECT event_type AS grp, user_id % 2 = 1 AS t,
        |        epoch_ms(ts) AS ts_ms,
        |        CAST(round(value * 100) AS BIGINT) AS cents
        |      FROM events WHERE value IS NOT NULL AND ts IS NOT NULL),
        |mm AS (SELECT (min(ts_ms) + max(ts_ms)) // 2 AS mid FROM b),
        |e AS (SELECT grp, t, ts_ms >= mm.mid AS post,
        |        cents + CASE WHEN t AND ts_ms >= mm.mid THEN 2000
        |                     ELSE 0 END AS y
        |      FROM b, mm),
        |s AS (SELECT grp,
        |   CAST(count(*) FILTER (WHERE NOT t AND NOT post) AS BIGINT) AS ncpre,
        |   sum(y) FILTER (WHERE NOT t AND NOT post) AS sycpre,
        |   sum(y*y) FILTER (WHERE NOT t AND NOT post) AS syycpre,
        |   CAST(count(*) FILTER (WHERE NOT t AND post) AS BIGINT) AS ncpost,
        |   sum(y) FILTER (WHERE NOT t AND post) AS sycpost,
        |   sum(y*y) FILTER (WHERE NOT t AND post) AS syycpost,
        |   CAST(count(*) FILTER (WHERE t AND NOT post) AS BIGINT) AS ntpre,
        |   sum(y) FILTER (WHERE t AND NOT post) AS sytpre,
        |   sum(y*y) FILTER (WHERE t AND NOT post) AS syytpre,
        |   CAST(count(*) FILTER (WHERE t AND post) AS BIGINT) AS ntpost,
        |   sum(y) FILTER (WHERE t AND post) AS sytpost,
        |   sum(y*y) FILTER (WHERE t AND post) AS syytpost
        | FROM e GROUP BY 1),
        |d AS (SELECT grp, ncpre, ncpost, ntpre, ntpost,
        |   (CAST(coalesce(sytpost,0) AS DOUBLE)/CAST(ntpost AS DOUBLE)
        |    - CAST(coalesce(sytpre,0) AS DOUBLE)/CAST(ntpre AS DOUBLE))
        |   - (CAST(coalesce(sycpost,0) AS DOUBLE)/CAST(ncpost AS DOUBLE)
        |      - CAST(coalesce(sycpre,0) AS DOUBLE)/CAST(ncpre AS DOUBLE))
        |     AS did,
        |   CAST(ntpost*syytpost - sytpost*sytpost AS DOUBLE)
        |     / (CAST(ntpost AS DOUBLE)*CAST(ntpost AS DOUBLE)
        |        *(CAST(ntpost AS DOUBLE)-1)) +
        |   CAST(ntpre*syytpre - sytpre*sytpre AS DOUBLE)
        |     / (CAST(ntpre AS DOUBLE)*CAST(ntpre AS DOUBLE)
        |        *(CAST(ntpre AS DOUBLE)-1)) +
        |   CAST(ncpost*syycpost - sycpost*sycpost AS DOUBLE)
        |     / (CAST(ncpost AS DOUBLE)*CAST(ncpost AS DOUBLE)
        |        *(CAST(ncpost AS DOUBLE)-1)) +
        |   CAST(ncpre*syycpre - sycpre*sycpre AS DOUBLE)
        |     / (CAST(ncpre AS DOUBLE)*CAST(ncpre AS DOUBLE)
        |        *(CAST(ncpre AS DOUBLE)-1)) AS varsum,
        |   (ncpre < 2 OR ncpost < 2 OR ntpre < 2 OR ntpost < 2)
        |     AS small,
        |   (ncpre = 0 OR ncpost = 0 OR ntpre = 0 OR ntpost = 0)
        |     AS empty,
        |   (ntpost*syytpost - sytpost*sytpost = 0
        |    AND ntpre*syytpre - sytpre*sytpre = 0
        |    AND ncpost*syycpost - sycpost*sycpost = 0
        |    AND ncpre*syycpre - sycpre*sycpre = 0) AS flat
        | FROM s)
        |SELECT grp AS event_type,
        |  ncpre AS n_ctrl_pre, ncpost AS n_ctrl_post,
        |  ntpre AS n_treat_pre, ntpost AS n_treat_post,
        |  CASE WHEN empty THEN NULL
        |       ELSE CAST(round(did * 1e6) AS BIGINT) END AS did_micro,
        |  CASE WHEN small OR flat THEN NULL
        |       ELSE CAST(round(did / sqrt(varsum) * 1e6) AS BIGINT)
        |  END AS z_micro
        |FROM d""".stripMargin,
    "q_bh_fdr" ->
      """WITH e AS (SELECT event_type || ':' ||
        |          CAST((epoch_ms(ts) // 86400000) % 7 AS VARCHAR) AS grp,
        |        user_id % 2 = 1 AS b,
        |        CAST(round(value * 100) AS BIGINT)
        |          + CASE WHEN user_id % 2 = 1
        |                  AND (epoch_ms(ts) // 86400000) % 7 < 2
        |                 THEN 3000 ELSE 0 END AS y
        |      FROM events WHERE value IS NOT NULL AND ts IS NOT NULL),
        |s AS (SELECT grp, b, CAST(count(*) AS BIGINT) AS n,
        |        sum(y) AS sy, sum(y*y) AS syy
        |      FROM e GROUP BY 1, 2),
        |a AS (SELECT grp, n AS n_a, CAST(sy AS DOUBLE) AS sa,
        |        CAST(n AS DOUBLE) AS da,
        |        CAST(n*syy - sy*sy AS DOUBLE) AS vna FROM s WHERE NOT b),
        |bb AS (SELECT grp, n AS n_b, CAST(sy AS DOUBLE) AS sb,
        |        CAST(n AS DOUBLE) AS db,
        |        CAST(n*syy - sy*sy AS DOUBLE) AS vnb FROM s WHERE b),
        |z AS (SELECT grp,
        |  CASE WHEN n_a < 2 OR n_b < 2 OR (vna = 0 AND vnb = 0) THEN NULL
        |       ELSE CAST(round((sb/db - sa/da)
        |            / sqrt(vna/(da*da*(da-1)) + vnb/(db*db*(db-1)))
        |            * 1e6) AS BIGINT)
        |  END AS z_micro
        |FROM a JOIN bb USING (grp)),
        |pp AS (SELECT grp, z_micro,
        |        CAST(round(2.0
        |          * (exp(-0.5 * (abs(CAST(z_micro AS DOUBLE) / 1e6))
        |                      * (abs(CAST(z_micro AS DOUBLE) / 1e6)))
        |             / 2.5066282746310002)
        |          * ((1.0 / (1.0 + 0.2316419
        |                * abs(CAST(z_micro AS DOUBLE) / 1e6)))
        |             * (0.319381530 + (1.0 / (1.0 + 0.2316419
        |                  * abs(CAST(z_micro AS DOUBLE) / 1e6)))
        |               * (-0.356563782 + (1.0 / (1.0 + 0.2316419
        |                    * abs(CAST(z_micro AS DOUBLE) / 1e6)))
        |                 * (1.781477937 + (1.0 / (1.0 + 0.2316419
        |                      * abs(CAST(z_micro AS DOUBLE) / 1e6)))
        |                   * (-1.821255978 + (1.0 / (1.0 + 0.2316419
        |                        * abs(CAST(z_micro AS DOUBLE) / 1e6)))
        |                     * 1.330274429)))))
        |          * 1e6) AS BIGINT) AS p_micro
        |      FROM z WHERE z_micro IS NOT NULL),
        |rk AS (SELECT grp, z_micro, p_micro,
        |        CAST(row_number() OVER (ORDER BY p_micro, grp) AS BIGINT)
        |          AS k,
        |        CAST(count(*) OVER () AS BIGINT) AS m
        |      FROM pp),
        |ks AS (SELECT coalesce(max(k), 0) AS k_star FROM rk
        |       WHERE p_micro * m <= k * 50000)
        |SELECT grp AS seg, z_micro, p_micro, k, m,
        |  k <= ks.k_star AS reject
        |FROM rk, ks""".stripMargin,
    "q_mann_whitney" ->
      """WITH e AS (SELECT event_type AS grp, user_id % 2 = 1 AS b,
        |        CAST(round(value * 100) AS BIGINT) AS v
        |      FROM events WHERE value IS NOT NULL),
        |vals AS (SELECT grp, v,
        |        CAST(count(*) FILTER (WHERE NOT b) AS BIGINT) AS ca,
        |        CAST(count(*) FILTER (WHERE b) AS BIGINT) AS cb
        |      FROM e GROUP BY 1, 2),
        |r AS (SELECT grp, v, ca, cb,
        |        coalesce(sum(ca + cb) OVER (PARTITION BY grp ORDER BY v
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |          AS before
        |      FROM vals),
        |rk AS (SELECT grp, ca, cb, 2 * before + ca + cb + 1 AS rank2,
        |         ca + cb AS t FROM r),
        |g AS (SELECT grp, sum(ca) AS n_a, sum(cb) AS n_b,
        |        sum(cb * rank2) AS rs2,
        |        sum(t * t * t - t) AS ties
        |      FROM rk GROUP BY 1)
        |SELECT grp AS event_type,
        |  CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
        |  CAST(rs2 - n_b * (n_b + 1) AS BIGINT) AS u2_b,
        |  CASE WHEN n_a = 0 OR n_b = 0 OR
        |       (CAST(n_a + n_b AS DOUBLE) + 1.0)
        |         - CAST(ties AS DOUBLE)
        |           / (CAST(n_a + n_b AS DOUBLE)
        |              * (CAST(n_a + n_b AS DOUBLE) - 1.0)) <= 0
        |       THEN NULL
        |       ELSE CAST(round(
        |         ((CAST(rs2 - n_b * (n_b + 1) AS DOUBLE)
        |           - CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)) / 2.0)
        |         / sqrt(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 12.0
        |             * ((CAST(n_a + n_b AS DOUBLE) + 1.0)
        |               - CAST(ties AS DOUBLE)
        |                 / (CAST(n_a + n_b AS DOUBLE)
        |                    * (CAST(n_a + n_b AS DOUBLE) - 1.0))))
        |         * 1e6) AS BIGINT)
        |  END AS z_micro
        |FROM g""".stripMargin,
    "q_ab_test" ->
      """WITH e AS (SELECT event_type AS grp, user_id % 2 = 1 AS b,
        |        CAST(round(value * 100) AS BIGINT) AS y
        |      FROM events WHERE value IS NOT NULL),
        |s AS (SELECT grp, b, CAST(count(*) AS BIGINT) AS n,
        |        sum(y) AS sy, sum(y*y) AS syy
        |      FROM e GROUP BY 1, 2),
        |a AS (SELECT grp, n AS n_a, CAST(sy AS DOUBLE) AS sa,
        |        CAST(n AS DOUBLE) AS da,
        |        CAST(n*syy - sy*sy AS DOUBLE) AS vna FROM s WHERE NOT b),
        |bb AS (SELECT grp, n AS n_b, CAST(sy AS DOUBLE) AS sb,
        |        CAST(n AS DOUBLE) AS db,
        |        CAST(n*syy - sy*sy AS DOUBLE) AS vnb FROM s WHERE b)
        |SELECT grp AS event_type, n_a, n_b,
        |  CAST(round((sb/db - sa/da) * 1e6) AS BIGINT) AS diff_micro,
        |  CASE WHEN n_a < 2 OR n_b < 2 OR (vna = 0 AND vnb = 0) THEN NULL
        |       ELSE CAST(round((sb/db - sa/da)
        |            / sqrt(vna/(da*da*(da-1)) + vnb/(db*db*(db-1)))
        |            * 1e6) AS BIGINT)
        |  END AS z_micro
        |FROM a JOIN bb USING (grp)""".stripMargin,
    "q_theil_sen" ->
      """WITH d AS (SELECT event_type AS k, epoch_ms(ts) // 86400000 AS x,
        |        CAST(count(*) AS BIGINT) AS y
        |      FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
        |p AS (SELECT a.k,
        |        CAST(round(CAST(b.y - a.y AS DOUBLE) * 1e6
        |             / CAST(b.x - a.x AS DOUBLE)) AS BIGINT) AS slope_micro
        |      FROM d a JOIN d b ON a.k = b.k AND b.x > a.x),
        |r AS (SELECT k, slope_micro,
        |        row_number() OVER (PARTITION BY k ORDER BY slope_micro) AS rn,
        |        CAST(count(*) OVER (PARTITION BY k) AS BIGINT) AS n_pairs
        |      FROM p)
        |SELECT k AS event_type, n_pairs, slope_micro
        |FROM r WHERE rn = (n_pairs + 1) // 2""".stripMargin,
    "q_session_paths" ->
      """WITH e AS (SELECT user_id, event_id, event_type, epoch_ms(ts) AS ms
        |      FROM events WHERE ts IS NOT NULL),
        |s AS (SELECT user_id, event_id, event_type, ms,
        |        CASE WHEN lag(ms) OVER w IS NULL
        |                  OR ms - lag(ms) OVER w > 1800000
        |             THEN 1 ELSE 0 END AS new_s
        |      FROM e WINDOW w AS (PARTITION BY user_id
        |                          ORDER BY ms ASC, event_id ASC)),
        |t AS (SELECT user_id, event_type, ms, event_id,
        |        sum(new_s) OVER (PARTITION BY user_id
        |          ORDER BY ms ASC, event_id ASC
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
        |      FROM s),
        |r AS (SELECT user_id, sess, event_type,
        |        row_number() OVER (PARTITION BY user_id, sess
        |          ORDER BY ms ASC, event_id ASC) AS rn
        |      FROM t),
        |p AS (SELECT user_id, sess,
        |        string_agg(event_type, '>' ORDER BY rn) AS path
        |      FROM r WHERE rn <= 3 GROUP BY 1, 2)
        |SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
        |FROM p GROUP BY 1""".stripMargin,
    "q_markov_stationary" ->
      """WITH seq AS (
        |  SELECT event_type AS state,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY epoch_ms(ts) ASC, event_id ASC) AS next_state
        |  FROM events),
        |c AS MATERIALIZED (SELECT state, next_state, CAST(count(*) AS BIGINT) AS n
        |      FROM seq WHERE next_state IS NOT NULL GROUP BY 1, 2),
        |tt AS MATERIALIZED (SELECT state, sum(n) AS tot FROM c GROUP BY 1),
        |st AS MATERIALIZED (SELECT state FROM c UNION SELECT next_state FROM c),
        |p0 AS MATERIALIZED (SELECT state, CAST(1000000 AS BIGINT) AS v FROM st),
        |i1 AS (SELECT c.next_state AS state,
        |    sum(p0.v * c.n // tt.tot) AS inflow
        |  FROM c JOIN p0 ON c.state = p0.state
        |  JOIN tt ON c.state = tt.state GROUP BY 1),
        |p1 AS MATERIALIZED (SELECT s.state,
        |    coalesce(i1.inflow, 0)
        |      + CASE WHEN tt.tot IS NULL THEN p0.v ELSE 0 END AS v
        |  FROM st s LEFT JOIN i1 ON s.state = i1.state
        |  LEFT JOIN tt ON s.state = tt.state
        |  LEFT JOIN p0 ON s.state = p0.state),
        |i2 AS (SELECT c.next_state AS state,
        |    sum(p1.v * c.n // tt.tot) AS inflow
        |  FROM c JOIN p1 ON c.state = p1.state
        |  JOIN tt ON c.state = tt.state GROUP BY 1),
        |p2 AS MATERIALIZED (SELECT s.state,
        |    coalesce(i2.inflow, 0)
        |      + CASE WHEN tt.tot IS NULL THEN p1.v ELSE 0 END AS v
        |  FROM st s LEFT JOIN i2 ON s.state = i2.state
        |  LEFT JOIN tt ON s.state = tt.state
        |  LEFT JOIN p1 ON s.state = p1.state),
        |i3 AS (SELECT c.next_state AS state,
        |    sum(p2.v * c.n // tt.tot) AS inflow
        |  FROM c JOIN p2 ON c.state = p2.state
        |  JOIN tt ON c.state = tt.state GROUP BY 1),
        |p3 AS MATERIALIZED (SELECT s.state,
        |    coalesce(i3.inflow, 0)
        |      + CASE WHEN tt.tot IS NULL THEN p2.v ELSE 0 END AS v
        |  FROM st s LEFT JOIN i3 ON s.state = i3.state
        |  LEFT JOIN tt ON s.state = tt.state
        |  LEFT JOIN p2 ON s.state = p2.state),
        |i4 AS (SELECT c.next_state AS state,
        |    sum(p3.v * c.n // tt.tot) AS inflow
        |  FROM c JOIN p3 ON c.state = p3.state
        |  JOIN tt ON c.state = tt.state GROUP BY 1),
        |p4 AS MATERIALIZED (SELECT s.state,
        |    coalesce(i4.inflow, 0)
        |      + CASE WHEN tt.tot IS NULL THEN p3.v ELSE 0 END AS v
        |  FROM st s LEFT JOIN i4 ON s.state = i4.state
        |  LEFT JOIN tt ON s.state = tt.state
        |  LEFT JOIN p3 ON s.state = p3.state),
        |i5 AS (SELECT c.next_state AS state,
        |    sum(p4.v * c.n // tt.tot) AS inflow
        |  FROM c JOIN p4 ON c.state = p4.state
        |  JOIN tt ON c.state = tt.state GROUP BY 1),
        |p5 AS MATERIALIZED (SELECT s.state,
        |    coalesce(i5.inflow, 0)
        |      + CASE WHEN tt.tot IS NULL THEN p4.v ELSE 0 END AS v
        |  FROM st s LEFT JOIN i5 ON s.state = i5.state
        |  LEFT JOIN tt ON s.state = tt.state
        |  LEFT JOIN p4 ON s.state = p4.state),
        |i6 AS (SELECT c.next_state AS state,
        |    sum(p5.v * c.n // tt.tot) AS inflow
        |  FROM c JOIN p5 ON c.state = p5.state
        |  JOIN tt ON c.state = tt.state GROUP BY 1),
        |p6 AS MATERIALIZED (SELECT s.state,
        |    coalesce(i6.inflow, 0)
        |      + CASE WHEN tt.tot IS NULL THEN p5.v ELSE 0 END AS v
        |  FROM st s LEFT JOIN i6 ON s.state = i6.state
        |  LEFT JOIN tt ON s.state = tt.state
        |  LEFT JOIN p5 ON s.state = p5.state),
        |i7 AS (SELECT c.next_state AS state,
        |    sum(p6.v * c.n // tt.tot) AS inflow
        |  FROM c JOIN p6 ON c.state = p6.state
        |  JOIN tt ON c.state = tt.state GROUP BY 1),
        |p7 AS MATERIALIZED (SELECT s.state,
        |    coalesce(i7.inflow, 0)
        |      + CASE WHEN tt.tot IS NULL THEN p6.v ELSE 0 END AS v
        |  FROM st s LEFT JOIN i7 ON s.state = i7.state
        |  LEFT JOIN tt ON s.state = tt.state
        |  LEFT JOIN p6 ON s.state = p6.state),
        |i8 AS (SELECT c.next_state AS state,
        |    sum(p7.v * c.n // tt.tot) AS inflow
        |  FROM c JOIN p7 ON c.state = p7.state
        |  JOIN tt ON c.state = tt.state GROUP BY 1),
        |p8 AS MATERIALIZED (SELECT s.state,
        |    coalesce(i8.inflow, 0)
        |      + CASE WHEN tt.tot IS NULL THEN p7.v ELSE 0 END AS v
        |  FROM st s LEFT JOIN i8 ON s.state = i8.state
        |  LEFT JOIN tt ON s.state = tt.state
        |  LEFT JOIN p7 ON s.state = p7.state)
        |SELECT state, CAST(v AS BIGINT) AS pi_micro FROM p8""".stripMargin,
    "q_markov_transitions" ->
      """WITH seq AS (
        |  SELECT event_type AS state,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY epoch_ms(ts) ASC, event_id ASC) AS next_state
        |  FROM events),
        |c AS (SELECT state, next_state, CAST(count(*) AS BIGINT) AS n_transitions
        |      FROM seq WHERE next_state IS NOT NULL GROUP BY 1, 2)
        |SELECT state, next_state, n_transitions,
        |  CAST(n_transitions * 1000000
        |       // sum(n_transitions) OVER (PARTITION BY state) AS BIGINT) AS p_ppm
        |FROM c""".stripMargin,
    "q_weighted_percentile" ->
      """WITH byval AS (
        |  SELECT l_returnflag AS grp, l_extendedprice AS value,
        |         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
        |  FROM lineitem GROUP BY 1, 2),
        |cum AS (
        |  SELECT grp, value,
        |    CAST(sum(w) OVER (PARTITION BY grp ORDER BY value ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_w,
        |    CAST(sum(w) OVER (PARTITION BY grp) AS BIGINT) AS tot_w
        |  FROM byval),
        |q AS (SELECT CAST(unnest([250000, 500000, 900000, 990000]) AS BIGINT) AS q_ppm)
        |SELECT grp AS l_returnflag, q_ppm, min(value) AS value,
        |       min(tot_w) AS total_weight
        |FROM cum JOIN q ON cum_w * 1000000 >= q_ppm * tot_w
        |GROUP BY 1, 2""".stripMargin,
    "q_linreg" ->
      """WITH q AS (SELECT l_returnflag AS grp,
        |             CAST(l_quantity AS BIGINT) AS x,
        |             CAST(round(l_extendedprice * 100) AS BIGINT) AS y
        |           FROM lineitem),
        |s AS (SELECT grp, CAST(count(*) AS BIGINT) AS n,
        |        sum(x) AS sx, sum(y) AS sy,
        |        sum(x*y) AS sxy, sum(x*x) AS sxx, sum(y*y) AS syy
        |      FROM q GROUP BY 1),
        |d AS (SELECT grp, n,
        |        CAST(n*sxy - sx*sy AS DOUBLE) AS num,
        |        CAST(n*sxx - sx*sx AS DOUBLE) AS denx,
        |        CAST(n*syy - sy*sy AS DOUBLE) AS deny,
        |        CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd,
        |        CAST(n AS DOUBLE) AS nd
        |      FROM s)
        |SELECT grp AS l_returnflag, n AS n_rows,
        |  CAST(round(num / denx * 1e6) AS BIGINT) AS slope_micro,
        |  CAST(round((syd - num / denx * sxd) / nd * 1e6) AS BIGINT) AS intercept_micro,
        |  CAST(round(num * num / (denx * deny) * 1e6) AS BIGINT) AS r2_ppm
        |FROM d""".stripMargin,
    "q_join_advise" ->
      """WITH counts AS (SELECT l_orderkey AS k, count(*) AS cnt FROM lineitem GROUP BY 1),
        |keys AS (SELECT DISTINCT o_orderkey AS k FROM orders
        |         WHERE o_orderpriority = '1-URGENT'),
        |s AS (SELECT
        |  CAST((SELECT sum(cnt) FROM counts) AS BIGINT) AS big_rows,
        |  (SELECT count(*) FROM keys) AS small_keys,
        |  (SELECT max(cnt) FROM counts) AS max_key_rows,
        |  CAST((SELECT coalesce(sum(cnt), 0) FROM counts
        |        WHERE k IN (SELECT k FROM keys)) AS BIGINT) AS matched_rows)
        |SELECT big_rows, small_keys, max_key_rows,
        |  round(CAST(matched_rows AS DOUBLE) / big_rows, 6) AS match_coverage,
        |  CASE WHEN small_keys <= 1000 THEN 'broadcast'
        |       WHEN max_key_rows > 100 THEN 'salt'
        |       WHEN CAST(matched_rows AS DOUBLE) / big_rows < 0.5 THEN 'bloom'
        |       ELSE 'shuffle' END AS strategy
        |FROM s""".stripMargin,
    "q_funnel" ->
      """WITH v AS (SELECT user_id, min(ts) AS v_ts FROM events
        |           WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, min(ts) AS c_ts FROM events e JOIN v USING (user_id)
        |      WHERE event_type = 'click' AND ts > v_ts GROUP BY e.user_id),
        |p AS (SELECT e.user_id, min(ts) AS p_ts FROM events e JOIN c USING (user_id)
        |      WHERE event_type = 'purchase' AND ts > c_ts GROUP BY e.user_id)
        |SELECT (SELECT count(*) FROM v) AS n_view,
        |       (SELECT count(*) FROM c) AS n_view_click,
        |       (SELECT count(*) FROM p) AS n_full_funnel""".stripMargin,
    "q_basket_affinity" ->
      """WITH e AS (SELECT user_id, event_id, event_type, epoch_ms(ts) AS ms
        |      FROM events WHERE ts IS NOT NULL),
        |s AS (SELECT user_id, event_type, ms, event_id,
        |        CASE WHEN lag(ms) OVER w IS NULL
        |                  OR ms - lag(ms) OVER w > 1800000
        |             THEN 1 ELSE 0 END AS new_s
        |      FROM e WINDOW w AS (PARTITION BY user_id
        |                          ORDER BY ms ASC, event_id ASC)),
        |t AS (SELECT DISTINCT
        |        user_id::VARCHAR || ':' ||
        |          (sum(new_s) OVER (PARTITION BY user_id
        |            ORDER BY ms ASC, event_id ASC
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::VARCHAR
        |          AS sid,
        |        event_type AS st
        |      FROM s),
        |ns AS (SELECT CAST(count(DISTINCT sid) AS BIGINT) AS n_sessions FROM t),
        |m AS (SELECT st, CAST(count(*) AS BIGINT) AS n FROM t GROUP BY 1),
        |p AS (SELECT a.st AS state_a, b.st AS state_b,
        |        CAST(count(*) AS BIGINT) AS n_ab
        |      FROM t a JOIN t b ON a.sid = b.sid AND a.st < b.st
        |      GROUP BY 1, 2)
        |SELECT state_a, state_b, n_ab, ma.n AS n_a, mb.n AS n_b,
        |  CAST(n_ab * n_sessions * 1000000 // (ma.n * mb.n) AS BIGINT)
        |    AS lift_ppm
        |FROM p JOIN m ma ON p.state_a = ma.st
        |       JOIN m mb ON p.state_b = mb.st
        |       CROSS JOIN ns""".stripMargin,
    "q_rfm" ->
      """WITH p AS (SELECT user_id, epoch_ms(ts) // 86400000 AS day,
        |        CAST(round(value * 100) AS BIGINT) AS cents
        |      FROM events
        |      WHERE event_type = 'purchase' AND ts IS NOT NULL
        |        AND value IS NOT NULL),
        |a AS (SELECT max(day) AS mx FROM p),
        |u AS (SELECT user_id, max(day) AS last_day,
        |        CAST(count(*) AS BIGINT) AS frequency,
        |        CAST(sum(cents) AS BIGINT) AS monetary_cents
        |      FROM p GROUP BY 1),
        |r AS (SELECT user_id, mx - last_day AS recency_days, frequency,
        |        monetary_cents FROM u, a)
        |SELECT CASE WHEN recency_days <= 1 THEN 'R1' ELSE 'R0' END AS r,
        |  CASE WHEN frequency >= 13 THEN 'F1' ELSE 'F0' END AS f,
        |  CASE WHEN monetary_cents >= 59000 THEN 'M1' ELSE 'M0' END AS m,
        |  CAST(count(*) AS BIGINT) AS n_users,
        |  CAST(sum(monetary_cents) AS BIGINT) AS segment_cents
        |FROM r GROUP BY 1, 2, 3""".stripMargin,
    "q_stickiness" ->
      """WITH e AS (SELECT user_id, epoch_ms(ts) // 86400000 AS day,
        |        (epoch_ms(ts) // 86400000) // 30 AS month
        |      FROM events WHERE ts IS NOT NULL),
        |d AS (SELECT month, day, CAST(count(DISTINCT user_id) AS BIGINT)
        |        AS dau FROM e GROUP BY 1, 2),
        |ds AS (SELECT month, CAST(sum(dau) AS BIGINT) AS dau_sum,
        |        CAST(count(*) AS BIGINT) AS n_days FROM d GROUP BY 1),
        |m AS (SELECT month, CAST(count(DISTINCT user_id) AS BIGINT) AS mau
        |      FROM e GROUP BY 1)
        |SELECT month, n_days, mau,
        |  CAST(dau_sum * 1000000 // (n_days * mau) AS BIGINT)
        |    AS stickiness_ppm
        |FROM ds JOIN m USING (month)""".stripMargin,
    // the oracle replays the whole simulation — masked values, Morton
    // key, value-equidistant file split, footer min/max, grid
    // intersection — in the same integer arithmetic
    "q_prune_sim" -> {
      val zsql = graft.ops.ZOrder.zkeySql(Seq("a", "b"), 10)
      s"""WITH k AS (SELECT l_partkey % 1024 AS a, l_suppkey % 1024 AS b
         |           FROM lineitem),
         |z AS (SELECT a, b, $zsql AS z FROM k),
         |e AS (SELECT 'range_l_partkey' AS layout, a * 64 // 1024 AS file_id,
         |             a, b FROM z
         |      UNION ALL SELECT 'range_l_suppkey', b * 64 // 1024, a, b FROM z
         |      UNION ALL SELECT 'zorder', z * 64 // 1048576, a, b FROM z),
         |f AS (SELECT layout, file_id, min(a) AS min_a, max(a) AS max_a,
         |             min(b) AS min_b, max(b) AS max_b
         |      FROM e GROUP BY 1, 2),
         |p AS (SELECT dim, CAST(i AS BIGINT) AS pred_id,
         |        CAST(i * 1024 // 16 AS BIGINT) AS lo,
         |        CAST((i + 1) * 1024 // 16 AS BIGINT) AS hi
         |      FROM range(16) t(i)
         |      CROSS JOIN (VALUES ('l_partkey'), ('l_suppkey')) d(dim)),
         |g AS (SELECT f.layout, p.dim, p.pred_id, p.lo, p.hi,
         |        CAST(count(*) AS BIGINT) AS n_files,
         |        CAST(sum(CASE WHEN
         |            (CASE WHEN p.dim = 'l_partkey' THEN f.min_a
         |                  ELSE f.min_b END) <= p.hi - 1
         |            AND (CASE WHEN p.dim = 'l_partkey' THEN f.max_a
         |                      ELSE f.max_b END) >= p.lo
         |          THEN 1 ELSE 0 END) AS BIGINT) AS n_scanned
         |      FROM f CROSS JOIN p GROUP BY 1, 2, 3, 4, 5)
         |SELECT layout, dim, pred_id, lo, hi, n_files, n_scanned,
         |  CAST((n_files - n_scanned) * 1000000 // n_files AS BIGINT)
         |    AS prune_ppm
         |FROM g""".stripMargin
    },
    // rate over ALL signups; latency quantiles are LOWER weighted
    // quantiles over distinct minute values (actual data, integer
    // threshold test) — zero-conversion cohorts keep a NULL-q row
    "q_time_to_convert" ->
      """WITH s AS (SELECT user_id, min(ts) AS f_ts FROM events
        |           WHERE event_type = 'signup' AND ts IS NOT NULL
        |           GROUP BY 1),
        |c AS (SELECT s.user_id, min(e.ts) AS c_ts
        |      FROM s JOIN events e ON e.user_id = s.user_id
        |       AND e.event_type = 'purchase' AND e.ts IS NOT NULL
        |       AND e.ts >= s.f_ts
        |      GROUP BY 1),
        |u AS (SELECT date_trunc('week', s.f_ts) AS cohort_week,
        |        (epoch_ms(c.c_ts) - epoch_ms(s.f_ts)) // 60000 AS lat_min
        |      FROM s LEFT JOIN c ON s.user_id = c.user_id),
        |g AS (SELECT cohort_week, CAST(count(*) AS BIGINT) AS n_signups,
        |        CAST(count(lat_min) AS BIGINT) AS n_converted,
        |        CAST(count(lat_min) * 1000000 // count(*) AS BIGINT)
        |          AS convert_ppm
        |      FROM u GROUP BY 1),
        |bv AS (SELECT cohort_week, lat_min, CAST(count(*) AS BIGINT) AS w
        |       FROM u WHERE lat_min IS NOT NULL GROUP BY 1, 2),
        |cw AS (SELECT cohort_week, lat_min,
        |         CAST(sum(w) OVER (PARTITION BY cohort_week ORDER BY lat_min
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |           AS BIGINT) AS cum_w,
        |         CAST(sum(w) OVER (PARTITION BY cohort_week) AS BIGINT)
        |           AS tot_w
        |       FROM bv),
        |q AS (SELECT cohort_week, CAST(q_ppm AS BIGINT) AS q_ppm,
        |        CAST(min(lat_min) AS BIGINT) AS latency_min
        |      FROM cw JOIN (VALUES (500000), (900000)) v(q_ppm)
        |        ON cum_w * 1000000 >= q_ppm * tot_w
        |      GROUP BY 1, 2)
        |SELECT g.cohort_week, g.n_signups, g.n_converted, g.convert_ppm,
        |       q.q_ppm, q.latency_min
        |FROM g LEFT JOIN q ON g.cohort_week = q.cohort_week""".stripMargin,
    // hazard/survival quantized per the micro-nat convention: each
    // term is one IEEE division of exact BIGINTs and one ln, rounded
    // per row, then integer-summed; the poison flag keeps the tail
    // NULL on both engines (SUM would silently skip the NULL hazard)
    "q_survival" ->
      """WITH s AS (SELECT o_custkey AS id,
        |             CAST(min(o_orderdate) AS DATE) AS f,
        |             CAST(max(o_orderdate) AS DATE) AS l
        |           FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1),
        |h AS (SELECT max(l) AS horizon FROM s),
        |lv AS (SELECT CAST(date_diff('day', f, l) AS BIGINT) // 30 AS t,
        |         CASE WHEN date_diff('day', l, horizon) > 60
        |              THEN 1 ELSE 0 END AS ev
        |       FROM s, h),
        |p AS (SELECT t, CAST(sum(ev) AS BIGINT) AS n_events,
        |        CAST(sum(1 - ev) AS BIGINT) AS n_censored
        |      FROM lv GROUP BY 1),
        |r AS (SELECT t, n_events, n_censored,
        |        CAST(sum(n_events + n_censored) OVER (ORDER BY t DESC
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |          AS BIGINT) AS n_risk
        |      FROM p),
        |z AS (SELECT t, n_risk, n_events, n_censored,
        |        CASE WHEN n_risk > n_events
        |             THEN CAST(round(ln((n_risk - n_events)
        |                    / CAST(n_risk AS DOUBLE)) * 1000000) AS BIGINT)
        |             END AS haz_ln_micro
        |      FROM r)
        |SELECT t, n_risk, n_events, n_censored, haz_ln_micro,
        |  CASE WHEN max(CASE WHEN haz_ln_micro IS NULL THEN 1 ELSE 0 END)
        |         OVER (ORDER BY t
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) > 0
        |       THEN NULL
        |       ELSE CAST(sum(haz_ln_micro) OVER (ORDER BY t
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |       END AS surv_ln_micro
        |FROM z""".stripMargin,
    "q_cohort_ltv" ->
      """WITH e AS (SELECT user_id, ts,
        |        CAST(round(value * 100) AS BIGINT) AS cents
        |      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
        |f AS (SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
        |      FROM e GROUP BY 1),
        |p AS (SELECT cohort_week,
        |        date_diff('day', cohort_week, date_trunc('week', ts)) // 7 AS week_k,
        |        CAST(count(DISTINCT user_id) AS BIGINT) AS n_active,
        |        CAST(sum(cents) AS BIGINT) AS value_cents
        |      FROM e JOIN f USING (user_id)
        |      GROUP BY 1, 2)
        |SELECT cohort_week, week_k, n_active, value_cents,
        |  CAST(sum(value_cents) OVER (PARTITION BY cohort_week ORDER BY week_k
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum_value_cents
        |FROM p""".stripMargin,
    "q_cohort_retention" ->
      """WITH f AS (SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
        |           FROM events GROUP BY 1),
        |a AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events)
        |SELECT cohort_week,
        |       date_diff('day', cohort_week, wk) // 7 AS week_k,
        |       count(DISTINCT user_id) AS n_active
        |FROM a JOIN f USING (user_id)
        |GROUP BY 1, 2""".stripMargin,
    "q_skew_salted_join" ->
      """SELECT p_brand,
        |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_size <= 15
        |GROUP BY p_brand""".stripMargin,
    "q_bloom_join" ->
      """SELECT l_returnflag,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS urgent_revenue,
        |  count(*) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT'
        |GROUP BY l_returnflag""".stripMargin,
    "q_distinct_agg" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users,
        |  count(*) AS n_events
        |FROM events GROUP BY event_type""".stripMargin,
    "q_semi_join" ->
      """SELECT o_orderpriority, count(*) AS n_late_orders
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_returnflag = 'R')
        |GROUP BY o_orderpriority""".stripMargin,
    "q_anti_join" ->
      """SELECT c_mktsegment, count(*) AS n_dormant
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_totalprice > 300000)
        |GROUP BY c_mktsegment""".stripMargin,
    "q_heavy_hitters" ->
      """WITH c AS (SELECT o_custkey, count(*) AS cnt FROM orders GROUP BY 1),
        |     t AS (SELECT sum(cnt) AS total FROM c)
        |SELECT o_custkey, cnt,
        |       round(CAST(cnt AS DOUBLE) / CAST(total AS DOUBLE), 6) AS share
        |FROM c, t
        |ORDER BY cnt DESC, o_custkey ASC
        |LIMIT 20""".stripMargin,
    "q_pivot" ->
      """SELECT l_returnflag,
        |  CAST(coalesce(sum(CASE WHEN l_linestatus = 'F'
        |         THEN CAST(l_quantity AS DECIMAL(18,2)) END), 0) AS DOUBLE) AS qty_f,
        |  CAST(coalesce(sum(CASE WHEN l_linestatus = 'O'
        |         THEN CAST(l_quantity AS DECIMAL(18,2)) END), 0) AS DOUBLE) AS qty_o
        |FROM lineitem
        |GROUP BY l_returnflag""".stripMargin,
    "q_zorder_key" ->
      s"""SELECT l_orderkey, l_linenumber,
         |  ${graft.ops.ZOrder.zkeySql(Seq("(l_partkey % 65536)", "(l_suppkey % 65536)"), 16)} AS zkey
         |FROM lineitem""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q1_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
        |  coalesce(l_linestatus, 'ALL') AS l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,
    "q_cube" ->
      """SELECT coalesce(o_orderpriority, 'ALL') AS o_orderpriority,
        |  coalesce(o_orderstatus, 'ALL') AS o_orderstatus,
        |  count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders
        |GROUP BY CUBE (o_orderpriority, o_orderstatus)""".stripMargin,
    "q_percentiles" ->
      """WITH pr AS (SELECT o_orderpriority AS g, o_totalprice AS v FROM orders),
        |c AS (SELECT g, v, CAST(count(*) AS BIGINT) AS cnt FROM pr GROUP BY 1, 2),
        |n AS (SELECT g, CAST(count(*) AS BIGINT) AS n_orders FROM pr GROUP BY 1),
        |w AS (SELECT c.g, v,
        |        CAST(sum(cnt) OVER (PARTITION BY c.g ORDER BY v) AS BIGINT) AS cum,
        |        n.n_orders
        |      FROM c JOIN n ON c.g = n.g)
        |SELECT g AS o_orderpriority,
        |  min(CASE WHEN cum >= (n_orders - 1) // 4 + 1 THEN v END) AS p25,
        |  min(CASE WHEN cum >= (n_orders - 1) // 2 + 1 THEN v END) AS p50,
        |  min(CASE WHEN cum >= ((n_orders - 1) * 3) // 4 + 1 THEN v END) AS p75,
        |  max(n_orders) AS n_orders
        |FROM w GROUP BY 1""".stripMargin,
    "q3_join_agg" ->
      """SELECT l_orderkey, o_orderdate,
        |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1997-03-15'
        |  AND l_shipdate > TIMESTAMP '1997-03-15'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey ASC
        |LIMIT 10""".stripMargin,
    "q5_multijoin" ->
      """SELECT n_name,
        |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name""".stripMargin,
    "q_topk_window" ->
      """SELECT o_orderkey, o_orderpriority, o_totalprice, rank_in_priority
        |FROM (
        |  SELECT o_orderkey, o_orderpriority, o_totalprice,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank_in_priority
        |  FROM orders) t
        |WHERE rank_in_priority <= 3""".stripMargin,
    "q_fuzzy_join" ->
      """WITH k AS (SELECT s_suppkey AS id,
        |        s_name || '-' || substr(md5(s_suppkey::VARCHAR), 1, 8) AS name
        |      FROM supplier),
        |l AS (SELECT id AS id_l, name AS k_l FROM k),
        |r AS (SELECT id + 100000 AS id_r,
        |        concat(substr(name, 1, p - 1), 'z',
        |               substr(name, p + 1, length(name))) AS k_r
        |      FROM (SELECT id, name, (id % 24 + 3) AS p FROM k)),
        |le AS (SELECT id_l, k_l, length(k_l) AS len_l,
        |         unnest(range(1, length(k_l) - 1)) AS i FROM l),
        |lg AS (SELECT id_l, k_l, len_l, substr(k_l, i, 3) AS g,
        |         row_number() OVER (PARTITION BY id_l, substr(k_l, i, 3)
        |                            ORDER BY i) - 1 AS occ
        |       FROM le),
        |re AS (SELECT id_r, k_r, length(k_r) AS len_r,
        |         unnest(range(1, length(k_r) - 1)) AS i FROM r),
        |rg AS (SELECT id_r, k_r, len_r, substr(k_r, i, 3) AS g,
        |         row_number() OVER (PARTITION BY id_r, substr(k_r, i, 3)
        |                            ORDER BY i) - 1 AS occ
        |       FROM re),
        |sh AS (SELECT id_l, k_l, len_l, id_r, k_r, len_r,
        |         count(*) AS n_shared
        |       FROM lg JOIN rg USING (g, occ)
        |       GROUP BY 1, 2, 3, 4, 5, 6)
        |SELECT id_l, k_l, id_r, k_r,
        |  CAST(levenshtein(k_l, k_r) AS BIGINT) AS dist
        |FROM sh
        |WHERE greatest(len_l, len_r) >= 6
        |  AND n_shared >= greatest(len_l, len_r) - 5
        |  AND levenshtein(k_l, k_r) <= 1""".stripMargin,
    // algorithm-independent truth: calendar x events range join with
    // per-day COUNT(DISTINCT) — the naive plan the islands replace
    "q_sliding_distinct" ->
      """WITH e AS (SELECT DISTINCT user_id AS u,
        |        epoch_ms(ts) // 86400000 AS d
        |      FROM events WHERE ts IS NOT NULL),
        |cal AS (SELECT unnest(generate_series(
        |          (SELECT min(d) FROM e), (SELECT max(d) FROM e))) AS day)
        |SELECT c.day, count(DISTINCT e.u) AS n_active
        |FROM cal c JOIN e ON e.d BETWEEN c.day - 6 AND c.day
        |GROUP BY 1""".stripMargin,
    // algorithm-independent truth: the plain overlap predicate —
    // the binning + first-shared-bin dedup must reproduce it exactly
    "q_interval_join" ->
      """WITH l AS (SELECT user_id AS k, event_id AS lid, epoch_ms(ts) AS s,
        |        epoch_ms(ts) + 600000 AS e
        |      FROM events WHERE event_type = 'click' AND ts IS NOT NULL),
        |r AS (SELECT user_id AS k, event_id AS rid, epoch_ms(ts) AS s,
        |        epoch_ms(ts) + 600000 AS e
        |      FROM events WHERE event_type = 'purchase' AND ts IS NOT NULL)
        |SELECT l.k AS user_id, l.lid AS click_id, r.rid AS purchase_id,
        |  greatest(l.s, r.s) AS o_start_ms,
        |  least(l.e, r.e) - greatest(l.s, r.s) AS overlap_ms
        |FROM l JOIN r ON l.k = r.k AND l.s < r.e AND r.s < l.e""".stripMargin,
    "q_changepoint" ->
      """WITH e AS (SELECT user_id AS k, event_id AS id, epoch_ms(ts) AS ms,
        |        CAST(round(value * 100) AS BIGINT) AS q
        |      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
        |w AS (SELECT k, id,
        |        sum(q) OVER (PARTITION BY k ORDER BY ms, id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p,
        |        row_number() OVER (PARTITION BY k ORDER BY ms, id) AS i,
        |        count(*) OVER (PARTITION BY k) AS n,
        |        sum(q) OVER (PARTITION BY k) AS t
        |      FROM e),
        |c AS (SELECT k, id, i, n, p, t, abs(n * p - i * t) AS d
        |      FROM w WHERE i < n),
        |r AS (SELECT *, row_number() OVER (PARTITION BY k
        |        ORDER BY d DESC, i ASC) AS rn FROM c)
        |SELECT k AS user_id, CAST(n AS BIGINT) AS n_events,
        |  CAST(i AS BIGINT) AS cp_pos, id AS cp_event_id,
        |  CAST(d AS BIGINT) AS cusum_score,
        |  CAST((p * 10) // i AS BIGINT) AS mean_before_milli,
        |  CAST(((t - p) * 10) // (n - i) AS BIGINT) AS mean_after_milli
        |FROM r WHERE rn = 1""".stripMargin,
    "q_period_compare" ->
      """WITH d AS (SELECT event_type, epoch_ms(ts) // 86400000 AS day
        |           FROM events WHERE ts IS NOT NULL),
        |m AS (SELECT max(day) AS maxd FROM d)
        |SELECT event_type,
        |  CAST(sum(CASE WHEN day > maxd - 7 THEN 1 ELSE 0 END) AS BIGINT) AS cur,
        |  CAST(sum(CASE WHEN day <= maxd - 7 AND day > maxd - 14
        |      THEN 1 ELSE 0 END) AS BIGINT) AS prev,
        |  CAST(((sum(CASE WHEN day > maxd - 7 THEN 1 ELSE 0 END)
        |    - sum(CASE WHEN day <= maxd - 7 AND day > maxd - 14 THEN 1 ELSE 0 END))
        |    * 1000000)
        |    // greatest(sum(CASE WHEN day <= maxd - 7 AND day > maxd - 14
        |        THEN 1 ELSE 0 END), 1) AS BIGINT) AS delta_ppm
        |FROM d, m GROUP BY 1""".stripMargin,
    // the oracle replays the zero-filled grid and generates the lag
    // pairs by a self-join (b.day in (a.day, a.day+10]) — the same
    // pair set the Spark side derives from one multi-lead window
    "q_autocorr" ->
      """WITH d AS (SELECT event_type AS k,
        |        epoch_ms(ts) // 86400000 AS day
        |      FROM events WHERE ts IS NOT NULL),
        |g AS (SELECT k, day, CAST(count(*) AS BIGINT) AS n
        |      FROM d GROUP BY 1, 2),
        |s AS (SELECT k, min(day) AS lo, max(day) AS hi FROM g GROUP BY 1),
        |grid AS (SELECT k, unnest(generate_series(lo, hi)) AS day FROM s),
        |f AS (SELECT grid.k, grid.day, coalesce(g.n, 0) AS x
        |      FROM grid LEFT JOIN g ON grid.k = g.k AND grid.day = g.day),
        |p AS (SELECT a.k, b.day - a.day AS lag, a.x, b.x AS y
        |      FROM f a JOIN f b
        |        ON a.k = b.k AND b.day > a.day AND b.day <= a.day + 10),
        |st AS (SELECT k, lag, CAST(count(*) AS BIGINT) AS n_pairs,
        |        CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |        CAST(sum(x * y) AS BIGINT) AS sxy,
        |        CAST(sum(x * x) AS BIGINT) AS sxx,
        |        CAST(sum(y * y) AS BIGINT) AS syy
        |      FROM p GROUP BY 1, 2)
        |SELECT k AS event_type, lag, n_pairs, sx, sy, sxy, sxx, syy,
        |  n_pairs * sxy - sx * sy AS cov_num,
        |  n_pairs * sxx - sx * sx AS varx_num,
        |  n_pairs * syy - sy * sy AS vary_num
        |FROM st""".stripMargin,
    "q_seasonality" ->
      """WITH d AS (SELECT event_type,
        |        epoch_ms(ts) // 86400000 AS day
        |      FROM events WHERE ts IS NOT NULL),
        |g AS (SELECT event_type, day, count(*) AS n FROM d GROUP BY 1, 2),
        |p AS (SELECT event_type, day % 7 AS phase, sum(n) AS pn,
        |        count(*) AS pd
        |      FROM g GROUP BY 1, 2)
        |SELECT g.event_type, g.day, g.day % 7 AS phase,
        |  CAST(g.n AS BIGINT) AS n,
        |  CAST((p.pn * 1000) // p.pd AS BIGINT) AS expected_milli,
        |  CAST(g.n * 1000 - (p.pn * 1000) // p.pd AS BIGINT) AS resid_milli
        |FROM g JOIN p ON g.event_type = p.event_type
        |  AND g.day % 7 = p.phase""".stripMargin,
    "q_ewma" ->
      """WITH e AS (SELECT user_id AS k, event_id AS id, epoch_ms(ts) AS ms,
        |        CAST(round(value * 100) AS BIGINT) AS q
        |      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
        |l AS (SELECT k, id, ms,
        |        lag(q, 0) OVER w AS l0, lag(q, 1) OVER w AS l1,
        |        lag(q, 2) OVER w AS l2, lag(q, 3) OVER w AS l3
        |      FROM e WINDOW w AS (PARTITION BY k ORDER BY ms, id))
        |SELECT k AS user_id, id AS event_id, ms AS ts_ms,
        |  CAST(CASE WHEN l0 IS NULL THEN 0 ELSE 1 END
        |     + CASE WHEN l1 IS NULL THEN 0 ELSE 1 END
        |     + CASE WHEN l2 IS NULL THEN 0 ELSE 1 END
        |     + CASE WHEN l3 IS NULL THEN 0 ELSE 1 END AS BIGINT) AS n_window,
        |  ((COALESCE(l0, 0) * 8 + COALESCE(l1, 0) * 4
        |    + COALESCE(l2, 0) * 2 + COALESCE(l3, 0)) * 10)
        |  // (CASE WHEN l0 IS NULL THEN 0 ELSE 8 END
        |     + CASE WHEN l1 IS NULL THEN 0 ELSE 4 END
        |     + CASE WHEN l2 IS NULL THEN 0 ELSE 2 END
        |     + CASE WHEN l3 IS NULL THEN 0 ELSE 1 END) AS smoothed_milli
        |FROM l""".stripMargin,
    "q_nearest_join" ->
      """WITH e AS (SELECT user_id AS k, ts AS t, epoch_ms(ts) AS ms,
        |        event_id AS id,
        |        CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is_left
        |      FROM events WHERE event_type IN ('click', 'purchase')),
        |w AS (SELECT k, t, ms, id, is_left,
        |  last_value(CASE WHEN is_left = 0 THEN ms END IGNORE NULLS)
        |    OVER (PARTITION BY k ORDER BY ms, is_left, id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS b_ms,
        |  last_value(CASE WHEN is_left = 0 THEN id END IGNORE NULLS)
        |    OVER (PARTITION BY k ORDER BY ms, is_left, id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS b_id,
        |  last_value(CASE WHEN is_left = 0 THEN ms END IGNORE NULLS)
        |    OVER (PARTITION BY k ORDER BY ms DESC, is_left, id DESC
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS f_ms,
        |  last_value(CASE WHEN is_left = 0 THEN id END IGNORE NULLS)
        |    OVER (PARTITION BY k ORDER BY ms DESC, is_left, id DESC
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS f_id
        |  FROM e),
        |c AS (SELECT k, t, id, b_id, f_id,
        |        ms - b_ms AS db, ms - f_ms AS df,
        |        (b_id IS NOT NULL AND (f_id IS NULL OR ms - b_ms <= -(ms - f_ms)))
        |          AS pick_b
        |      FROM w WHERE is_left = 1)
        |SELECT id AS left_id, k AS user_id, t AS left_ts,
        |  CASE WHEN b_id IS NOT NULL OR f_id IS NOT NULL THEN 1 ELSE 0 END
        |    AS has_nearest,
        |  CASE WHEN pick_b THEN b_id ELSE coalesce(f_id, -1) END AS nearest_id,
        |  CASE WHEN pick_b THEN db
        |       WHEN f_id IS NOT NULL THEN df ELSE -1 END AS delta_ms
        |FROM c""".stripMargin,
    "q_gaps_islands" ->
      """WITH iv AS (SELECT user_id AS k, epoch_ms(ts) AS s,
        |        epoch_ms(ts) + 1800000 AS e FROM events),
        |m AS (SELECT k, s, e,
        |        max(e) OVER (PARTITION BY k ORDER BY s, e
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
        |      FROM iv),
        |f AS (SELECT k, s, e,
        |        CASE WHEN pmax IS NULL OR s > pmax THEN 1 ELSE 0 END AS nw
        |      FROM m),
        |isl AS (SELECT k, s, e,
        |          sum(nw) OVER (PARTITION BY k ORDER BY s, e
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island_idx
        |        FROM f),
        |g AS (SELECT k, island_idx, min(s) AS island_start,
        |        max(e) AS island_end, count(*) AS n_intervals
        |      FROM isl GROUP BY 1, 2)
        |SELECT k AS user_id, CAST(count(*) AS BIGINT) AS n_islands,
        |  CAST(sum(island_end - island_start) AS BIGINT) AS covered_ms,
        |  CAST(max(island_end - island_start) AS BIGINT) AS max_island_ms,
        |  CAST(sum(n_intervals) AS BIGINT) AS n_events
        |FROM g GROUP BY 1""".stripMargin,
    "q_attribution" ->
      """WITH e AS (SELECT user_id AS k, ts AS t, event_id AS id,
        |        CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_conv
        |      FROM events WHERE event_type IN ('click', 'purchase')),
        |w AS (SELECT k, t, id, is_conv,
        |        last_value(CASE WHEN is_conv = 0 THEN t END IGNORE NULLS)
        |          OVER (PARTITION BY k ORDER BY t, is_conv, id
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS touch_ts,
        |        last_value(CASE WHEN is_conv = 0 THEN id END IGNORE NULLS)
        |          OVER (PARTITION BY k ORDER BY t, is_conv, id
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS touch_id
        |      FROM e),
        |c AS (SELECT k, t, id, touch_id,
        |        epoch_ms(t) - epoch_ms(touch_ts) AS age_ms,
        |        CASE WHEN touch_id IS NOT NULL
        |                  AND epoch_ms(t) - epoch_ms(touch_ts) <= 21600000
        |             THEN 1 ELSE 0 END AS has_touch
        |      FROM w WHERE is_conv = 1)
        |SELECT id AS conversion_id, k AS user_id, t AS conv_ts, has_touch,
        |  CASE WHEN has_touch = 1 THEN touch_id ELSE -1 END AS touch_id,
        |  CASE WHEN has_touch = 1 THEN age_ms ELSE -1 END AS touch_age_ms
        |FROM c""".stripMargin,
    "q_gap_fill" ->
      """WITH e AS (SELECT user_id AS k, ts AS t, value AS v FROM events),
        |b AS (SELECT k, min(t) AS t0, max(t) AS t1 FROM e GROUP BY 1),
        |g AS (SELECT k, unnest(generate_series(
        |        make_timestamp(CAST(floor(date_part('epoch', t0)) AS BIGINT)
        |          // 3600 * 3600 * 1000000),
        |        make_timestamp(CAST(floor(date_part('epoch', t1)) AS BIGINT)
        |          // 3600 * 3600 * 1000000),
        |        INTERVAL 3600 SECOND)) AS t FROM b),
        |u AS (SELECT k, t, v, 0 AS is_grid FROM e
        |      UNION ALL SELECT k, t, NULL, 1 FROM g),
        |w AS (SELECT k, t, is_grid,
        |        last_value(v IGNORE NULLS) OVER (PARTITION BY k
        |          ORDER BY t, is_grid, v
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fv
        |      FROM u),
        |c AS (SELECT k, make_timestamp(CAST(floor(date_part('epoch', t)) AS BIGINT)
        |          // 3600 * 3600 * 1000000) AS t,
        |        CAST(count(*) AS BIGINT) AS n_events
        |      FROM e GROUP BY 1, 2)
        |SELECT w.k AS user_id, w.t AS bucket_ts,
        |  CASE WHEN w.fv IS NULL THEN 0 ELSE 1 END AS has_value,
        |  coalesce(w.fv, 0.0) AS filled_value,
        |  coalesce(c.n_events, 0) AS n_events
        |FROM w LEFT JOIN c ON w.k = c.k AND w.t = c.t
        |WHERE w.is_grid = 1""".stripMargin,
    "q_events_window" ->
      """SELECT date_trunc('hour', ts) AS hour_start, event_type,
        |  count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,
        |  count(DISTINCT user_id) AS n_users
        |FROM events
        |GROUP BY 1, 2""".stripMargin,
    "q_events_sessionize" ->
      """SELECT user_id, event_id, ts_ms,
        |  CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_ms ASC, event_id ASC
        |                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
        |FROM (
        |  SELECT user_id, event_id, epoch_ms(ts) AS ts_ms,
        |    CASE WHEN lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY epoch_ms(ts) ASC, event_id ASC) IS NULL
        |              OR epoch_ms(ts) - lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY epoch_ms(ts) ASC, event_id ASC) > 1800000
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events) t""".stripMargin,
    "q_running_sum" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2)))
        |       OVER (PARTITION BY l_suppkey
        |             ORDER BY l_shipdate ASC, l_orderkey ASC, l_linenumber ASC,
        |                      l_quantity ASC, l_extendedprice ASC
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty
        |FROM lineitem""".stripMargin,
    "q_anomaly_mad" ->
      """WITH q AS (SELECT event_id, event_type, value,
        |             CAST(round(value * 100) AS BIGINT) AS q FROM events),
        |med AS (SELECT event_type, round(quantile_cont(q, 0.5), 6) AS med
        |        FROM q GROUP BY 1),
        |mad AS (SELECT q.event_type,
        |          round(quantile_cont(abs(q.q - med.med), 0.5), 6) AS mad
        |        FROM q JOIN med USING (event_type) GROUP BY 1)
        |SELECT event_id, q.event_type, value,
        |       CAST(round(1000 * abs(q.q - med.med) / mad.mad) AS BIGINT)
        |         AS mad_score_milli
        |FROM q JOIN med USING (event_type) JOIN mad USING (event_type)
        |WHERE mad.mad > 0.0 AND abs(q.q - med.med) / mad.mad > 5.0""".stripMargin,
    // DuckDB // and Spark div BOTH truncate toward zero, so the signed
    // deviation divides identically on both engines
    "q_robust_scale" ->
      """WITH b AS (SELECT event_id, event_type,
        |             CAST(round(value * 100) AS BIGINT) AS q FROM events),
        |c AS (SELECT event_type, q, CAST(count(*) AS BIGINT) AS cnt
        |      FROM b GROUP BY 1, 2),
        |n AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n
        |      FROM b GROUP BY 1),
        |w AS (SELECT c.event_type, q,
        |        CAST(sum(cnt) OVER (PARTITION BY c.event_type ORDER BY q)
        |          AS BIGINT) AS cum, n.n
        |      FROM c JOIN n ON c.event_type = n.event_type),
        |s AS (SELECT event_type,
        |        min(CASE WHEN cum >= (n - 1) // 4 + 1 THEN q END) AS q1,
        |        min(CASE WHEN cum >= (n - 1) // 2 + 1 THEN q END) AS med,
        |        min(CASE WHEN cum >= ((n - 1) * 3) // 4 + 1 THEN q END) AS q3
        |      FROM w GROUP BY 1)
        |SELECT event_id, b.event_type,
        |       CAST(((b.q - s.med) * 1000) // (s.q3 - s.q1) AS BIGINT)
        |         AS robust_milli
        |FROM b JOIN s ON b.event_type = s.event_type
        |WHERE s.q3 - s.q1 > 0""".stripMargin,
    "q_percent_rank" ->
      """WITH r AS (SELECT o_orderkey, o_orderpriority,
        |      CAST(row_number() OVER (PARTITION BY o_orderpriority
        |             ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS rn,
        |      CAST(count(*) OVER (PARTITION BY o_orderpriority) AS BIGINT) AS n
        |    FROM orders)
        |SELECT o_orderkey, o_orderpriority,
        |  CAST(CASE WHEN n > 1 THEN ((rn - 1) * 1000000) // (n - 1)
        |       ELSE 0 END AS BIGINT) AS pr_micro
        |FROM r""".stripMargin,
    "q_props_extract" ->
      """SELECT event_type,
        |  count(k) AS n_with_k, CAST(sum(k) AS BIGINT) AS sum_k,
        |  min(k) AS min_k, max(k) AS max_k
        |FROM (SELECT event_type,
        |        CAST(json_extract_string(props, 'k') AS BIGINT) AS k
        |      FROM events)
        |GROUP BY 1""".stripMargin,
    "q_anomaly_zscore" ->
      """WITH q AS (SELECT event_id, event_type, value,
        |             CAST(round(value * 100) AS BIGINT) AS q FROM events),
        |s AS (SELECT event_type, count(*) AS n, sum(q) AS s1,
        |             sum(q * q) AS s2
        |      FROM q GROUP BY 1)
        |SELECT event_id, q.event_type, value,
        |       CAST(round(1000 * (CAST(q.q AS DOUBLE) * s.n - s.s1)
        |         / sqrt(CAST(s.n AS DOUBLE) * s.s2
        |                - CAST(s.s1 AS DOUBLE) * s.s1)) AS BIGINT) AS z_milli
        |FROM q JOIN s USING (event_type)
        |WHERE s.n * s.s2 > s.s1 * s.s1
        |  AND abs((CAST(q.q AS DOUBLE) * s.n - s.s1)
        |      / sqrt(CAST(s.n AS DOUBLE) * s.s2
        |             - CAST(s.s1 AS DOUBLE) * s.s1)) > 3.0""".stripMargin,
    "q_rolling_window" ->
      """SELECT user_id, event_id, epoch_ms(ts) AS ts_ms,
        |  CAST(sum(CAST(value AS DECIMAL(18,4)))
        |       OVER (PARTITION BY user_id ORDER BY epoch_ms(ts) ASC
        |             RANGE BETWEEN 86400000 PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS rolling_value,
        |  count(*) OVER (PARTITION BY user_id ORDER BY epoch_ms(ts) ASC
        |                 RANGE BETWEEN 86400000 PRECEDING AND CURRENT ROW)
        |    AS rolling_events
        |FROM events""".stripMargin,
    "q_range_join" ->
      """SELECT p.event_id AS promo_id, count(*) AS n_clicks,
        |  CAST(sum(CAST(c.value AS DECIMAL(18,4))) AS DOUBLE) AS click_value
        |FROM events p
        |JOIN events c
        |  ON c.event_type = 'click'
        | AND epoch_ms(c.ts) >= epoch_ms(p.ts)
        | AND epoch_ms(c.ts) < epoch_ms(p.ts) + 7200000
        |WHERE p.event_type = 'purchase' AND p.event_id % 50 = 0
        |GROUP BY 1""".stripMargin,
    "q_asof_join" ->
      """WITH t AS (
        |  SELECT user_id, epoch_ms(ts) AS ts_ms, 1 AS side,
        |         event_id AS click_id, NULL::BIGINT AS purchase_id, NULL::DOUBLE AS purchase_value
        |  FROM events WHERE event_type = 'click'
        |  UNION ALL
        |  SELECT user_id, epoch_ms(ts), 0, NULL, event_id, value
        |  FROM events WHERE event_type = 'purchase'),
        |w AS (
        |  SELECT *,
        |    last_value(purchase_id IGNORE NULLS) OVER win AS a_pid,
        |    last_value(purchase_value IGNORE NULLS) OVER win AS a_pval
        |  FROM t
        |  WINDOW win AS (PARTITION BY user_id ORDER BY ts_ms ASC, side ASC, purchase_id ASC
        |                 ROWS UNBOUNDED PRECEDING))
        |SELECT click_id, user_id, ts_ms,
        |  coalesce(a_pid, -1) AS purchase_id,
        |  coalesce(a_pval, -1.0) AS purchase_value
        |FROM w WHERE side = 1""".stripMargin)
}
