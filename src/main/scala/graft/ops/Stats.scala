package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact grouped statistics over event sequences and measures:
  * first-order Markov transition matrices, weighted quantiles, and
  * grouped least-squares fits.
  *
  * All three follow the repo's cross-engine determinism doctrine:
  * heavy arithmetic happens on exact integers (BIGINT counts/weights,
  * cent-quantized measures, DECIMAL power sums), and any double is
  * either an actual input value carried through untouched or a final
  * ratio of exact integers quantized to micro/ppm units — so results
  * replay bit-identically in DuckDB.
  */
object Stats {

  /** First-order Markov transition matrix over per-key ordered state
    * sequences (the product-analytics "what happens after X" table and
    * the event-stream health profile in one op).
    *
    * Shape at scale: ONE shuffle of the event table on the sequence
    * key for the `lead` window; the (state, next_state) counting is a
    * partial aggregation, and the per-state normalization is a window
    * over the |states|² transition table — never the event table.
    * `p_ppm = floor(n·10⁶ / total)` stays integer-exact.
    */
  def transitionMatrix(df: DataFrame, keyCol: String, orderCols: Seq[Column],
                       stateCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(orderCols: _*)
    df.withColumn("__next", lead(col(stateCol), 1).over(w))
      .filter(col("__next").isNotNull)
      .groupBy(col(stateCol).as("state"), col("__next").as("next_state"))
      .agg(count(lit(1)).as("n_transitions"))
      .withColumn("p_ppm", expr(
        "n_transitions * 1000000 DIV sum(n_transitions) OVER (PARTITION BY state)"))
  }

  /** Stationary distribution of a first-order Markov chain — the
    * long-run state occupancy [[transitionMatrix]]'s one-step
    * probabilities only hint at: where do user journeys actually
    * SPEND their time once transients wash out (the session-mix
    * forecast, the "what fraction of traffic ends up in checkout"
    * readout). Fixed `iters` power iterations of π' = πP (the
    * pageRank convention — deterministic cost, a replayable oracle),
    * in exact micro-unit long arithmetic: each term is
    * `π(s)·n(s,s') div tot(s)` over the RAW transition counts (no
    * compounding through pre-rounded ppm probabilities), floor
    * leakage deterministic. A state with no outgoing transitions
    * (appears only as a target) self-loops — mass parks rather than
    * vanishing.
    *
    * Scale shape: the chain lives on the |states|² transition table —
    * state-grain, not event-grain — so each iteration is one tiny
    * equi-join + partial-agg sum, lineage-truncated; the heavy work
    * (deriving transitions) happened upstream in transitionMatrix's
    * single event shuffle.
    */
  def stationaryDistribution(transitions: DataFrame, iters: Int = 8,
                             checkpoint: Boolean = true): DataFrame = {
    require(iters >= 0 && iters <= 64, s"iters in [0,64], got $iters")
    // materialize the chain ONCE: the upstream transition derivation
    // (an event-grain window) must not re-run per iteration
    val t = graft.util.Lineage.truncate(
      transitions.select(col("state"), col("next_state"),
        col("n_transitions").cast("long").as("n")))
    val tot = graft.util.Lineage.truncate(
      t.groupBy("state").agg(sum("n").as("tot")))
    val states = graft.util.Lineage.truncate(
      t.select(col("state"))
        .unionByName(t.select(col("next_state").as("state"))).distinct())
    var pi = states.select(col("state"), lit(1000000L).as("pi_micro"))
    for (_ <- 0 until iters) {
      val inbound = t.join(pi, Seq("state")).join(tot, Seq("state"))
        .select(col("next_state").as("state"),
          expr("pi_micro * n div tot").as("share"))
        .groupBy("state").agg(sum("share").as("inflow"))
      pi = states
        .join(inbound, Seq("state"), "left")
        .join(tot, Seq("state"), "left")
        .join(pi.withColumnRenamed("pi_micro", "__prev"), Seq("state"), "left")
        .select(col("state"),
          (coalesce(col("inflow"), lit(0L))
            + when(col("tot").isNull, col("__prev")).otherwise(lit(0L)))
            .as("pi_micro"))
      pi = if (checkpoint) graft.util.Lineage.truncate(pi) else pi
    }
    pi
  }

  /** Exact weighted lower quantiles per group: the smallest value
    * whose cumulative weight reaches q·Σw, computed per requested
    * q_ppm. Values are carried through untouched (bit-exact doubles);
    * weights must be integral.
    *
    * Shape at scale: a (group, value) partial aggregation collapses
    * duplicate values BEFORE the cumulative window, so the window runs
    * over distinct values per group (partitioned by group — no global
    * window), and the tiny quantile list joins via broadcast. The
    * threshold test `cum_w·10⁶ ≥ q_ppm·tot_w` is all-BIGINT.
    */
  def weightedQuantiles(df: DataFrame, groupCol: String, valueCol: String,
                        weightCol: Column, qPpm: Seq[Long]): DataFrame = {
    val byVal = df
      .groupBy(col(groupCol).as("grp"), col(valueCol).as("value"))
      .agg(sum(weightCol.cast("long")).as("w"))
    val grp = Window.partitionBy("grp")
    val cum = byVal
      .withColumn("cum_w", sum("w").over(grp.orderBy("value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("tot_w", sum("w").over(grp))
    val quants = df.sparkSession.createDataFrame(
      qPpm.map(java.lang.Long.valueOf).map(Tuple1(_))).toDF("q_ppm")
    cum.join(broadcast(quants),
        col("cum_w") * lit(1000000L) >= col("q_ppm") * col("tot_w"))
      .groupBy(col("grp").as(groupCol), col("q_ppm"))
      .agg(min("value").as("value"), min("tot_w").as("total_weight"))
  }

  /** Theil–Sen robust trend per key: the LOWER MEDIAN of all pairwise
    * slopes (y₂−y₁)/(x₂−x₁) over a per-key series — the slope
    * estimator that shrugs off outliers OLS ([[linReg]]) chases.
    * Slopes quantize to micro units (one IEEE multiply + divide over
    * exact integer deltas); the median picks the value at 1-based
    * rank ⌊(n+1)/2⌋, so ties and layout cannot flap it.
    *
    * Shape at scale: the pair self-join is keyed (one shuffle on the
    * key) and the per-key series MUST be bounded (a windowed daily
    * aggregate, not raw events) — cost is O(L²) pairs per key by
    * definition of the estimator, which is the documented trade for
    * its 29.3% breakdown point. Median rank runs in ONE window
    * partitioned by key.
    */
  def theilSen(df: DataFrame, keyCol: String, xCol: Column, yCol: Column)
      : DataFrame = {
    val pts = df.select(col(keyCol).as("k"),
      xCol.cast("long").as("x"), yCol.cast("long").as("y"))
    val a = pts.select(col("k"), col("x").as("x1"), col("y").as("y1"))
    val b = pts.select(col("k"), col("x").as("x2"), col("y").as("y2"))
    val slopes = a.join(b, Seq("k")).filter(col("x2") > col("x1"))
      .select(col("k"),
        round((col("y2") - col("y1")).cast("double") * 1e6
          / (col("x2") - col("x1")).cast("double"))
          .cast("long").as("slope_micro"))
    val w = Window.partitionBy("k")
    slopes
      .withColumn("rn", row_number().over(w.orderBy("slope_micro")))
      .withColumn("n_pairs", count(lit(1)).over(w))
      .filter(col("rn") === expr("(n_pairs + 1) DIV 2"))
      .select(col("k").as(keyCol), col("n_pairs"), col("slope_micro"))
  }

  /** Top session paths: sessionize per-key event sequences (a gap
    * over `gapMs` starts a new session), take each session's first
    * `k` states in order, and count identical paths — the
    * product-analytics "how do sessions start" table.
    *
    * Shape at scale: ONE shuffle of the event table on the sequence
    * key drives every window (sessionize, intra-session rank — same
    * partitioning, one sort); the path fold is a per-(key, session)
    * partial agg and the final count groups the tiny path table.
    */
  def sessionPaths(df: DataFrame, keyCol: String, tsMsCol: Column,
                   tieCol: Column, stateCol: String, gapMs: Long,
                   k: Int): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(tsMsCol.asc, tieCol.asc)
    val sess = df
      .withColumn("__ms", tsMsCol)
      .withColumn("__prev", lag(tsMsCol, 1).over(w))
      .withColumn("__new",
        when(col("__prev").isNull || (col("__ms") - col("__prev")) > gapMs,
          1L).otherwise(0L))
      .withColumn("__sess", sum(col("__new")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col(keyCol), col("__sess"))
          .orderBy(tsMsCol.asc, tieCol.asc)))
      .filter(col("__rn") <= k)
    sess.groupBy(col(keyCol).as("__k"), col("__sess"))
      .agg(array_join(transform(
        sort_array(collect_list(struct(col("__rn"), col(stateCol).as("s")))),
        x => x("s")), ">").as("path"))
      .groupBy("path").agg(count(lit(1)).as("n_sessions"))
  }

  /** Session basket affinity — the unordered sibling of
    * [[transitionMatrix]]: which states CO-OCCUR in a session (vs
    * which follows which), with support counts and integer lift.
    * lift_ppm = n_ab·S·10⁶ / (n_a·n_b) over session-distinct
    * presence; > 10⁶ means the pair attracts, < 10⁶ repels.
    *
    * Shape at scale: ONE shuffle on the sequence key builds sessions;
    * presence collapses to distinct (session, state) rows; the pair
    * join is keyed on the session id (never all-pairs across
    * sessions); marginals and the session count broadcast onto the
    * |states|² pair table.
    */
  def basketAffinity(df: DataFrame, keyCol: String, tsMsCol: Column,
                     tieCol: Column, stateCol: String, gapMs: Long)
      : DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(tsMsCol.asc, tieCol.asc)
    val sess = df
      .withColumn("__prev", lag(tsMsCol, 1).over(w))
      .withColumn("__new",
        when(col("__prev").isNull || (tsMsCol - col("__prev")) > gapMs, 1L)
          .otherwise(0L))
      .withColumn("__sess", sum(col("__new")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(concat(col(keyCol).cast("string"), lit(":"),
        col("__sess").cast("string")).as("sid"), col(stateCol).as("st"))
      .distinct()
    val nSessions = sess.select("sid").distinct()
      .agg(count(lit(1)).as("n_sessions"))
    val marg = sess.groupBy("st").agg(count(lit(1)).as("n"))
    val pairs = sess.join(sess.withColumnRenamed("st", "st_b"), Seq("sid"))
      .filter(col("st") < col("st_b"))
      .groupBy(col("st").as("state_a"), col("st_b").as("state_b"))
      .agg(count(lit(1)).as("n_ab"))
    pairs
      .join(broadcast(marg.select(col("st").as("state_a"),
        col("n").as("n_a"))), Seq("state_a"))
      .join(broadcast(marg.select(col("st").as("state_b"),
        col("n").as("n_b"))), Seq("state_b"))
      .crossJoin(broadcast(nSessions))
      .select(col("state_a"), col("state_b"), col("n_ab"), col("n_a"),
        col("n_b"),
        expr("n_ab * n_sessions * 1000000 DIV (n_a * n_b)").as("lift_ppm"))
  }

  /** Cohort lifetime value — retention's revenue-weighted sibling:
    * per (cohort week, age week), active users, period value, and
    * the CUMULATIVE value the cohort has produced by that age.
    * Cents-exact BIGINT sums; the cumulative window is PARTITIONED
    * by cohort over the tiny (cohort × age) table; two aggregations
    * total (cohort derivation + per-age fold) sharing one scan.
    */
  def cohortLtv(df: DataFrame, userCol: String, tsCol: String,
                centsCol: String): DataFrame = {
    val cohorts = df.groupBy(col(userCol))
      .agg(date_trunc("week", min(col(tsCol))).as("cohort_week"))
    val perAge = df.join(cohorts, userCol)
      .groupBy(col("cohort_week"),
        (datediff(date_trunc("week", col(tsCol)), col("cohort_week")) / 7)
          .cast("long").as("week_k"))
      .agg(countDistinct(col(userCol)).as("n_active"),
        sum(col(centsCol)).as("value_cents"))
    perAge.withColumn("cum_value_cents",
      sum(col("value_cents")).over(Window.partitionBy(col("cohort_week"))
        .orderBy(col("week_k"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Two-cohort Welch comparison per group — the A/B experimentation
    * readout: exact integer sufficient statistics per (group, cohort)
    * (count, Σy, Σy² in DECIMAL over cent-quantized values), then
    * mean difference and Welch z evaluated in double FROM those exact
    * sums, micro-quantized. Degenerate cohorts (n < 2 or zero
    * combined variance) emit NULL z on both engines.
    *
    * Shape at scale: ONE partial aggregation over the input (cohort
    * is a projection, not a join); the fold runs on |groups|·2 rows.
    */
  def abTest(df: DataFrame, groupCol: String, cohortCol: Column,
             yCol: Column): DataFrame = {
    val y = yCol.cast("decimal(20,0)")
    val sums = df
      .groupBy(col(groupCol).as("grp"), cohortCol.cast("boolean").as("__b"))
      .agg(count(lit(1)).cast("decimal(20,0)").as("n"),
        sum(y).as("sy"), sum(y * y).as("syy"))
    def side(b: Boolean, suffix: String) =
      sums.filter(col("__b") === b).select(col("grp"),
        col("n").as(s"n$suffix"), col("sy").as(s"sy$suffix"),
        col("syy").as(s"syy$suffix"))
    val j = side(false, "a").join(side(true, "b"), Seq("grp"))
      .select(col("grp"),
        col("na").cast("long").as("n_a"), col("nb").cast("long").as("n_b"),
        col("sya").cast("double").as("sa"), col("syb").cast("double").as("sb"),
        col("na").cast("double").as("da"), col("nb").cast("double").as("db"),
        // n·Σy² − (Σy)² stays exact in DECIMAL, casts once
        (col("na") * col("syya") - col("sya") * col("sya"))
          .cast("double").as("vna"),
        (col("nb") * col("syyb") - col("syb") * col("syb"))
          .cast("double").as("vnb"))
    j.select(col("grp").as(groupCol), col("n_a"), col("n_b"),
      round((col("sb") / col("db") - col("sa") / col("da")) * 1e6)
        .cast("long").as("diff_micro"),
      when(col("n_a") < 2L || col("n_b") < 2L ||
           (col("vna") === 0d && col("vnb") === 0d), lit(null))
        .otherwise(round((col("sb") / col("db") - col("sa") / col("da"))
          / sqrt(col("vna") / (col("da") * col("da") * (col("da") - 1d))
               + col("vnb") / (col("db") * col("db") * (col("db") - 1d)))
          * 1e6))
        .cast("long").as("z_micro"))
  }

  /** Grouped ordinary-least-squares fit y ~ x from exact integer
    * inputs (callers quantize: e.g. cents for currency). Power sums
    * accumulate in DECIMAL so Σy² cannot overflow BIGINT at corpus
    * scale; the closed-form slope/intercept/R² then evaluate in double
    * FROM those exact sums, quantized to micro units — deterministic
    * IEEE arithmetic on identical exact inputs, so DuckDB (HUGEINT
    * sums → DOUBLE) replays it bit-for-bit.
    *
    * Shape at scale: one partial aggregation (map-side combine) over
    * the input; zero joins, zero windows.
    */
  def linReg(df: DataFrame, groupCol: String, xCol: Column, yCol: Column)
      : DataFrame = {
    val x = xCol.cast("decimal(20,0)")
    val y = yCol.cast("decimal(20,0)")
    val sums = df.groupBy(col(groupCol).as("grp")).agg(
      count(lit(1)).cast("decimal(20,0)").as("n"),
      sum(x).as("sx"), sum(y).as("sy"),
      sum(x * y).as("sxy"), sum(x * x).as("sxx"), sum(y * y).as("syy"))
    sums.select(col("grp").as(groupCol), col("n").cast("long").as("n_rows"),
        (col("n") * col("sxy") - col("sx") * col("sy"))
          .cast("double").as("num"),
        (col("n") * col("sxx") - col("sx") * col("sx"))
          .cast("double").as("denx"),
        (col("n") * col("syy") - col("sy") * col("sy"))
          .cast("double").as("deny"),
        col("sx").cast("double").as("sxd"), col("sy").cast("double").as("syd"),
        col("n").cast("double").as("nd"))
      .select(col(groupCol), col("n_rows"),
        // constant-x (denx=0) and constant-y (deny=0) groups emit NULL
        // rather than Spark-NaN-vs-DuckDB-NULL divergence
        when(col("denx") === 0d, lit(null))
          .otherwise(round(col("num") / col("denx") * 1e6))
          .cast("long").as("slope_micro"),
        when(col("denx") === 0d, lit(null))
          .otherwise(round((col("syd") - col("num") / col("denx") * col("sxd"))
            / col("nd") * 1e6))
          .cast("long").as("intercept_micro"),
        when(col("denx") === 0d || col("deny") === 0d, lit(null))
          .otherwise(round(col("num") * col("num")
            / (col("denx") * col("deny")) * 1e6))
          .cast("long").as("r2_ppm"))
  }

  /** Kaplan–Meier survival curve with right censoring — the churn
    * table the cohort family (retention/LTV/RFM/stickiness) doesn't
    * carry: per subject, lifetime = periods between first and last
    * activity; a subject still active inside `churnGapDays` of the
    * stream horizon is CENSORED (its lifetime is a lower bound, and
    * KM is exactly the estimator that uses that partial information
    * instead of dropping or miscounting it — the naive "churn rate by
    * tenure" table treats censored users as churned and biases every
    * recent cohort down).
    *
    * Output per lifetime period t: n_risk (subjects with lifetime
    * ≥ t — the KM risk set), n_events (observed churns at t),
    * n_censored (censored at t), haz_ln_micro =
    * round(ln((n_risk−d)/n_risk)·10⁶) (NULL when the risk set dies
    * out entirely — ln 0), and surv_ln_micro = Σ_{u≤t} haz (NULL from
    * the first dead point on: SQL's SUM skips NULLs, which would
    * silently resurrect the curve — the poison flag keeps the
    * undefined tail undefined). S(t) = exp(surv_ln_micro/1e6); the
    * ln-quantized form is the cross-engine-exact one (the
    * tokenDrift micro-nat convention: each term is ONE IEEE division
    * of exact longs and one ln, rounded per-row, then integer-summed).
    *
    * Scale shape: one partial-agg per subject (first/last), a 1-row
    * broadcast horizon, one partial-agg per lifetime period, then
    * windows over the ≤ (span/period) period rows — bounded by the
    * calendar, not the data (the dedup_threshold_curve class), so the
    * partition-less windows are over a provably tiny relation.
    */
  /** CUPED-adjusted cohort comparison per group (Deng, Xu, Kohavi &
    * Walker, WSDM'13 — Controlled-experiment Using Pre-Experiment
    * Data) — the variance-reduction standard every large
    * experimentation platform runs: a user's PRE-period behavior
    * predicts their post-period metric, so subtracting
    * θ·(x − x̄) from each user's y removes the predictable
    * between-user variance (θ = pooled cov(x,y)/var(x), the OLS
    * slope), shrinking the standard error by the factor √(1−ρ²)
    * without biasing the treatment contrast — the same experiment
    * detects effects ~1/√(1−ρ²) smaller, or needs proportionally
    * fewer users.
    *
    * Input is USER-grain (one row per (group, user): cohort flag,
    * exact pre-metric x, exact post-metric y — the caller aggregates
    * raw events to users first, which is also where the cents
    * quantization happens). θ is pooled across both cohorts (the
    * published estimator — computing it per cohort would re-introduce
    * a bias term); adjusted means and the per-cohort adjusted
    * variance s²_y − 2θ·s_xy + θ²·s²_x come from the same exact
    * DECIMAL moment set (n, Σx, Σy, Σxy, Σx², Σy² per cohort — ONE
    * conditional partial aggregation), evaluated in double with the
    * identical expression on both engines. Degenerate groups (a
    * cohort with n < 2, or pooled var(x) = 0 → θ undefined) emit
    * NULL z; θ itself is published micro-quantized for auditability.
    *
    * Scale shape: one partial aggregation over the user-grain input
    * to |groups|·2 cells; zero joins, zero windows (the user-grain
    * derivation upstream is the caller's one groupBy).
    */
  def cuped(df: DataFrame, groupCol: String, cohortCol: Column,
            xCol: Column, yCol: Column): DataFrame = {
    val x = xCol.cast("decimal(20,0)")
    val y = yCol.cast("decimal(20,0)")
    val b = cohortCol.cast("boolean")
    def cell(c: Boolean, sfx: String) = Seq(
      sum(when(b === c, lit(1L)).otherwise(0L)).cast("decimal(20,0)")
        .as(s"n$sfx"),
      sum(when(b === c, x).otherwise(lit(0L).cast("decimal(20,0)")))
        .as(s"sx$sfx"),
      sum(when(b === c, y).otherwise(lit(0L).cast("decimal(20,0)")))
        .as(s"sy$sfx"),
      sum(when(b === c, x * y).otherwise(lit(0L).cast("decimal(20,0)")))
        .as(s"sxy$sfx"),
      sum(when(b === c, x * x).otherwise(lit(0L).cast("decimal(20,0)")))
        .as(s"sxx$sfx"),
      sum(when(b === c, y * y).otherwise(lit(0L).cast("decimal(20,0)")))
        .as(s"syy$sfx"))
    val aggs = cell(false, "a") ++ cell(true, "b")
    val sums = df.groupBy(col(groupCol).as("grp"))
      .agg(aggs.head, aggs.tail: _*)
    // pooled θ numera/denominator stay EXACT in DECIMAL before the cast
    val n = (col("na") + col("nb"))
    val sx = (col("sxa") + col("sxb")); val sy = (col("sya") + col("syb"))
    val sxy = (col("sxya") + col("sxyb"))
    val sxx = (col("sxxa") + col("sxxb"))
    val thNum = (n * sxy - sx * sy).cast("double")
    val thDen = (n * sxx - sx * sx).cast("double")
    def d(c: Column) = c.cast("double")
    val theta = thNum / thDen
    def meanAdj(sfx: String) =
      d(col(s"sy$sfx")) / d(col(s"n$sfx")) -
        theta * (d(col(s"sx$sfx")) / d(col(s"n$sfx")))
    // per-cohort adjusted variance of the MEAN:
    // (Syy − 2θ·Sxy + θ²·Sxx) / (n·(n−1)) with S.. the centered
    // cross-moments n·Σab − Σa·Σb, over n² to normalize
    def varAdj(sfx: String) = {
      val nn = col(s"n$sfx")
      val cyy = (nn * col(s"syy$sfx") - col(s"sy$sfx") * col(s"sy$sfx"))
      val cxy = (nn * col(s"sxy$sfx") - col(s"sx$sfx") * col(s"sy$sfx"))
      val cxx = (nn * col(s"sxx$sfx") - col(s"sx$sfx") * col(s"sx$sfx"))
      (d(cyy) - lit(2d) * theta * d(cxy) + theta * theta * d(cxx)) /
        (d(nn) * d(nn) * (d(nn) - lit(1d)))
    }
    val diff = meanAdj("b") - meanAdj("a")
    sums.select(col("grp").as(groupCol),
      col("na").cast("long").as("n_a"), col("nb").cast("long").as("n_b"),
      when(col("na") < 2L || col("nb") < 2L || thDen === 0d, lit(null))
        .otherwise(round(theta * 1e6)).cast("long").as("theta_micro"),
      when(col("na") < 2L || col("nb") < 2L || thDen === 0d, lit(null))
        .otherwise(round(diff * 1e6)).cast("long").as("diff_adj_micro"),
      when(col("na") < 2L || col("nb") < 2L || thDen === 0d, lit(null))
        .otherwise(round(diff / sqrt(varAdj("a") + varAdj("b")) * 1e6))
        .cast("long").as("z_micro"))
  }

  /** Minimum detectable effect per group — the PLANNING readout of
    * the test family: before an experiment runs (or when one "came
    * back flat"), what mean shift COULD these cohort sizes and this
    * variance have detected at α = 0.05 two-sided with 80% power?
    *   MDE = (z_{0.975} + z_{0.80}) · √(s²_a/n_a + s²_b/n_b)
    * — a flat result with an MDE of 40% of the mean is "the test was
    * underpowered", not "there is no effect"; the rel_mde_ppm column
    * (MDE / pooled mean) is exactly that honesty number.
    *
    * The [[abTest]] exactness discipline: exact DECIMAL sufficient
    * statistics in ONE conditional partial aggregation; z quantiles
    * as shared literals (1.9599639845400545, 0.8416212335729143);
    * the MDE evaluates in double from exact sums, micro-quantized,
    * identical expression both engines. Cohorts with n < 2 (no
    * variance estimate) or a zero pooled mean (no relative scale)
    * emit NULL in the affected columns.
    */
  def mde(df: DataFrame, groupCol: String, cohortCol: Column,
          yCol: Column): DataFrame = {
    val y = yCol.cast("decimal(20,0)")
    val b = cohortCol.cast("boolean")
    def cell(c: Boolean, sfx: String) = Seq(
      sum(when(b === c, lit(1L)).otherwise(0L)).cast("decimal(20,0)")
        .as(s"n$sfx"),
      sum(when(b === c, y).otherwise(lit(0L).cast("decimal(20,0)")))
        .as(s"sy$sfx"),
      sum(when(b === c, y * y).otherwise(lit(0L).cast("decimal(20,0)")))
        .as(s"syy$sfx"))
    val aggs = cell(false, "a") ++ cell(true, "b")
    val sums = df.groupBy(col(groupCol).as("grp"))
      .agg(aggs.head, aggs.tail: _*)
    // per-cell sample variance (n·Σy² − (Σy)²) / (n·(n−1)), exact
    // numerator, and variance of the mean = that / n
    def varMeanD(sfx: String) =
      (col(s"n$sfx") * col(s"syy$sfx") - col(s"sy$sfx") * col(s"sy$sfx"))
        .cast("double") /
        (col(s"n$sfx").cast("double") * col(s"n$sfx").cast("double")
          * (col(s"n$sfx").cast("double") - 1d))
    val z = lit(1.9599639845400545d) + lit(0.8416212335729143d)
    val mdeD = z * sqrt(varMeanD("a") + varMeanD("b"))
    val meanPooled = (col("sya") + col("syb")).cast("double") /
      (col("na") + col("nb")).cast("double")
    sums.select(col("grp").as(groupCol),
      col("na").cast("long").as("n_a"), col("nb").cast("long").as("n_b"),
      when(col("na") < 2L || col("nb") < 2L, lit(null))
        .otherwise(round(mdeD * 1e6)).cast("long").as("mde_micro"),
      when(col("na") < 2L || col("nb") < 2L ||
           (col("sya") + col("syb")) === 0L, lit(null))
        .otherwise(round(mdeD / meanPooled * 1e6)).cast("long")
        .as("rel_mde_ppm"))
  }

  /** Two-sample Kolmogorov–Smirnov test per group — the DISTRIBUTION-
    * level member of the test family: [[abTest]] compares means,
    * [[mannWhitney]] stochastic dominance; KS flags ANY distributional
    * difference (a variance change, a new mode, a truncated tail)
    * through the maximum ECDF gap D = sup|F_a − F_b|, with the
    * classic large-sample critical value c(α)·√((n_a+n_b)/(n_a·n_b)),
    * c(0.05) = 1.358 (Smirnov's asymptotic).
    *
    * Exactness: D is found by EXACT cross-multiplied integers —
    * max|cumA·n_b − cumB·n_a| over the (group, value) grain (DECIMAL:
    * the product is n_a·n_b-scaled) — so the argmax never touches a
    * float; d_ppm = that max ·10⁶ div (n_a·n_b), and the reject
    * compares the exact numerator against the critical value computed
    * in double from exact counts with the identical expression on
    * both engines. One-sided-empty groups emit NULLs.
    *
    * Scale shape: [[mannWhitney]]'s — one partial agg to (group,
    * value) grain, one GROUP-partitioned cumulative window over that
    * grain, one partial-agg max fold. Zero joins.
    */
  def ksTest(df: DataFrame, groupCol: String, cohortCol: Column,
             yCol: Column): DataFrame = {
    val vals = df
      .groupBy(col(groupCol).as("grp"), yCol.cast("long").as("v"))
      .agg(sum(when(cohortCol.cast("boolean"), 0L).otherwise(1L)).as("ca"),
        sum(when(cohortCol.cast("boolean"), 1L).otherwise(0L)).as("cb"))
    val w = Window.partitionBy(col("grp")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wg = Window.partitionBy(col("grp"))
    val cum = vals
      .withColumn("cuma", sum(col("ca")).over(w))
      .withColumn("cumb", sum(col("cb")).over(w))
      .withColumn("na", sum(col("ca")).over(wg))
      .withColumn("nb", sum(col("cb")).over(wg))
    val g = cum.groupBy("grp").agg(
      max(col("na")).as("n_a"), max(col("nb")).as("n_b"),
      max(abs(col("cuma").cast("decimal(38,0)") * col("nb")
        - col("cumb").cast("decimal(38,0)") * col("na"))).as("dnum"))
    g.select(col("grp").as(groupCol), col("n_a"), col("n_b"),
        col("dnum"))
      .select(col(groupCol), col("n_a"), col("n_b"),
        when(col("n_a") === 0L || col("n_b") === 0L, lit(null))
          // integral div, never decimal true-division (whose scale
          // rounding could flip a floor at the boundary)
          .otherwise(expr(
            "(dnum * 1000000L) div (cast(n_a as decimal(38,0)) * n_b)"))
          .as("d_ppm"),
        when(col("n_a") === 0L || col("n_b") === 0L, lit(null))
          .otherwise(round(lit(1.358d)
            * sqrt((col("n_a") + col("n_b")).cast("double")
              / (col("n_a").cast("double") * col("n_b").cast("double")))
            * 1e6)).cast("long").as("crit_ppm"),
        when(col("n_a") === 0L || col("n_b") === 0L, lit(null))
          .otherwise((col("dnum").cast("double")
            / (col("n_a").cast("double") * col("n_b").cast("double"))
            > lit(1.358d)
              * sqrt((col("n_a") + col("n_b")).cast("double")
                / (col("n_a").cast("double") * col("n_b").cast("double"))))
            .cast("int")).as("reject"))
  }

  /** Difference-in-differences per group — the experimentation readout
    * when assignment isn't random: a raw post-period comparison
    * conflates the treatment with whatever else changed at the
    * boundary (seasonality, a deploy, a price change); DiD subtracts
    * the CONTROL group's pre→post drift from the treatment group's,
    * so any shock common to both cohorts cancels and only the
    * treatment-specific shift remains. Estimate =
    * (ȳ_post,T − ȳ_pre,T) − (ȳ_post,C − ȳ_pre,C); z from the
    * four-cell Welch variance Σ s²ᵢ/nᵢ of the cell means.
    *
    * The [[abTest]] exactness discipline: one partial aggregation
    * computes exact DECIMAL sufficient statistics (n, Σy, Σy²) for
    * all four (cohort × period) cells via conditional aggregation —
    * no joins, no pivot shuffle — then the estimate and z evaluate
    * in double FROM those exact sums, micro-quantized; DuckDB
    * replays bit-for-bit. Any cell with n < 2 (or all four variances
    * zero) emits NULL z; a group missing a cell entirely emits NULL
    * did too (no arm to difference).
    */
  def didTest(df: DataFrame, groupCol: String, cohortCol: Column,
              postCol: Column, yCol: Column): DataFrame = {
    val y = yCol.cast("decimal(20,0)")
    def cell(c: Boolean, p: Boolean, suffix: String) = {
      val in = cohortCol.cast("boolean") === c && postCol.cast("boolean") === p
      Seq(
        sum(when(in, lit(1L)).otherwise(0L)).cast("decimal(20,0)")
          .as(s"n$suffix"),
        sum(when(in, y).otherwise(lit(0L).cast("decimal(20,0)")))
          .as(s"sy$suffix"),
        sum(when(in, y * y).otherwise(lit(0L).cast("decimal(20,0)")))
          .as(s"syy$suffix"))
    }
    val aggs = cell(false, false, "_cpre") ++ cell(false, true, "_cpost") ++
      cell(true, false, "_tpre") ++ cell(true, true, "_tpost")
    val sums = df.groupBy(col(groupCol).as("grp"))
      .agg(aggs.head, aggs.tail: _*)
    def mean(sfx: String) =
      col(s"sy$sfx").cast("double") / col(s"n$sfx").cast("double")
    // per-cell variance of the MEAN: (n·Σy² − (Σy)²) / (n²·(n−1)),
    // numerator exact in DECIMAL before the one cast
    def varMean(sfx: String) =
      (col(s"n$sfx") * col(s"syy$sfx") - col(s"sy$sfx") * col(s"sy$sfx"))
        .cast("double") /
        (col(s"n$sfx").cast("double") * col(s"n$sfx").cast("double")
          * (col(s"n$sfx").cast("double") - 1d))
    def vnum(sfx: String) =
      (col(s"n$sfx") * col(s"syy$sfx") - col(s"sy$sfx") * col(s"sy$sfx"))
    val anyEmpty = Seq("_cpre", "_cpost", "_tpre", "_tpost")
      .map(sfx => col(s"n$sfx") === 0L).reduce(_ || _)
    val anySmall = Seq("_cpre", "_cpost", "_tpre", "_tpost")
      .map(sfx => col(s"n$sfx") < 2L).reduce(_ || _)
    val allFlat = Seq("_cpre", "_cpost", "_tpre", "_tpost")
      .map(sfx => vnum(sfx) === 0L).reduce(_ && _)
    val did = (mean("_tpost") - mean("_tpre")) -
      (mean("_cpost") - mean("_cpre"))
    val se = sqrt(varMean("_tpost") + varMean("_tpre")
      + varMean("_cpost") + varMean("_cpre"))
    sums.select(col("grp").as(groupCol),
      col("n_cpre").cast("long").as("n_ctrl_pre"),
      col("n_cpost").cast("long").as("n_ctrl_post"),
      col("n_tpre").cast("long").as("n_treat_pre"),
      col("n_tpost").cast("long").as("n_treat_post"),
      when(anyEmpty, lit(null))
        .otherwise(round(did * 1e6)).cast("long").as("did_micro"),
      when(anySmall || allFlat, lit(null))
        .otherwise(round(did / se * 1e6)).cast("long").as("z_micro"))
  }

  /** Benjamini–Hochberg FDR control over a battery of test statistics
    * — the missing step between "500 segment-level z-scores" and
    * "which effects are real": testing many segments at fixed α
    * guarantees false discoveries in proportion to the battery size,
    * while BH rejects the k* smallest p-values where k* = max{k :
    * p_(k) ≤ k·α/m}, bounding the EXPECTED false-discovery RATE at α
    * (Benjamini & Hochberg, JRSS-B 1995). Input is (hypothesis id,
    * z_micro) — exactly the [[abTest]]/[[mannWhitney]] output shape;
    * NULL z rows (degenerate tests) are excluded from the battery and
    * from m.
    *
    * Two-sided p from |z| via the Abramowitz–Stegun 26.2.17 rational
    * approximation (max abs error 7.5e-8 — far inside micro
    * quantization; both engines evaluate the identical expression,
    * with √(2π) a shared literal), then micro-QUANTIZED before any BH
    * comparison: the reject decision is exact integer arithmetic
    * (p_micro·m ≤ k·α_micro), never a sub-micro ulp race. Rank ties
    * break by id, so the ordering is total and replayable.
    *
    * Scale shape: the battery is SEGMENT-grain (bounded by group
    * cardinality, not data rows), so the rank window over it is the
    * dedup_threshold_curve tiny-relation class; everything else is
    * one partial agg and two 1-row broadcast folds (m, k*).
    */
  def bhFdr(df: DataFrame, idCol: String, zMicroCol: Column,
            alphaMicro: Long = 50000L): DataFrame = {
    require(alphaMicro > 0 && alphaMicro < 1000000L,
      s"alphaMicro must be in (0, 1e6), got $alphaMicro")
    val az = abs(zMicroCol.cast("double") / lit(1e6))
    val t = lit(1d) / (lit(1d) + lit(0.2316419d) * az)
    val poly = t * (lit(0.319381530d) + t * (lit(-0.356563782d)
      + t * (lit(1.781477937d) + t * (lit(-1.821255978d)
      + t * lit(1.330274429d)))))
    val pdf = exp(lit(-0.5d) * az * az) / lit(2.5066282746310002d)
    val scored = df.filter(zMicroCol.isNotNull)
      .select(col(idCol).as("id"), zMicroCol.cast("long").as("z_micro"),
        round(lit(2d) * pdf * poly * 1e6).cast("long").as("p_micro"))
    val w = Window.orderBy(col("p_micro"), col("id"))
    val ranked = scored
      .withColumn("k", row_number().over(w).cast("long"))
      .crossJoin(broadcast(scored.agg(count(lit(1)).as("m"))))
    val kStar = ranked
      .filter(col("p_micro") * col("m") <= col("k") * lit(alphaMicro))
      .agg(coalesce(max(col("k")), lit(0L)).as("k_star"))
    ranked.crossJoin(broadcast(kStar))
      .select(col("id").as(idCol), col("z_micro"), col("p_micro"),
        col("k"), col("m"), (col("k") <= col("k_star")).as("reject"))
  }

  /** Mann–Whitney U rank-sum test per group — [[abTest]]'s
    * NONPARAMETRIC sibling: Welch's z compares means and is blind to
    * a heavy-tailed metric whose mean is dominated by whales; the
    * rank-sum asks "does a random treatment draw beat a random
    * control draw more than half the time", the robust readout for
    * revenue-like metrics. Midranks handle ties (the discrete/
    * quantized-metric reality), the normal approximation carries the
    * standard tie correction.
    *
    * All-integer rank arithmetic: per (group, value) cohort counts,
    * 2×midrank = 2·|{rows < v}| + t(v) + 1 stays in BIGINT (no .5s),
    * `u2_b = 2·U_B` likewise; tie cubes accumulate in DECIMAL (a
    * 3M-row tie already overflows BIGINT at t³). The z evaluates in
    * double FROM those exact integers — same expression shape on
    * both engines, so DuckDB replays it bit-for-bit (the linReg/
    * abTest convention). Degenerate groups (an empty cohort, or all
    * rows one tied value → zero variance) emit NULL z.
    *
    * Scale shape: ONE partial aggregation to (group, value) grain,
    * one GROUP-PARTITIONED cumulative window over that grain (never
    * partition-less; value-grain rows per group bound the partition,
    * and a quantized metric keeps that grain far below row count),
    * one partial-agg fold to |groups| rows. Zero joins.
    */
  def mannWhitney(df: DataFrame, groupCol: String, cohortCol: Column,
                  yCol: Column): DataFrame = {
    val vals = df
      .groupBy(col(groupCol).as("grp"), yCol.cast("long").as("v"))
      .agg(sum(when(cohortCol.cast("boolean"), 0L).otherwise(1L)).as("ca"),
        sum(when(cohortCol.cast("boolean"), 1L).otherwise(0L)).as("cb"))
    val w = Window.partitionBy(col("grp")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = vals
      .withColumn("__before", coalesce(sum(col("ca") + col("cb")).over(w),
        lit(0L)))
      .withColumn("__rank2",
        lit(2L) * col("__before") + col("ca") + col("cb") + lit(1L))
    val g = ranked.groupBy("grp").agg(
      sum("ca").as("n_a"), sum("cb").as("n_b"),
      // rank-sum in DECIMAL: Σ cb·rank2 ~ N² exceeds BIGINT at
      // trillion-row groups; the cubes likewise
      sum(col("cb").cast("decimal(38,0)") * col("__rank2")).as("rs2"),
      sum(((col("ca") + col("cb")).cast("decimal(38,0)")
        * (col("ca") + col("cb")) * (col("ca") + col("cb")))
        - (col("ca") + col("cb"))).as("ties"))
    g.select(col("grp").as(groupCol), col("n_a"), col("n_b"),
        (col("rs2") - col("n_b") * (col("n_b") + 1L))
          .cast("long").as("u2_b"),
        col("n_a").cast("double").as("da"),
        col("n_b").cast("double").as("db"),
        (col("n_a") + col("n_b")).cast("double").as("dn"),
        col("ties").cast("double").as("dt"))
      .select(col(groupCol), col("n_a"), col("n_b"), col("u2_b"),
        when(col("n_a") === 0L || col("n_b") === 0L ||
             (col("dn") + 1d) - col("dt") / (col("dn") * (col("dn") - 1d))
               <= 0d, lit(null))
          .otherwise(round(
            ((col("u2_b").cast("double") - col("da") * col("db")) / 2d)
              / sqrt(col("da") * col("db") / 12d
                * ((col("dn") + 1d)
                  - col("dt") / (col("dn") * (col("dn") - 1d))))
            * 1e6))
          .cast("long").as("z_micro"))
  }

  def kaplanMeier(df: DataFrame, idCol: String, tsCol: Column,
                  periodDays: Int = 30, churnGapDays: Int = 60): DataFrame = {
    require(periodDays >= 1, s"periodDays must be >= 1, got $periodDays")
    require(churnGapDays >= 0, s"churnGapDays must be >= 0, got $churnGapDays")
    val spans = df.groupBy(col(idCol))
      .agg(min(tsCol.cast("date")).as("f"), max(tsCol.cast("date")).as("l"))
    val horizon = spans.agg(max(col("l")).as("horizon"))
    val lives = spans.crossJoin(broadcast(horizon))
      .select(
        expr(s"cast(datediff(l, f) as bigint) div $periodDays").as("t"),
        when(datediff(col("horizon"), col("l")) > churnGapDays, lit(1L))
          .otherwise(lit(0L)).as("ev"))
    val perT = lives.groupBy(col("t"))
      .agg(sum(col("ev")).as("n_events"),
        sum(lit(1L) - col("ev")).as("n_censored"))
    // the period table is calendar-bounded (≤ span/period rows):
    // partition-less windows here are the whitelisted tiny-relation
    // class, never a corpus-sized funnel
    val wRisk = Window.orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wCum = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perT
      .withColumn("n_risk",
        sum(col("n_events") + col("n_censored")).over(wRisk))
      .withColumn("haz_ln_micro",
        when(col("n_risk") > col("n_events"),
          round(log((col("n_risk") - col("n_events")) / col("n_risk"))
            * 1e6).cast("long")))
      .withColumn("__poison",
        max(when(col("haz_ln_micro").isNull, 1L).otherwise(0L)).over(wCum))
      .withColumn("surv_ln_micro",
        when(col("__poison") > 0, lit(null))
          .otherwise(sum(col("haz_ln_micro")).over(wCum)).cast("long"))
      .select(col("t"), col("n_risk"), col("n_events"), col("n_censored"),
        col("haz_ln_micro"), col("surv_ln_micro"))
  }

  /** Conversion-latency table — the TIME dimension [[q_funnel]]'s
    * step-count view drops: per subject, first `fromType` event →
    * first `toType` event AT OR AFTER it; per signup-cohort week the
    * conversion rate (floor-ppm) and the LOWER weighted latency
    * quantiles in minutes (via [[weightedQuantiles]] — actual data
    * values selected by integer comparison, never interpolation).
    * Unconverted subjects stay in the denominator (the censoring
    * lesson without the estimator: rate + quantiles-of-converted is
    * the honest pair; a mean-latency-of-converted alone is survivor-
    * biased). Cohorts with zero conversions keep one row with NULL
    * quantile columns rather than vanishing.
    *
    * Scale shape: two subject-keyed partial aggs + one subject-keyed
    * join (first-from, then first-to-after), one cohort partial agg,
    * and the quantile windows partitioned by cohort over distinct
    * latency values. p_ppm arithmetic integer-exact end to end.
    */
  def timeToConvert(df: DataFrame, userCol: String, tsCol: Column,
                    typeCol: Column, fromType: String, toType: String,
                    qPpm: Seq[Long]): DataFrame = {
    require(qPpm.nonEmpty, "need at least one quantile")
    val firsts = df.filter(typeCol === fromType && tsCol.isNotNull)
      .groupBy(col(userCol).as("__u")).agg(min(tsCol).as("f_ts"))
    val convs = df.filter(typeCol === toType && tsCol.isNotNull)
      .select(col(userCol).as("__u"), tsCol.as("__cts"))
      .join(firsts, "__u")
      .filter(col("__cts") >= col("f_ts"))
      .groupBy(col("__u")).agg(min(col("__cts")).as("c_ts"))
    val users = firsts.join(convs, Seq("__u"), "left")
      .select(date_trunc("week", col("f_ts")).as("cohort_week"),
        expr("cast((unix_millis(c_ts) - unix_millis(f_ts)) div 60000 as bigint)")
          .as("lat_min"))
    val g = users.groupBy(col("cohort_week"))
      .agg(count(lit(1)).as("n_signups"),
        count(col("lat_min")).as("n_converted"))
      .withColumn("convert_ppm",
        expr("n_converted * 1000000 div n_signups"))
    val q = weightedQuantiles(
      users.filter(col("lat_min").isNotNull), "cohort_week", "lat_min",
      lit(1L), qPpm)
      .select(col("cohort_week").as("__qw"), col("q_ppm"),
        col("value").as("latency_min"))
    g.join(q, col("cohort_week") === col("__qw"), "left")
      .select(col("cohort_week"), col("n_signups"), col("n_converted"),
        col("convert_ppm"), col("q_ppm"), col("latency_min"))
  }
}
