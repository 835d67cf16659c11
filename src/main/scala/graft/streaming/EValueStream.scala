package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming ALWAYS-VALID two-sample experiment monitor — the
  * sequential member the batch experimentation family (q_ab_test /
  * q_did / q_cuped) cannot provide: those are one-shot tests whose
  * p-values are only valid at a pre-committed sample size, so
  * WATCHING an experiment live and stopping on a significant reading
  * is the classic peeking problem (the more you look, the more false
  * positives you harvest). Two statistics, picked by `mode`, and the
  * guarantee each one actually carries — stated up front because the
  * null "both arms share a rate" is COMPOSITE and the two modes pin
  * it down differently:
  *
  *  - `mode = "mixture"` (default): the Beta–Binomial mixture Bayes
  *    factor over the CUMULATIVE counts. It is a test martingale —
  *    so by Ville's inequality the probability it EVER crosses 1/α
  *    is at most α under any peeking/stopping rule — for the
  *    uniform-MIXTURE marginal of the shared-rate null, NOT
  *    uniformly over every fixed shared rate p (Robbins'
  *    confidence-sequence lineage; the mixture-SPRT family of
  *    Johari et al., KDD 2017). The worst fixed-p inflation is
  *    small and vanishes with n (the spec's no-effect replay holds
  *    it to zero alarms at 40 batches × 250 rows), but the α bound a
  *    reader should quote for this mode is the mixture-null one.
  *  - `mode = "conditional"`: per-batch totals-CONDITIONED
  *    (Fisher-style) block factors, multiplied. Each batch's 2×2
  *    table contributes E_b = Q(cs_b | totals_b) / Hyp(cs_b |
  *    totals_b), where Hyp is the hypergeometric law of the control
  *    successes given the block's margins — EXACTLY the conditional
  *    null law for EVERY fixed shared rate p, which cancels p — and
  *    Q is the per-arm Beta-Binomial predictive LEARNED from the
  *    pre-batch cumulative counts, conditioned on the same margins
  *    (predictable, so validity never depends on the learning;
  *    learning only buys power). E[E_b | past] = 1 under every
  *    fixed p, so the running product is an e-process UNIFORMLY
  *    over the composite null at batch granularity (the
  *    safe-2×2-tables construction of Turner, Ly & Grünwald, 2021).
  *    The price: conditioning discards the between-batch margin
  *    information, so it needs somewhat more data than the mixture
  *    at the same shift.
  *
  * In both modes the alarm fires when log E ≥ ln(10⁶/αppm) once both
  * arms have `minPerArm` trials (honest cold start — a 0-vs-1 fluke
  * should not page anyone). The mixture factor over exact counts —
  * control (cn trials, cs successes) and treatment (tn, ts) —
  *
  *   log E = lB(cs+1, cf+1) + lB(ts+1, tf+1) − lB(cs+ts+1, cf+tf+1)
  *
  * with lB the log-Beta function and f = trials − successes — is the
  * marginal likelihood of "two independent uniform-prior conversion
  * rates" against "one shared uniform-prior rate" (binomial
  * coefficients cancel). The STATE is exact integers in both modes;
  * only the alarm arithmetic differs (conditional mode accumulates
  * its block factors as floored micro-nats — flooring only ever
  * UNDER-states the e-process, so the α bound survives the
  * quantization).
  *
  * State is one row per experiment key — (k, cn, cs, tn, ts, lec,
  * rows_seen, n_alarms), with `lec` the conditional mode's
  * accumulated block log-e in micro-nats (always 0 in mixture mode,
  * whose statistic is a pure function of the counts) — exact
  * lifetime integers, bounded by |keys|;
  * an alarm RESETS the four counts (re-arm, the Page–Hinkley
  * contract) so one true shift raises one alarm and detection
  * restarts against post-shift traffic, while rows_seen/n_alarms
  * keep the audit trail. Versioning is the exclude-own-writes
  * discipline (QuantileStream/PageHinkleyStream): `stateDir/
  * batch=<id>` holds state AFTER batch id, a trigger reads the
  * newest version `< batchId`, report writes before state, old
  * versions pruned — an at-least-once replay rebuilds byte-identical
  * reports from byte-identical integer state.
  *
  * Scale shape per trigger: one partial-agg groupBy of the batch to
  * (key, arm) counts, one |keys|-row full-outer fold against prior
  * state, the log-Beta arithmetic per KEY row (StrictMath — platform-
  * pinned bits); nothing corpus-sized shuffles or broadcasts.
  */
object EValueStream {

  private val KEEP_VERSIONS = 4

  private def priorState(spark: SparkSession, stateDir: String,
                         batchId: Long): Option[DataFrame] = {
    val f = graft.util.Fs.fs(spark, stateDir)
    val root = new Path(stateDir)
    if (!f.exists(root)) None
    else f.listStatus(root).map(_.getPath.getName)
      .filter(_.startsWith("batch="))
      .map(_.stripPrefix("batch=").toLong)
      .filter(_ < batchId)
      .sorted.lastOption
      .map(v => spark.read.parquet(s"$stateDir/batch=$v"))
  }

  /** Deterministic log-gamma: Lanczos approximation (g = 7, the
    * 9-coefficient set published in Numerical Recipes / Boost),
    * StrictMath throughout so every JVM and platform replays
    * bit-identical doubles (Math.log may differ across platforms;
    * StrictMath may not). Accurate to ~1e-13 relative for x ≥ 0.5 —
    * counts enter as n+1 ≥ 1, so the reflection branch is never hit.
    */
  private[graft] def lgamma(x: Double): Double = {
    require(x >= 0.5, s"lgamma domain here is x >= 0.5, got $x")
    val g = Array(
      0.99999999999980993, 676.5203681218851, -1259.1392167224028,
      771.32342877765313, -176.61502916214059, 12.507343278686905,
      -0.13857109526572012, 9.9843695780195716e-6, 1.5056327351493116e-7)
    val z = x - 1.0
    var a = g(0)
    var i = 1
    while (i < 9) { a += g(i) / (z + i); i += 1 }
    val t = z + 7.5
    0.5 * StrictMath.log(2.0 * StrictMath.PI) +
      (z + 0.5) * StrictMath.log(t) - t + StrictMath.log(a)
  }

  private def lbeta(a: Double, b: Double): Double =
    lgamma(a) + lgamma(b) - lgamma(a + b)

  /** log Bayes factor of independent-rates over shared-rate for exact
    * conversion counts (uniform priors; coefficients cancel). */
  private[graft] def logBf(cs: Long, cf: Long, ts: Long, tf: Long): Double =
    lbeta(cs + 1.0, cf + 1.0) + lbeta(ts + 1.0, tf + 1.0) -
      lbeta(cs + ts + 1.0, cf + tf + 1.0)

  private def lchoose(n: Long, k: Long): Double =
    lgamma(n + 1.0) - lgamma(k + 1.0) - lgamma(n - k + 1.0)

  /** log of ONE batch's totals-conditioned (Fisher-style) block
    * e-factor for a 2×2 table — block counts (bcn, bcs, btn, bts)
    * against the hypergeometric conditional null law, with the H1
    * predictive Q LEARNED from the pre-batch cumulative counts
    * (pcn, pcs, ptn, pts): per arm, a Beta-Binomial predictive under
    * the uniform-prior posterior Beta(ps+1, pf+1), conditioned on the
    * block's success total by normalizing over the feasible
    * control-success range. Q is predictable (pre-batch state only)
    * and a genuine probability over the conditional support, so
    * E[E_block | past, margins] = 1 under EVERY fixed shared rate —
    * validity never depends on the learning; learning only buys
    * power (under the null the sharpened Q hugs the hypergeometric,
    * so blocks bet nearly nothing; under a real split it concentrates
    * on the observed imbalance). A block with no trials, or with
    * margins that pin the table, contributes exactly 0 — an empty
    * bet. The normalization is an O(block successes) StrictMath
    * log-sum-exp per KEY row, ascending order — deterministic. */
  private[graft] def logBlockCond(pcn: Long, pcs: Long, ptn: Long, pts: Long,
                                  bcn: Long, bcs: Long, btn: Long, bts: Long)
      : Double = {
    val s = bcs + bts
    val lo = math.max(0L, s - btn)
    val hi = math.min(bcn, s)
    if (bcn + btn == 0L || hi <= lo) 0.0
    else {
      val ac = pcs + 1.0; val bc = (pcn - pcs) + 1.0
      val at = pts + 1.0; val bt = (ptn - pts) + 1.0
      def lbb(n: Long, k: Long, a: Double, b: Double): Double =
        lchoose(n, k) + lbeta(k + a, n - k + b) - lbeta(a, b)
      val lq = (lo to hi).map(c =>
        lbb(bcn, c, ac, bc) + lbb(btn, s - c, at, bt))
      val m = lq.max
      val logZ = m + StrictMath.log(lq.map(v => StrictMath.exp(v - m)).sum)
      val logQ = lbb(bcn, bcs, ac, bc) + lbb(btn, bts, at, bt) - logZ
      val logHyp = lchoose(bcn, bcs) + lchoose(btn, bts) - lchoose(bcn + btn, s)
      logQ - logHyp
    }
  }

  private[streaming] case class EvState(k: String, cn: Long, cs: Long, tn: Long,
                             ts: Long, lec: Long,
                             bcn: Long, bcs: Long, btn: Long, bts: Long,
                             rows_seen: Long, n_alarms: Long,
                             batch_rows: Long, in_batch: Boolean)

  /** One monitoring micro-batch (directly callable for backfills).
    * Emits one report row per key PRESENT IN THE BATCH to
    * `outDir/batch=<id>`: (key, batch_rows, cn, cs, tn, ts,
    * p_c_ppm, p_t_ppm, log_e_micro, alarm) — counts are the lifetime
    * (since last alarm) exact totals AFTER this batch, log_e_micro
    * the floored micro-nats e-process reading, alarm 1 when the
    * Ville boundary ln(10⁶/alphaPpm) is crossed with both arms at
    * `minPerArm`+ trials.
    *
    * Rows whose conversion value is NULL advance `rows_seen` but no
    * trial count (the count(col) discipline); rows with an arm label
    * other than `controlArm`/`treatmentArm` likewise — the monitor
    * stays loud when a feed starts mislabeling arms, because
    * rows_seen keeps climbing while trials stall.
    */
  def evalueBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
                  outDir: String, stateDir: String,
                  keyCol: String, armCol: String, convCol: String,
                  controlArm: String = "control",
                  treatmentArm: String = "treatment",
                  alphaPpm: Long = 50000L,
                  minPerArm: Long = 10L,
                  mode: String = "mixture"): Unit = if (!batch.isEmpty) {
    require(alphaPpm >= 1 && alphaPpm < 1000000L,
      s"alphaPpm must be in [1, 1000000), got $alphaPpm")
    require(minPerArm >= 1, s"minPerArm must be >= 1, got $minPerArm")
    require(mode == "mixture" || mode == "conditional",
      s"mode must be 'mixture' or 'conditional', got '$mode'")
    import spark.implicits._
    val conditional = mode == "conditional"
    val logThresh = StrictMath.log(1000000.0 / alphaPpm.toDouble)
    val threshMicro = StrictMath.ceil(logThresh * 1e6).toLong
    val prior = priorState(spark, stateDir, batchId)
    val isCtl = col(armCol).cast("string") === controlArm
    val isTrt = col(armCol).cast("string") === treatmentArm
    val hasConv = col(convCol).isNotNull
    val succ = hasConv && col(convCol).cast("double") =!= 0.0
    val obs = batch
      .groupBy(col(keyCol).cast("string").as("k"))
      .agg(count(lit(1)).as("batch_rows"),
        sum(when(isCtl && hasConv, 1L).otherwise(0L)).as("bcn"),
        sum(when(isCtl && succ, 1L).otherwise(0L)).as("bcs"),
        sum(when(isTrt && hasConv, 1L).otherwise(0L)).as("btn"),
        sum(when(isTrt && succ, 1L).otherwise(0L)).as("bts"))
    // in-place upgrade: state parquet written before the conditional
    // mode existed lacks `lec` — read it as 0 (the mixture mode never
    // consults it) instead of crashing every later trigger
    val priorUp = prior.map(p =>
      if (p.columns.contains("lec")) p else p.withColumn("lec", lit(0L)))
    val stateCols = Seq("k", "cn", "cs", "tn", "ts", "lec", "rows_seen",
      "n_alarms")
    val priorS = priorUp.map(_.select(stateCols.map(col): _*))
      .getOrElse(obs.limit(0).select(col("k"), lit(0L).as("cn"),
        lit(0L).as("cs"), lit(0L).as("tn"), lit(0L).as("ts"),
        lit(0L).as("lec"),
        lit(0L).as("rows_seen"), lit(0L).as("n_alarms")))
    val folded = priorS.withColumnRenamed("k", "__pk")
      .join(obs, col("__pk") <=> col("k"), "full_outer")
      .select(coalesce(col("k"), col("__pk")).as("k"),
        (coalesce(col("cn"), lit(0L)) + coalesce(col("bcn"), lit(0L))).as("cn"),
        (coalesce(col("cs"), lit(0L)) + coalesce(col("bcs"), lit(0L))).as("cs"),
        (coalesce(col("tn"), lit(0L)) + coalesce(col("btn"), lit(0L))).as("tn"),
        (coalesce(col("ts"), lit(0L)) + coalesce(col("bts"), lit(0L))).as("ts"),
        coalesce(col("lec"), lit(0L)).as("lec"),
        coalesce(col("bcn"), lit(0L)).as("bcn"),
        coalesce(col("bcs"), lit(0L)).as("bcs"),
        coalesce(col("btn"), lit(0L)).as("btn"),
        coalesce(col("bts"), lit(0L)).as("bts"),
        (coalesce(col("rows_seen"), lit(0L))
          + coalesce(col("batch_rows"), lit(0L))).as("rows_seen"),
        coalesce(col("n_alarms"), lit(0L)).as("n_alarms"),
        coalesce(col("batch_rows"), lit(0L)).as("batch_rows"),
        col("batch_rows").isNotNull.as("in_batch"))
      .as[EvState]
      // per-KEY grain: the log-Beta/log-choose arithmetic runs once
      // per experiment row, StrictMath-pinned — not a per-event UDF
      .map { s =>
        // conditional: fold THIS block's floored micro-nat factor into
        // the accumulator (floor only under-states E — α-safe);
        // mixture: the statistic is a pure function of the counts
        val lecNew =
          if (conditional)
            s.lec + StrictMath.floor(
              logBlockCond(s.cn - s.bcn, s.cs - s.bcs,
                s.tn - s.btn, s.ts - s.bts,
                s.bcn, s.bcs, s.btn, s.bts) * 1e6).toLong
          else 0L
        val leMicro =
          if (conditional) lecNew
          else StrictMath.floor(
            logBf(s.cs, s.cn - s.cs, s.ts, s.tn - s.ts) * 1e6).toLong
        val armed = s.cn >= minPerArm && s.tn >= minPerArm
        val alarm = s.in_batch && armed && leMicro >= threshMicro
        (s.k, s.cn, s.cs, s.tn, s.ts, lecNew, s.rows_seen, s.n_alarms,
          s.batch_rows, s.in_batch, leMicro, alarm)
      }
      .toDF("k", "cn", "cs", "tn", "ts", "lec", "rows_seen", "n_alarms",
        "batch_rows", "in_batch", "log_e_micro", "alarm")
      .localCheckpoint() // one computation feeds the report AND state
    folded.filter(col("in_batch"))
      .select(col("k").as(keyCol), col("batch_rows"),
        col("cn"), col("cs"), col("tn"), col("ts"),
        when(col("cn") > 0, expr("cs * 1000000L div cn"))
          .otherwise(lit(null)).as("p_c_ppm"),
        when(col("tn") > 0, expr("ts * 1000000L div tn"))
          .otherwise(lit(null)).as("p_t_ppm"),
        col("log_e_micro"), col("alarm").cast("int").as("alarm"))
      .write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
    // alarm resets the four counts and the conditional accumulator —
    // the monitor re-arms against post-shift traffic; the audit
    // counters persist
    folded.select(col("k"),
        when(col("alarm"), lit(0L)).otherwise(col("cn")).as("cn"),
        when(col("alarm"), lit(0L)).otherwise(col("cs")).as("cs"),
        when(col("alarm"), lit(0L)).otherwise(col("tn")).as("tn"),
        when(col("alarm"), lit(0L)).otherwise(col("ts")).as("ts"),
        when(col("alarm"), lit(0L)).otherwise(col("lec")).as("lec"),
        col("rows_seen"),
        (col("n_alarms") + col("alarm").cast("long")).as("n_alarms"))
      .write.mode("overwrite").parquet(s"$stateDir/batch=$batchId")
    val f = graft.util.Fs.fs(spark, stateDir)
    f.listStatus(new Path(stateDir)).map(_.getPath.getName)
      .filter(_.startsWith("batch="))
      .map(_.stripPrefix("batch=").toLong)
      .sorted.dropRight(KEEP_VERSIONS)
      .foreach(ver => graft.util.Fs.delete(spark, s"$stateDir/batch=$ver"))
  }

  private[streaming] case class RateState(k: String, n: Long, s: Long,
                                          rows_seen: Long, n_alarms: Long,
                                          batch_rows: Long, in_batch: Boolean)

  /** ONE-sample sibling of [[evalueBatch]]: an always-valid monitor of
    * a Bernoulli rate against a FIXED reference `p0` — the shape that
    * watches an SLO whose target is known rather than an A/B contrast:
    * conformal-filter coverage against its 1−α guarantee
    * (quality_lr_conformal's deployment readout), a dedup or
    * pass-rate budget, a canary's expected fire rate. The e-value is
    * the uniform-mixture likelihood ratio against the point null,
    *
    *   log E = lB(s+1, f+1) − (s·ln p0 + f·ln(1−p0)),
    *
    * a test martingale under iid Bernoulli(p0) EXACTLY (point null —
    * none of the two-sample mixture caveat), so Ville's inequality
    * gives the ≤ α ever-crossing bound under any peeking. Two-sided
    * by construction: drift in either direction grows E. Same state
    * discipline as the two-sample monitor: exact (n, s) per key,
    * alarm resets them (re-arm), rows_seen/n_alarms persist,
    * exclude-own-writes versioning. Report per key present in the
    * batch: (key, batch_rows, n, s, rate_ppm, log_e_micro, alarm).
    */
  def rateBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
                outDir: String, stateDir: String,
                keyCol: String, convCol: String,
                p0Ppm: Long, alphaPpm: Long = 50000L,
                minTrials: Long = 20L): Unit = if (!batch.isEmpty) {
    require(p0Ppm >= 1 && p0Ppm <= 999999L,
      s"p0Ppm must be in [1, 999999], got $p0Ppm")
    require(alphaPpm >= 1 && alphaPpm < 1000000L,
      s"alphaPpm must be in [1, 1000000), got $alphaPpm")
    require(minTrials >= 1, s"minTrials must be >= 1, got $minTrials")
    import spark.implicits._
    val logThresh = StrictMath.log(1000000.0 / alphaPpm.toDouble)
    val lp = StrictMath.log(p0Ppm.toDouble / 1000000.0)
    val lq = StrictMath.log(1.0 - p0Ppm.toDouble / 1000000.0)
    val prior = priorState(spark, stateDir, batchId)
    val hasConv = col(convCol).isNotNull
    val succ = hasConv && col(convCol).cast("double") =!= 0.0
    val obs = batch
      .groupBy(col(keyCol).cast("string").as("k"))
      .agg(count(lit(1)).as("batch_rows"),
        sum(when(hasConv, 1L).otherwise(0L)).as("bn"),
        sum(when(succ, 1L).otherwise(0L)).as("bs"))
    val stateCols = Seq("k", "n", "s", "rows_seen", "n_alarms")
    val priorS = prior.map(_.select(stateCols.map(col): _*))
      .getOrElse(obs.limit(0).select(col("k"), lit(0L).as("n"),
        lit(0L).as("s"), lit(0L).as("rows_seen"), lit(0L).as("n_alarms")))
    val folded = priorS.withColumnRenamed("k", "__pk")
      .join(obs, col("__pk") <=> col("k"), "full_outer")
      .select(coalesce(col("k"), col("__pk")).as("k"),
        (coalesce(col("n"), lit(0L)) + coalesce(col("bn"), lit(0L))).as("n"),
        (coalesce(col("s"), lit(0L)) + coalesce(col("bs"), lit(0L))).as("s"),
        (coalesce(col("rows_seen"), lit(0L))
          + coalesce(col("batch_rows"), lit(0L))).as("rows_seen"),
        coalesce(col("n_alarms"), lit(0L)).as("n_alarms"),
        coalesce(col("batch_rows"), lit(0L)).as("batch_rows"),
        col("batch_rows").isNotNull.as("in_batch"))
      .as[RateState]
      .map { st =>
        val f = st.n - st.s
        val le = lbeta(st.s + 1.0, f + 1.0) - (st.s * lp + f * lq)
        val alarm = st.in_batch && st.n >= minTrials && le >= logThresh
        (st.k, st.n, st.s, st.rows_seen, st.n_alarms, st.batch_rows,
          st.in_batch, StrictMath.floor(le * 1e6).toLong, alarm)
      }
      .toDF("k", "n", "s", "rows_seen", "n_alarms", "batch_rows",
        "in_batch", "log_e_micro", "alarm")
      .localCheckpoint()
    folded.filter(col("in_batch"))
      .select(col("k").as(keyCol), col("batch_rows"), col("n"), col("s"),
        when(col("n") > 0, expr("s * 1000000L div n"))
          .otherwise(lit(null)).as("rate_ppm"),
        col("log_e_micro"), col("alarm").cast("int").as("alarm"))
      .write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
    folded.select(col("k"),
        when(col("alarm"), lit(0L)).otherwise(col("n")).as("n"),
        when(col("alarm"), lit(0L)).otherwise(col("s")).as("s"),
        col("rows_seen"),
        (col("n_alarms") + col("alarm").cast("long")).as("n_alarms"))
      .write.mode("overwrite").parquet(s"$stateDir/batch=$batchId")
    val f = graft.util.Fs.fs(spark, stateDir)
    f.listStatus(new Path(stateDir)).map(_.getPath.getName)
      .filter(_.startsWith("batch="))
      .map(_.stripPrefix("batch=").toLong)
      .sorted.dropRight(KEEP_VERSIONS)
      .foreach(ver => graft.util.Fs.delete(spark, s"$stateDir/batch=$ver"))
  }

  /** File-fed monitoring stream: new parquet files under `sourceDir`
    * fold into the per-experiment e-processes; reports land under
    * `outDir/batch=<id>`.
    */
  def evalueStream(spark: SparkSession, sourceDir: String, outDir: String,
                   stateDir: String, checkpoint: String,
                   keyCol: String, armCol: String, convCol: String,
                   controlArm: String = "control",
                   treatmentArm: String = "treatment",
                   alphaPpm: Long = 50000L, minPerArm: Long = 10L,
                   maxFilesPerTrigger: Int = 10,
                   feedSchema: Option[org.apache.spark.sql.types.StructType] = None,
                   mode: String = "mixture")
      : StreamingQuery = {
    val schema = graft.util.Fs.feedSchema(spark, sourceDir, feedSchema)
    val feed = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(sourceDir)
    feed.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime("1 second"))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        evalueBatch(spark, batch, batchId, outDir, stateDir,
          keyCol, armCol, convCol, controlArm, treatmentArm,
          alphaPpm, minPerArm, mode)
      }
      .start()
  }

  private[streaming] case class MeanState(k: String, nb: Long, n: Long,
                                          sc: Long, leu: Long, led: Long,
                                          bn: Long, bsc: Long,
                                          rows_seen: Long, n_alarms: Long,
                                          batch_rows: Long, in_batch: Boolean)

  /** CONTINUOUS-metric sibling of [[rateBatch]]/[[evalueBatch]]: an
    * always-valid monitor of a BOUNDED mean — revenue cents, latency
    * millis, any metric clamped to a declared [loCents, hiCents] —
    * against a fixed reference `mu0Cents` (the SLO/reference-mean
    * shape; the Bernoulli monitors cover conversions, this one covers
    * the metric axis of q_ab_test/q_cuped). The statistic is a
    * BETTING test martingale in the Waudby-Smith–Ramdas lineage
    * (Hoeffding-style predictable bets, batch-grain observations):
    * per batch b with n_b clamped values summing to S_b cents, the
    * normalized deviation
    *
    *   u_b = (S_b − n_b·mu0) / (n_b·(hi − lo))   ∈ [−1, 1]
    *
    * is a bounded, conditionally-mean-zero observation under the
    * null, and each of two one-sided martingales multiplies the
    * factor 1 ± λ_b·u_b with the PREDICTABLE bet
    * λ_b = min(1/2, sqrt(2·ln(10⁶/αppm)/(nb+1))) (nb = batches bet so
    * far — the Hoeffding member of the WSR family; λ ≤ 1/2 keeps
    * every factor in [1/2, 3/2], so the log is always finite).
    * E[1 ± λ_b·u_b | past] = 1 under ANY null distribution with mean
    * mu0 supported on [lo, hi] — the guarantee is uniform over the
    * whole bounded-mean null, no mixture caveat. The alarm fires when
    * EITHER side's log E crosses ln(2·10⁶/αppm) — the union-bound
    * two-sided boundary — with `minTrials`+ values seen; by Ville's
    * inequality the ever-crossing probability under the null is ≤ α
    * under any peeking.
    *
    * Values are read as cents (`floor(value·100)`) and CLAMPED to
    * [loCents, hiCents] — the test is exact for the clamped metric
    * (clamping is part of the declared statistic, the standard
    * bounded-mean practice), and a feed that starts emitting
    * out-of-range values moves the clamped mean and alarms rather
    * than corrupting the martingale. NULL and NaN values advance
    * rows_seen only (the count(col) discipline — NaN would otherwise
    * coerce to 0 cents under the long cast and masquerade as loCents).
    *
    * State per key — (k, nb, n, sc, leu, led, rows_seen, n_alarms):
    * batches bet, values seen, exact cents sum, and the two floored
    * micro-nat log accumulators (flooring only UNDER-states E, so the
    * α bound survives the integer quantization); alarm resets the
    * betting state (re-arm, the Page–Hinkley contract), audit
    * counters persist. Same exclude-own-writes versioning and
    * |keys|-grain scale shape as the siblings: one partial-agg
    * groupBy of the batch, one |keys|-row fold, StrictMath per key.
    *
    * Report per key present in the batch: (key, batch_rows, n,
    * mean_cents_milli = 1000·S/n integer-floored, log_e_up_micro,
    * log_e_dn_micro, log_e_micro = max of the two, alarm).
    */
  def meanBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
                outDir: String, stateDir: String,
                keyCol: String, valueCol: String,
                mu0Cents: Long, loCents: Long, hiCents: Long,
                alphaPpm: Long = 50000L,
                minTrials: Long = 20L): Unit = if (!batch.isEmpty) {
    require(loCents < hiCents, s"need loCents < hiCents, got [$loCents, $hiCents]")
    require(mu0Cents > loCents && mu0Cents < hiCents,
      s"mu0Cents must lie strictly inside [$loCents, $hiCents], got $mu0Cents")
    require(alphaPpm >= 1 && alphaPpm < 1000000L,
      s"alphaPpm must be in [1, 1000000), got $alphaPpm")
    require(minTrials >= 1, s"minTrials must be >= 1, got $minTrials")
    import spark.implicits._
    val logThresh = StrictMath.log(2.0 * 1000000.0 / alphaPpm.toDouble)
    val threshMicro = StrictMath.ceil(logThresh * 1e6).toLong
    val lnAlpha = StrictMath.log(1000000.0 / alphaPpm.toDouble)
    val range = (hiCents - loCents).toDouble
    val prior = priorState(spark, stateDir, batchId)
    val v = col(valueCol).cast("double")
    val cents = greatest(lit(loCents), least(lit(hiCents),
      floor(v * 100).cast("long")))
    // NaN passes isNotNull but floor(NaN·100).cast("long") coerces to
    // 0 — a NaN-polluted feed would silently drag the clamped mean
    // toward loCents; exclude NaN like NULL (rows_seen-only)
    val ok = v.isNotNull && !isnan(v)
    val obs = batch
      .groupBy(col(keyCol).cast("string").as("k"))
      .agg(count(lit(1)).as("batch_rows"),
        sum(when(ok, 1L).otherwise(0L)).as("bn"),
        sum(when(ok, cents).otherwise(0L)).as("bsc"))
    val stateCols = Seq("k", "nb", "n", "sc", "leu", "led", "rows_seen",
      "n_alarms")
    val priorS = prior.map(_.select(stateCols.map(col): _*))
      .getOrElse(obs.limit(0).select(col("k"), lit(0L).as("nb"),
        lit(0L).as("n"), lit(0L).as("sc"), lit(0L).as("leu"),
        lit(0L).as("led"), lit(0L).as("rows_seen"), lit(0L).as("n_alarms")))
    val folded = priorS.withColumnRenamed("k", "__pk")
      .join(obs, col("__pk") <=> col("k"), "full_outer")
      .select(coalesce(col("k"), col("__pk")).as("k"),
        coalesce(col("nb"), lit(0L)).as("nb"),
        (coalesce(col("n"), lit(0L)) + coalesce(col("bn"), lit(0L))).as("n"),
        (coalesce(col("sc"), lit(0L)) + coalesce(col("bsc"), lit(0L))).as("sc"),
        coalesce(col("leu"), lit(0L)).as("leu"),
        coalesce(col("led"), lit(0L)).as("led"),
        coalesce(col("bn"), lit(0L)).as("bn"),
        coalesce(col("bsc"), lit(0L)).as("bsc"),
        (coalesce(col("rows_seen"), lit(0L))
          + coalesce(col("batch_rows"), lit(0L))).as("rows_seen"),
        coalesce(col("n_alarms"), lit(0L)).as("n_alarms"),
        coalesce(col("batch_rows"), lit(0L)).as("batch_rows"),
        col("batch_rows").isNotNull.as("in_batch"))
      .as[MeanState]
      .map { s =>
        // a batch with values is one bet; an empty block bets nothing
        val (nbNew, leuNew, ledNew) =
          if (s.bn == 0L) (s.nb, s.leu, s.led)
          else {
            val lam = StrictMath.min(0.5,
              StrictMath.sqrt(2.0 * lnAlpha / (s.nb + 1).toDouble))
            val u = (s.bsc - s.bn * mu0Cents).toDouble / (s.bn * range)
            (s.nb + 1,
              s.leu + StrictMath.floor(
                StrictMath.log(1.0 + lam * u) * 1e6).toLong,
              s.led + StrictMath.floor(
                StrictMath.log(1.0 - lam * u) * 1e6).toLong)
          }
        val leMicro = StrictMath.max(leuNew, ledNew)
        val alarm = s.in_batch && s.n >= minTrials && leMicro >= threshMicro
        (s.k, nbNew, s.n, s.sc, leuNew, ledNew, s.rows_seen, s.n_alarms,
          s.batch_rows, s.in_batch, leMicro, alarm)
      }
      .toDF("k", "nb", "n", "sc", "leu", "led", "rows_seen", "n_alarms",
        "batch_rows", "in_batch", "log_e_micro", "alarm")
      .localCheckpoint()
    folded.filter(col("in_batch"))
      .select(col("k").as(keyCol), col("batch_rows"), col("n"),
        when(col("n") > 0, expr("sc * 1000L div n"))
          .otherwise(lit(null)).as("mean_cents_milli"),
        col("leu").as("log_e_up_micro"), col("led").as("log_e_dn_micro"),
        col("log_e_micro"), col("alarm").cast("int").as("alarm"))
      .write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
    folded.select(col("k"),
        when(col("alarm"), lit(0L)).otherwise(col("nb")).as("nb"),
        when(col("alarm"), lit(0L)).otherwise(col("n")).as("n"),
        when(col("alarm"), lit(0L)).otherwise(col("sc")).as("sc"),
        when(col("alarm"), lit(0L)).otherwise(col("leu")).as("leu"),
        when(col("alarm"), lit(0L)).otherwise(col("led")).as("led"),
        col("rows_seen"),
        (col("n_alarms") + col("alarm").cast("long")).as("n_alarms"))
      .write.mode("overwrite").parquet(s"$stateDir/batch=$batchId")
    val f = graft.util.Fs.fs(spark, stateDir)
    f.listStatus(new Path(stateDir)).map(_.getPath.getName)
      .filter(_.startsWith("batch="))
      .map(_.stripPrefix("batch=").toLong)
      .sorted.dropRight(KEEP_VERSIONS)
      .foreach(ver => graft.util.Fs.delete(spark, s"$stateDir/batch=$ver"))
  }

  /** File-fed bounded-mean monitoring stream — [[meanBatch]] under a
    * parquet-dir feed (the evalueStream plumbing). */
  def meanStream(spark: SparkSession, sourceDir: String, outDir: String,
                 stateDir: String, checkpoint: String,
                 keyCol: String, valueCol: String,
                 mu0Cents: Long, loCents: Long, hiCents: Long,
                 alphaPpm: Long = 50000L, minTrials: Long = 20L,
                 maxFilesPerTrigger: Int = 10,
                 feedSchema: Option[org.apache.spark.sql.types.StructType] = None)
      : StreamingQuery = {
    val schema = graft.util.Fs.feedSchema(spark, sourceDir, feedSchema)
    val feed = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(sourceDir)
    feed.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime("1 second"))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        meanBatch(spark, batch, batchId, outDir, stateDir,
          keyCol, valueCol, mu0Cents, loCents, hiCents,
          alphaPpm, minTrials)
      }
      .start()
  }
}
