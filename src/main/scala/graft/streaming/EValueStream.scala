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
  * positives you harvest). This monitor's statistic is a TEST
  * MARTINGALE (an e-process), so by Ville's inequality the
  * probability it EVER crosses 1/α under the null is at most α —
  * peek every batch, stop whenever it alarms, the guarantee is
  * unchanged (Robbins' confidence-sequence lineage; the mixture-SPRT
  * family of Johari et al., KDD 2017).
  *
  * The e-value is the Beta–Binomial mixture Bayes factor over exact
  * conversion counts: control (cn trials, cs successes) and
  * treatment (tn, ts),
  *
  *   log E = lB(cs+1, cf+1) + lB(ts+1, tf+1) − lB(cs+ts+1, cf+tf+1)
  *
  * with lB the log-Beta function and f = trials − successes — the
  * marginal likelihood of "two independent uniform-prior conversion
  * rates" against "one shared uniform-prior rate" (binomial
  * coefficients cancel). The alarm fires when log E ≥ ln(10⁶/αppm)
  * once both arms have `minPerArm` trials (honest cold start — a
  * 0-vs-1 fluke should not page anyone).
  *
  * Honesty caveat (the KLL-coin discipline): the null "both arms
  * share a rate" is COMPOSITE, and this Bayes factor is a uniform
  * e-variable for the uniform-MIXTURE marginal of that null, not
  * uniformly over every fixed shared rate — the worst fixed-p
  * inflation is small and vanishes with n (the spec's no-effect
  * replay holds it to zero alarms at 40 batches x 250 rows), but a
  * deployment wanting the uniform-over-p guarantee should swap lB
  * for a conditional (Fisher-style, totals-conditioned) factor. The
  * STATE is exact integers either way; only the alarm arithmetic
  * would change.
  *
  * State is one row per experiment key — (k, cn, cs, tn, ts,
  * rows_seen, n_alarms) — exact lifetime counts, bounded by |keys|;
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

  private[streaming] case class EvState(k: String, cn: Long, cs: Long, tn: Long,
                             ts: Long, rows_seen: Long, n_alarms: Long,
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
                  minPerArm: Long = 10L): Unit = if (!batch.isEmpty) {
    require(alphaPpm >= 1 && alphaPpm < 1000000L,
      s"alphaPpm must be in [1, 1000000), got $alphaPpm")
    require(minPerArm >= 1, s"minPerArm must be >= 1, got $minPerArm")
    import spark.implicits._
    val logThresh = StrictMath.log(1000000.0 / alphaPpm.toDouble)
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
    val stateCols = Seq("k", "cn", "cs", "tn", "ts", "rows_seen",
      "n_alarms")
    val priorS = prior.map(_.select(stateCols.map(col): _*))
      .getOrElse(obs.limit(0).select(col("k"), lit(0L).as("cn"),
        lit(0L).as("cs"), lit(0L).as("tn"), lit(0L).as("ts"),
        lit(0L).as("rows_seen"), lit(0L).as("n_alarms")))
    val folded = priorS.withColumnRenamed("k", "__pk")
      .join(obs, col("__pk") <=> col("k"), "full_outer")
      .select(coalesce(col("k"), col("__pk")).as("k"),
        (coalesce(col("cn"), lit(0L)) + coalesce(col("bcn"), lit(0L))).as("cn"),
        (coalesce(col("cs"), lit(0L)) + coalesce(col("bcs"), lit(0L))).as("cs"),
        (coalesce(col("tn"), lit(0L)) + coalesce(col("btn"), lit(0L))).as("tn"),
        (coalesce(col("ts"), lit(0L)) + coalesce(col("bts"), lit(0L))).as("ts"),
        (coalesce(col("rows_seen"), lit(0L))
          + coalesce(col("batch_rows"), lit(0L))).as("rows_seen"),
        coalesce(col("n_alarms"), lit(0L)).as("n_alarms"),
        coalesce(col("batch_rows"), lit(0L)).as("batch_rows"),
        col("batch_rows").isNotNull.as("in_batch"))
      .as[EvState]
      // per-KEY grain: the log-Beta arithmetic runs once per
      // experiment row, StrictMath-pinned — not a per-event UDF
      .map { s =>
        val le = logBf(s.cs, s.cn - s.cs, s.ts, s.tn - s.ts)
        val armed = s.cn >= minPerArm && s.tn >= minPerArm
        val alarm = s.in_batch && armed && le >= logThresh
        (s.k, s.cn, s.cs, s.tn, s.ts, s.rows_seen, s.n_alarms,
          s.batch_rows, s.in_batch,
          StrictMath.floor(le * 1e6).toLong, alarm)
      }
      .toDF("k", "cn", "cs", "tn", "ts", "rows_seen", "n_alarms",
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
    // alarm resets the four counts — the monitor re-arms against
    // post-shift traffic; the audit counters persist
    folded.select(col("k"),
        when(col("alarm"), lit(0L)).otherwise(col("cn")).as("cn"),
        when(col("alarm"), lit(0L)).otherwise(col("cs")).as("cs"),
        when(col("alarm"), lit(0L)).otherwise(col("tn")).as("tn"),
        when(col("alarm"), lit(0L)).otherwise(col("ts")).as("ts"),
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
        evalueBatch(spark, batch, batchId, outDir, stateDir,
          keyCol, armCol, convCol, controlArm, treatmentArm,
          alphaPpm, minPerArm)
      }
      .start()
  }
}
