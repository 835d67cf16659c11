package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming per-key SEASONAL volume monitor — `q_seasonality`'s
  * ingestion twin and the PERIODICITY axis of the monitor family:
  * EwmaStream smooths THROUGH a weekend dip every week, AnomalyStream
  * flags every Monday; a feed with a weekly pulse wants its day
  * volumes judged against the SAME-PHASE baseline, at the trigger the
  * day completes.
  *
  * Day-close semantics (the watermark idea in integer stream time):
  * rows bucket into (key, epoch-day) counts; a key's CLOCK is the max
  * day it has ever seen (stream time, never wall clock — replays
  * recompute identically); a day CLOSES when the clock passes it by
  * more than `latenessDays`. Closing days report — observed count,
  * same-phase expected (exact milli mean of the key's PRIOR closed
  * same-phase days — the baseline as of trigger start, so same-trigger
  * siblings can't see each other), integer residual, and a drift flag
  * gated behind `minPhaseDays` closed days of that phase (honest cold
  * start; expected = −1 sentinel while the phase is unseen) — then
  * fold into the (key, phase) baseline. Rows for an already-closed
  * day are DROPPED and counted cumulatively per key
  * (`late_dropped_total` rides every report row): folding them would
  * rewrite a reported day, and a monitor must never revise history.
  *
  * Phase = epoch_day mod 7 — the q_seasonality contract: a pure
  * 7-bucket phase label, no calendar/timezone arithmetic.
  *
  * State per key: 7 baseline rows + open days within the lateness
  * horizon + one late-counter row — ≤ |keys|·(9 + latenessDays)
  * forever. All-integer state ⇒ replays recompute byte-identical.
  * Versioning follows the exclude-own-writes discipline
  * (QuotaStream/EwmaStream): `stateDir/batch=<id>` holds state AFTER
  * batch id, a trigger reads the newest version < its id, report
  * writes before state, old versions pruned.
  *
  * State schema (one parquet, discriminated rows):
  * kind 'b' → (k, key2 = phase, c1 = closed-day row sum, c2 = days)
  * kind 'o' → (k, key2 = day,   c1 = open count,         c2 = 0)
  * kind 'l' → (k, key2 = −1,    c1 = late rows dropped,  c2 = 0)
  */
object SeasonalityStream {

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

  /** One monitoring micro-batch (directly callable for backfills).
    * Report rows (one per CLOSING day) land in `outDir/batch=<id>`:
    * (key, day, phase, n, expected_milli, resid_milli, phase_days,
    * drift, late_dropped_total).
    */
  def seasonalityBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
                       outDir: String, stateDir: String,
                       keyCol: String, tsCol: String,
                       toleranceMilli: Long, latenessDays: Long = 1L,
                       minPhaseDays: Long = 2L)
      : Unit = if (!batch.isEmpty) {
    require(toleranceMilli >= 0 && latenessDays >= 0 && minPhaseDays >= 1,
      s"bad tolerance=$toleranceMilli lateness=$latenessDays min=$minPhaseDays")
    val prior = priorState(spark, stateDir, batchId)
    def emptyState = spark.range(0).select(
      lit("").as("k"), lit("").as("kind"), lit(0L).as("key2"),
      lit(0L).as("c1"), lit(0L).as("c2")).limit(0)
    val st = prior.getOrElse(emptyState)
    val base = st.filter(col("kind") === "b")
      .select(col("k"), col("key2").as("phase"),
        col("c1").as("pn"), col("c2").as("pd"))
    val open = st.filter(col("kind") === "o")
      .select(col("k"), col("key2").as("day"), col("c1").as("cnt"))
    val lateSt = st.filter(col("kind") === "l")
      .select(col("k"), col("c1").as("late_total"))
    // a day already closed iff the PRIOR clock passed it: closedBelow =
    // max(prior open day, max prior closed day) − lateness. Baselines
    // don't retain day ids, so the closed frontier rides its own
    // marker: the prior clock is the max over open days (closing days
    // always pass through open state for ≥ 1 trigger, so the max open
    // day IS the clock after every fold).
    val priorClock = open.groupBy("k").agg(max(col("day")).as("prior_clock"))
    val newCounts = batch.filter(col(tsCol).isNotNull)
      .select(col(keyCol).cast("string").as("k"),
        expr(s"unix_millis($tsCol) div 86400000L").as("day"))
      .groupBy("k", "day").agg(count(lit(1)).as("cnt"))
    // split arrivals: late (day already closed per the PRIOR clock) vs live
    val arr = newCounts.join(priorClock, Seq("k"), "left")
    val lateArr = arr.filter(col("prior_clock").isNotNull &&
        col("day") <= col("prior_clock") - lit(latenessDays) - 1L)
      .groupBy("k").agg(sum(col("cnt")).as("late_new"))
    val liveArr = arr.filter(col("prior_clock").isNull ||
        col("day") > col("prior_clock") - lit(latenessDays) - 1L)
      .select("k", "day", "cnt")
    val openAll = open.unionByName(liveArr)
      .groupBy("k", "day").agg(sum(col("cnt")).as("cnt"))
    val clock = openAll.groupBy("k").agg(max(col("day")).as("clock"))
    val withClock = openAll.join(clock, Seq("k"))
    val closing = withClock
      .filter(col("day") <= col("clock") - lit(latenessDays) - 1L)
      .withColumn("phase", pmod(col("day"), lit(7L)))
    val stillOpen = withClock
      .filter(col("day") > col("clock") - lit(latenessDays) - 1L)
      .select("k", "day", "cnt")
    val lateAll = lateSt.withColumnRenamed("k", "__lk")
      .join(lateArr, col("__lk") <=> col("k"), "full_outer")
      .select(coalesce(col("k"), col("__lk")).as("k"),
        (coalesce(col("late_total"), lit(0L)) +
          coalesce(col("late_new"), lit(0L))).as("late_total"))
    val report = closing
      .join(base, Seq("k", "phase"), "left")
      .join(lateAll, Seq("k"), "left")
      .select(col("k").as(keyCol), col("day"), col("phase"),
        col("cnt").as("n"),
        when(coalesce(col("pd"), lit(0L)) > 0L,
          expr("(pn * 1000L) div pd")).otherwise(lit(-1L))
          .as("expected_milli"),
        when(coalesce(col("pd"), lit(0L)) > 0L,
          col("cnt") * 1000L - expr("(pn * 1000L) div pd"))
          .otherwise(lit(0L)).as("resid_milli"),
        coalesce(col("pd"), lit(0L)).as("phase_days"),
        (coalesce(col("pd"), lit(0L)) >= minPhaseDays &&
          abs(col("cnt") * 1000L - expr("(pn * 1000L) div pd")) >
            toleranceMilli).cast("int").as("drift"),
        coalesce(col("late_total"), lit(0L)).as("late_dropped_total"))
      .localCheckpoint()
    val baseFold = base
      .unionByName(closing.select(col("k"), col("phase"),
        col("cnt").as("pn"), lit(1L).as("pd")))
      .groupBy("k", "phase")
      .agg(sum(col("pn")).as("pn"), sum(col("pd")).as("pd"))
    val newState = baseFold.select(col("k"), lit("b").as("kind"),
        col("phase").as("key2"), col("pn").as("c1"), col("pd").as("c2"))
      .unionByName(stillOpen.select(col("k"), lit("o").as("kind"),
        col("day").as("key2"), col("cnt").as("c1"), lit(0L).as("c2")))
      .unionByName(lateAll.filter(col("late_total") > 0L)
        .select(col("k"), lit("l").as("kind"), lit(-1L).as("key2"),
          col("late_total").as("c1"), lit(0L).as("c2")))
      .localCheckpoint()
    report.write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
    newState.write.mode("overwrite").parquet(s"$stateDir/batch=$batchId")
    val f = graft.util.Fs.fs(spark, stateDir)
    f.listStatus(new Path(stateDir)).map(_.getPath.getName)
      .filter(_.startsWith("batch="))
      .map(_.stripPrefix("batch=").toLong)
      .sorted.dropRight(KEEP_VERSIONS)
      .foreach(ver => graft.util.Fs.delete(spark, s"$stateDir/batch=$ver"))
  }

  /** File-fed monitoring stream (the EwmaStream plumbing). */
  def seasonalityStream(spark: SparkSession, sourceDir: String,
                        outDir: String, stateDir: String, checkpoint: String,
                        keyCol: String, tsCol: String,
                        toleranceMilli: Long, latenessDays: Long = 1L,
                        minPhaseDays: Long = 2L,
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
        seasonalityBatch(spark, batch, batchId, outDir, stateDir,
          keyCol, tsCol, toleranceMilli, latenessDays, minPhaseDays)
      }
      .start()
  }
}
