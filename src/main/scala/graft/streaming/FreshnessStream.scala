package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming per-key FRESHNESS monitor — `q_gap_fill`'s ingestion twin
  * and the missing monitoring axis next to DriftStream (distribution),
  * AnomalyStream (moments), QuotaStream (volume caps), TopKStream
  * (concentration), CardinalityStream (novelty) and QuantileStream
  * (tails): all of those report on keys PRESENT in the batch — a feed
  * that stops arriving simply vanishes from their reports. This one
  * reports every known key each trigger, so the stuck crawler, the
  * dead shard, the partition that went silent is visible AT the
  * trigger it goes quiet — the gap IS the signal.
  *
  * Two distinct staleness axes per key (a feed can be alive yet
  * value-dead):
  *  - TRANSPORT: `stale_ms` / `buckets_missed` since the key's last
  *    row with a timestamp — liveness of the pipe;
  *  - VALUE (the LOCF axis): `last_value` + `value_stale_ms` since
  *    the last NON-NULL value — a key streaming null values is alive
  *    but carries a stale observation, and the monitor says both.
  *
  * The clock is STREAM time: the maximum event timestamp across all
  * keys' state (never the wall clock), so a replayed batch recomputes
  * byte-identical staleness. The last observation per key merges as
  * the lexicographic max of (ts, value) structs over state ∪ batch —
  * total-ordered, so same-timestamp duplicates can't flap between
  * runs. Null-ts rows advance `rows_seen` only; null keys are a key
  * like any other (null-safe joins).
  *
  * `retireAfterBuckets` bounds state for key-churn streams: a key
  * whose transport staleness exceeds it is reported one final time
  * (retired = 1) and dropped from the next state version — without
  * it, lifetime key count bounds state (the QuotaStream contract).
  *
  * Versioning follows the exclude-own-writes discipline:
  * `stateDir/batch=<id>` holds state AFTER batch id, a trigger reads
  * the newest version `< batchId`, report writes before state, old
  * versions pruned to KEEP_VERSIONS. Per-trigger cost: one
  * batch-sized partial agg + a |keys|-row state merge; state is ONE
  * row per live key per version regardless of stream age.
  */
object FreshnessStream {

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
    * Emits one report row per key in state ∪ batch to
    * `outDir/batch=<id>`: (key, batch_rows, rows_seen, last_ts,
    * stale_ms, buckets_missed, last_value, value_stale_ms, stale,
    * retired).
    */
  def freshnessBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
                     outDir: String, stateDir: String,
                     keyCol: String, tsCol: String, valueCol: String,
                     stepSeconds: Long = 3600L, maxMissedBuckets: Long = 2L,
                     retireAfterBuckets: Option[Long] = None)
      : Unit = if (!batch.isEmpty) {
    require(stepSeconds > 0, s"stepSeconds must be positive, got $stepSeconds")
    retireAfterBuckets.foreach(r => require(r >= maxMissedBuckets,
      "retireAfterBuckets must be >= maxMissedBuckets (retire only stale keys)"))
    val prior = priorState(spark, stateDir, batchId)
    val k = col(keyCol)
    // per-key batch summary: row count (nulls included), transport max
    // ts, and the lexicographic-max (ts, value) non-null observation
    val bAgg = batch
      .select(k, col(tsCol).as("__t"), col(valueCol).cast("double").as("__v"))
      .groupBy(k)
      .agg(count(lit(1)).as("batch_rows"),
        max(col("__t")).as("b_last_ts"),
        max(when(col("__t").isNotNull && col("__v").isNotNull,
          struct(col("__t").as("ts"), col("__v").as("v")))).as("b_obs"))
      .localCheckpoint() // feeds the merge AND the report join
    val stateCols = Seq(k, col("rows_seen"), col("last_ts"), col("obs"))
    val priorS = prior.map(_.select(stateCols: _*))
      .getOrElse(bAgg.select(k, col("batch_rows").as("rows_seen"),
        col("b_last_ts").as("last_ts"), col("b_obs").as("obs")).limit(0))
    // full outer merge on the key (null-safe): totals sum, transport
    // ts and observation take the total-ordered max across both sides
    val merged = priorS.withColumnRenamed(keyCol, "__sk")
      .join(bAgg.withColumnRenamed(keyCol, "__bk"),
        col("__sk") <=> col("__bk"), "full")
      .select(
        coalesce(col("__sk"), col("__bk")).as(keyCol),
        (coalesce(col("rows_seen"), lit(0L)) +
          coalesce(col("batch_rows"), lit(0L))).as("rows_seen"),
        greatest(col("last_ts"), col("b_last_ts")).as("last_ts"),
        when(col("obs").isNull, col("b_obs"))
          .when(col("b_obs").isNull, col("obs"))
          .when(col("b_obs") > col("obs"), col("b_obs"))
          .otherwise(col("obs")).as("obs"),
        coalesce(col("batch_rows"), lit(0L)).as("batch_rows"))
      .localCheckpoint() // one computation feeds clock, report, state
    // stream clock: the max transport ts over ALL keys (1 row,
    // broadcast) — deterministic under replay, no wall time
    val clock = merged.agg(max(col("last_ts")).as("__clock"))
    val scored = merged.crossJoin(broadcast(clock))
      .withColumn("__clock_ms", expr("unix_millis(__clock)"))
      .withColumn("stale_ms", col("__clock_ms") - expr("unix_millis(last_ts)"))
      .withColumn("buckets_missed",
        expr(s"stale_ms div ${stepSeconds * 1000L}"))
      .withColumn("value_stale_ms",
        col("__clock_ms") - expr("unix_millis(obs.ts)"))
      // a key with NO timestamped row ever (all-null ts) has null
      // staleness: it carries no transport evidence, so it is neither
      // stale nor retirable — coalesce keeps it visible and in state
      // (a null `retired` would silently fail the =0 state filter and
      // drop the key)
      .withColumn("stale",
        coalesce((col("buckets_missed") >= maxMissedBuckets).cast("int"),
          lit(0)))
      .withColumn("retired", retireAfterBuckets
        .map(r => coalesce((col("buckets_missed") > r).cast("int"), lit(0)))
        .getOrElse(lit(0)))
    val report = scored.select(k, col("batch_rows"), col("rows_seen"),
      col("last_ts"), col("stale_ms"), col("buckets_missed"),
      col("obs.v").as("last_value"), col("value_stale_ms"),
      col("stale"), col("retired"))
    report.write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
    scored.filter(col("retired") === 0)
      .select(k, col("rows_seen"), col("last_ts"), col("obs"))
      .write.mode("overwrite").parquet(s"$stateDir/batch=$batchId")
    val f = graft.util.Fs.fs(spark, stateDir)
    f.listStatus(new Path(stateDir)).map(_.getPath.getName)
      .filter(_.startsWith("batch="))
      .map(_.stripPrefix("batch=").toLong)
      .sorted.dropRight(KEEP_VERSIONS)
      .foreach(ver => graft.util.Fs.delete(spark, s"$stateDir/batch=$ver"))
  }

  /** File-fed monitoring stream: new parquet files under `sourceDir`
    * advance the per-key freshness state; reports land under
    * `outDir/batch=<id>`.
    */
  def freshnessStream(spark: SparkSession, sourceDir: String, outDir: String,
                      stateDir: String, checkpoint: String,
                      keyCol: String, tsCol: String, valueCol: String,
                      stepSeconds: Long = 3600L, maxMissedBuckets: Long = 2L,
                      retireAfterBuckets: Option[Long] = None,
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
        freshnessBatch(spark, batch, batchId, outDir, stateDir,
          keyCol, tsCol, valueCol, stepSeconds, maxMissedBuckets,
          retireAfterBuckets)
      }
      .start()
  }
}
