package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming per-key smoothed-level monitor — `q_ewma`'s ingestion
  * twin and the LEVEL-SHIFT axis of the monitor family: AnomalyStream
  * flags individual outlier points against frozen moments,
  * QuantileStream watches the lifetime tail, FreshnessStream the
  * silent feed; this one tracks the SMOOTHED level of a metric per
  * key across triggers and flags the batch whose own level breaks
  * away from the history — a feed whose mean doc length, score, or
  * latency moves and STAYS moved (the shift a point-outlier monitor
  * never trips on, because every new point is close to its
  * neighbors).
  *
  * Each trigger folds the key's batch observation (exact cents mean,
  * reported in milli units) into a running α = ½ EWMA with ONE
  * integer step: level' = (level + obs) div 2 — the recursive twin
  * of q_ewma's truncated k-lag form. All-integer state means replays
  * recompute BYTE-IDENTICAL levels (no float accumulation drifts
  * across retries), and the matched `div` truncation keeps negative
  * metrics exact. The first observation seeds the level; drift
  * (|obs − level_prev| > toleranceMilli) only fires after
  * `minBatches` observations — an honest cold start.
  *
  * State is ONE row per key ever seen — (key, level_milli, n_batches,
  * rows_seen) — bounded by |keys| forever; keys absent from a batch
  * carry forward untouched and unreported. Versioning follows the
  * exclude-own-writes discipline (QuotaStream/QuantileStream):
  * `stateDir/batch=<id>` holds state AFTER batch id, a trigger reads
  * the newest version `< batchId`, report writes before state, old
  * versions pruned to KEEP_VERSIONS.
  */
object EwmaStream {

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
    * Emits one report row per key PRESENT IN THE BATCH to
    * `outDir/batch=<id>`: (key, batch_rows, obs_milli,
    * level_prev_milli, level_milli, n_batches, drift) —
    * level_prev_milli = −1 sentinel on a key's first observation.
    */
  def ewmaBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
                outDir: String, stateDir: String,
                keyCol: String, valueCol: String,
                toleranceMilli: Long, minBatches: Long = 3L)
      : Unit = if (!batch.isEmpty) {
    require(toleranceMilli >= 0 && minBatches >= 1,
      s"bad toleranceMilli=$toleranceMilli / minBatches=$minBatches")
    val prior = priorState(spark, stateDir, batchId)
    // exact batch observation: cents sums + counts, milli mean by
    // matched integer division; null values don't observe
    val obs = batch
      .filter(col(valueCol).isNotNull)
      .select(col(keyCol).as("k"),
        round(col(valueCol) * 100).cast("long").as("__q"))
      .groupBy("k")
      .agg(count(lit(1)).as("batch_rows"), sum(col("__q")).as("__s"))
      .withColumn("obs_milli", expr("(__s * 10L) div batch_rows"))
      .drop("__s")
    val priorS = prior.map(_.select(col("k"), col("level_milli"),
        col("n_batches"), col("rows_seen")))
      .getOrElse(obs.limit(0).select(col("k"),
        col("obs_milli").as("level_milli"), lit(0L).as("n_batches"),
        lit(0L).as("rows_seen")))
    // full-outer fold: observed keys update, absent keys carry forward
    val folded = priorS.withColumnRenamed("k", "__pk")
      .join(obs, col("__pk") <=> col("k"), "full_outer")
      .select(
        coalesce(col("k"), col("__pk")).as("k"),
        col("batch_rows"), col("obs_milli"),
        col("level_milli").as("level_prev"),
        col("n_batches").as("prev_n"), col("rows_seen").as("prev_rows"))
      .withColumn("level_milli",
        when(col("obs_milli").isNull, col("level_prev"))        // absent key
          .when(col("level_prev").isNull, col("obs_milli"))     // first obs
          .otherwise(expr("(level_prev + obs_milli) div 2L")))
      .withColumn("n_batches", coalesce(col("prev_n"), lit(0L)) +
        when(col("obs_milli").isNotNull, 1L).otherwise(0L))
      .withColumn("rows_seen", coalesce(col("prev_rows"), lit(0L)) +
        coalesce(col("batch_rows"), lit(0L)))
      .localCheckpoint() // one computation feeds the report AND the state
    val report = folded.filter(col("obs_milli").isNotNull)
      .select(col("k").as(keyCol), col("batch_rows"), col("obs_milli"),
        coalesce(col("level_prev"), lit(-1L)).as("level_prev_milli"),
        col("level_milli"), col("n_batches"),
        (col("level_prev").isNotNull &&
          col("prev_n") >= minBatches &&
          abs(col("obs_milli") - col("level_prev")) > toleranceMilli)
          .cast("int").as("drift"))
    report.write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
    folded.select(col("k"), col("level_milli"), col("n_batches"),
        col("rows_seen"))
      .write.mode("overwrite").parquet(s"$stateDir/batch=$batchId")
    val f = graft.util.Fs.fs(spark, stateDir)
    f.listStatus(new Path(stateDir)).map(_.getPath.getName)
      .filter(_.startsWith("batch="))
      .map(_.stripPrefix("batch=").toLong)
      .sorted.dropRight(KEEP_VERSIONS)
      .foreach(ver => graft.util.Fs.delete(spark, s"$stateDir/batch=$ver"))
  }

  /** File-fed monitoring stream: new parquet files under `sourceDir`
    * fold into the per-key levels; reports land under
    * `outDir/batch=<id>`.
    */
  def ewmaStream(spark: SparkSession, sourceDir: String, outDir: String,
                 stateDir: String, checkpoint: String,
                 keyCol: String, valueCol: String,
                 toleranceMilli: Long, minBatches: Long = 3L,
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
        ewmaBatch(spark, batch, batchId, outDir, stateDir,
          keyCol, valueCol, toleranceMilli, minBatches)
      }
      .start()
  }
}
