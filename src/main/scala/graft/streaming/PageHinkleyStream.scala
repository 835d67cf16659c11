package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming per-key Page–Hinkley changepoint monitor (Page,
  * Biometrika 1954 — the same CUSUM lineage the batch q_changepoint
  * scans offline) and the monitor family's SUSTAINED-SHIFT axis with
  * a decision RULE, not just a level: EwmaStream reports that a
  * smoothed level moved, Page–Hinkley accumulates evidence that the
  * mean has shifted by more than a magnitude-of-indifference δ and
  * ALARMS when the accumulated drift since the most favorable point
  * exceeds λ — the classic sequential test whose false-alarm /
  * detection-delay trade is the (δ, λ) knob pair.
  *
  * Two-sided, all-integer (milli units): per trigger each key folds
  * its exact batch mean x (cents sums, milli mean by matched `div`)
  * into
  *   n' = n+1;  sum' = sum+x;  mean' = sum' div n'
  *   up'  = up + (x − mean' − δ);   minUp'  = min(minUp, up')
  *   dn'  = dn + (mean' − x − δ);   minDn'  = min(minDn, dn')
  *   PH↑ = up' − minUp';  PH↓ = dn' − minDn'
  * and alarms when either PH exceeds λ after `minBatches`
  * observations (honest cold start). On alarm the PH accumulators
  * (and the running mean they reference) RESET — the standard
  * restart, so one regime change raises one alarm and detection
  * re-arms against the new level rather than alarming forever.
  * Integer state ⇒ replays rebuild byte-identical statistics.
  *
  * State is one row per key ever seen — (k, n_batches, sum_milli,
  * up, min_up, dn, min_dn, rows_seen) — bounded by |keys| forever;
  * absent keys carry forward untouched and unreported. Versioning is
  * the exclude-own-writes discipline (EwmaStream/QuantileStream):
  * `stateDir/batch=<id>` holds state AFTER batch id, a trigger reads
  * the newest version `< batchId`, report writes before state, old
  * versions pruned to KEEP_VERSIONS.
  */
object PageHinkleyStream {

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
    * `outDir/batch=<id>`: (key, batch_rows, obs_milli, mean_milli,
    * ph_up, ph_dn, n_batches, alarm).
    */
  def phBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
              outDir: String, stateDir: String,
              keyCol: String, valueCol: String,
              deltaMilli: Long, lambdaMilli: Long,
              minBatches: Long = 3L): Unit = if (!batch.isEmpty) {
    require(deltaMilli >= 0 && lambdaMilli > 0 && minBatches >= 1,
      s"bad deltaMilli=$deltaMilli / lambdaMilli=$lambdaMilli / " +
        s"minBatches=$minBatches")
    val prior = priorState(spark, stateDir, batchId)
    val obs = batch
      .filter(col(valueCol).isNotNull)
      .select(col(keyCol).as("k"),
        round(col(valueCol) * 100).cast("long").as("__q"))
      .groupBy("k")
      .agg(count(lit(1)).as("batch_rows"), sum(col("__q")).as("__s"))
      .withColumn("obs_milli", expr("(__s * 10L) div batch_rows"))
      .drop("__s")
    val stateCols = Seq("k", "n_batches", "sum_milli", "up", "min_up",
      "dn", "min_dn", "rows_seen")
    val priorS = prior.map(_.select(stateCols.map(col): _*))
      .getOrElse(obs.limit(0).select(col("k"), lit(0L).as("n_batches"),
        lit(0L).as("sum_milli"), lit(0L).as("up"), lit(0L).as("min_up"),
        lit(0L).as("dn"), lit(0L).as("min_dn"), lit(0L).as("rows_seen")))
    val folded = priorS.withColumnRenamed("k", "__pk")
      .join(obs, col("__pk") <=> col("k"), "full_outer")
      .select(coalesce(col("k"), col("__pk")).as("k"),
        col("batch_rows"), col("obs_milli"),
        coalesce(col("n_batches"), lit(0L)).as("pn"),
        coalesce(col("sum_milli"), lit(0L)).as("psum"),
        coalesce(col("up"), lit(0L)).as("pup"),
        coalesce(col("min_up"), lit(0L)).as("pminup"),
        coalesce(col("dn"), lit(0L)).as("pdn"),
        coalesce(col("min_dn"), lit(0L)).as("pmindn"),
        coalesce(col("rows_seen"), lit(0L)).as("prows"))
      // fold the observation (absent keys pass n' = pn, sums unchanged)
      .withColumn("n2", col("pn") + when(col("obs_milli").isNotNull, 1L)
        .otherwise(0L))
      .withColumn("sum2", col("psum") + coalesce(col("obs_milli"), lit(0L)))
      .withColumn("mean2",
        when(col("obs_milli").isNull, lit(null))
          .otherwise(expr("sum2 div n2")))
      .withColumn("up2",
        when(col("obs_milli").isNull, col("pup"))
          .otherwise(col("pup") + col("obs_milli") - col("mean2")
            - lit(deltaMilli)))
      .withColumn("minup2",
        when(col("obs_milli").isNull, col("pminup"))
          .otherwise(least(col("pminup"), col("up2"))))
      .withColumn("dn2",
        when(col("obs_milli").isNull, col("pdn"))
          .otherwise(col("pdn") + col("mean2") - col("obs_milli")
            - lit(deltaMilli)))
      .withColumn("mindn2",
        when(col("obs_milli").isNull, col("pmindn"))
          .otherwise(least(col("pmindn"), col("dn2"))))
      .withColumn("alarm",
        col("obs_milli").isNotNull && col("n2") >= minBatches &&
          (col("up2") - col("minup2") > lambdaMilli ||
            col("dn2") - col("mindn2") > lambdaMilli))
      .withColumn("rows2",
        col("prows") + coalesce(col("batch_rows"), lit(0L)))
      .localCheckpoint() // one computation feeds the report AND the state
    val report = folded.filter(col("obs_milli").isNotNull)
      .select(col("k").as(keyCol), col("batch_rows"), col("obs_milli"),
        col("mean2").as("mean_milli"),
        (col("up2") - col("minup2")).as("ph_up"),
        (col("dn2") - col("mindn2")).as("ph_dn"),
        col("n2").as("n_batches"), col("alarm").cast("int").as("alarm"))
    report.write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
    // alarm resets the detector: statistics AND the running mean they
    // were scored against restart from the post-shift regime
    folded.select(col("k"),
        when(col("alarm"), lit(0L)).otherwise(col("n2")).as("n_batches"),
        when(col("alarm"), lit(0L)).otherwise(col("sum2")).as("sum_milli"),
        when(col("alarm"), lit(0L)).otherwise(col("up2")).as("up"),
        when(col("alarm"), lit(0L)).otherwise(col("minup2")).as("min_up"),
        when(col("alarm"), lit(0L)).otherwise(col("dn2")).as("dn"),
        when(col("alarm"), lit(0L)).otherwise(col("mindn2")).as("min_dn"),
        col("rows2").as("rows_seen"))
      .write.mode("overwrite").parquet(s"$stateDir/batch=$batchId")
    val f = graft.util.Fs.fs(spark, stateDir)
    f.listStatus(new Path(stateDir)).map(_.getPath.getName)
      .filter(_.startsWith("batch="))
      .map(_.stripPrefix("batch=").toLong)
      .sorted.dropRight(KEEP_VERSIONS)
      .foreach(ver => graft.util.Fs.delete(spark, s"$stateDir/batch=$ver"))
  }

  /** File-fed monitoring stream: new parquet files under `sourceDir`
    * fold into the per-key detectors; reports land under
    * `outDir/batch=<id>`.
    */
  def phStream(spark: SparkSession, sourceDir: String, outDir: String,
               stateDir: String, checkpoint: String,
               keyCol: String, valueCol: String,
               deltaMilli: Long, lambdaMilli: Long,
               minBatches: Long = 3L, maxFilesPerTrigger: Int = 10,
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
        phBatch(spark, batch, batchId, outDir, stateDir,
          keyCol, valueCol, deltaMilli, lambdaMilli, minBatches)
      }
      .start()
  }
}
