package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.ops.Profile

/** Streaming metric-anomaly monitor — the production twin of
  * `Profile.zscoreOutliers` (SURVEY §2 B24), completing the
  * monitoring quartet (batch drift / streaming drift / batch anomaly
  * / streaming anomaly): every ingested micro-batch of events is
  * scored against the FROZEN per-group moments of an already-admitted
  * reference corpus, and the flagged tail lands in an append-only
  * monitoring sink keyed by batch id. The alert an event pipeline
  * wants: "this trigger carries 8σ values" BEFORE the batch reaches
  * dashboards or models.
  *
  * Scoring against a frozen reference (not the batch's own moments)
  * is deliberate: a batch that is wholesale anomalous would look
  * self-consistent to its own statistics — exactly the failure mode a
  * monitor exists to catch.
  *
  * Determinism/replay: the reference moments are exact longs, the
  * z chain is the correctly-rounded IEEE chain of the batch scan, and
  * the flagged rows are a pure function of (batch, reference) — the
  * `batch=<id>` overwrite makes foreachBatch's at-least-once replays
  * rewrite identical bytes (DriftStream's sink discipline).
  *
  * Scale shape: the reference is a |groups|-row broadcast; per
  * trigger the batch never shuffles (scan → broadcast join → filter).
  */
object AnomalyStream {

  /** One monitor micro-batch (directly callable for backfills). */
  def anomalyBatch(batch: DataFrame, refStats: DataFrame, batchId: Long,
                   monitorDir: String, groupCol: String, valueCol: String,
                   zThreshold: Double): Unit = if (!batch.isEmpty) {
    Profile.zscoreProbe(batch, refStats, groupCol, valueCol, zThreshold)
      .write.mode("overwrite").parquet(s"$monitorDir/batch=$batchId")
  }

  /** [[anomalyBatch]]'s robust sibling: median/MAD scoring against a
    * frozen reference — the right monitor when a bad trigger can be
    * MOSTLY garbage (the z-score's own σ would absorb it; MAD's 50%
    * breakdown point doesn't).
    */
  def madAnomalyBatch(batch: DataFrame, refStats: DataFrame, batchId: Long,
                      monitorDir: String, groupCol: String, valueCol: String,
                      k: Double): Unit = if (!batch.isEmpty) {
    Profile.madProbe(batch, refStats, groupCol, valueCol, k)
      .write.mode("overwrite").parquet(s"$monitorDir/batch=$batchId")
  }

  /** File-fed robust monitor stream ([[anomalyStream]] with median/MAD
    * scoring).
    */
  def madAnomalyStream(spark: SparkSession, sourceDir: String, refDir: String,
                       monitorDir: String, checkpoint: String,
                       groupCol: String, valueCol: String,
                       k: Double = 5.0,
                       maxFilesPerTrigger: Int = 10,
                       feedSchema: Option[org.apache.spark.sql.types.StructType] = None): StreamingQuery = {
    val schema = graft.util.Fs.feedSchema(spark, sourceDir, feedSchema)
    // |groups| rows reused every trigger for the stream's lifetime —
    // Lineage.truncate so a mid-stream executor loss doesn't strand
    // the reference frame (durable under spark.graft.checkpointDir)
    val refStats = graft.util.Lineage.truncate(Profile.madStats(
      spark.read.parquet(refDir), groupCol, valueCol))
    val feed = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(sourceDir)
    feed.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime("1 second"))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        madAnomalyBatch(batch, refStats, batchId, monitorDir, groupCol,
          valueCol, k)
      }
      .start()
  }

  /** File-fed monitor stream: reads new parquet event files under
    * `sourceDir`, scores each trigger against the frozen moments of
    * the reference corpus at `refDir`, appends flagged rows under
    * `monitorDir`.
    */
  def anomalyStream(spark: SparkSession, sourceDir: String, refDir: String,
                    monitorDir: String, checkpoint: String,
                    groupCol: String, valueCol: String,
                    zThreshold: Double = 3.0,
                    maxFilesPerTrigger: Int = 10,
                    feedSchema: Option[org.apache.spark.sql.types.StructType] = None): StreamingQuery = {
    val schema = graft.util.Fs.feedSchema(spark, sourceDir, feedSchema)
    // |groups| rows reused every trigger for the stream's lifetime:
    // materialize once, durably under spark.graft.checkpointDir
    val refStats = graft.util.Lineage.truncate(Profile.momentStats(
      spark.read.parquet(refDir), groupCol, valueCol))
    val feed = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(sourceDir)
    feed.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime("1 second"))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        anomalyBatch(batch, refStats, batchId, monitorDir, groupCol,
          valueCol, zThreshold)
      }
      .start()
  }
}
