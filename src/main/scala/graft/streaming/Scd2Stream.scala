package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.cdc.Scd2
import graft.util.Fs

/** Streaming SCD type-2 maintenance: a CDC feed keeps a full version
  * history current, one micro-batch at a time — the streaming twin of
  * [[graft.cdc.Scd2]] the same way [[AggStream]] twins
  * [[graft.cdc.AggMaintain]] (reference polling loop:
  * `internal/job.go:51`; here the trigger replaces the poll).
  *
  * Each trigger folds its batch with [[Scd2.maintain]] — O(touched
  * keys) rebuild, untouched history passes through — and lands the
  * result with the stage-and-swap recipe ([[Fs.replace]], crash
  * window healed by [[Fs.recoverReplace]] before any read).
  *
  * Replay idempotence WITHOUT a batch stamp: re-folding an
  * already-folded batch is a fixpoint. The replayed rows either
  * duplicate an effective change (same pk, version, payload — the
  * second copy is payload-identical to its lag neighbor, so the no-op
  * collapse drops it) or were no-ops originally (payload equals the
  * preceding effective payload, dropped again). foreachBatch replays
  * deliver the identical batch for a file source, so at-least-once
  * delivery converges to exactly-once history. This only holds
  * because versions are globally unique per key (the CDC contract: at
  * most one change row per (pk, version)).
  */
object Scd2Stream {

  /** One maintenance micro-batch — public so convergence, replay, and
    * the crash window are directly spec-testable.
    */
  def foldBatch(spark: SparkSession, batch: DataFrame, historyPath: String,
                pkCols: Seq[String], versionCol: String,
                payloadCols: Seq[String]): Unit =
    // inverted guard, NOT an early return (`return` in a lambda is a
    // non-local return); an empty batch must not touch the store
    if (!batch.isEmpty) {
      // heal a swap that crashed between delete and rename — otherwise
      // this fold would misread "no history" and restart from the batch
      Fs.recoverReplace(spark, s"$historyPath.staging", historyPath)
      val changes = batch.select(
        (pkCols ++ payloadCols).map(col) :+ col(versionCol): _*)
      val next =
        if (Fs.hasFileWithSuffix(spark, historyPath, ".parquet"))
          Scd2.maintain(spark.read.parquet(historyPath), changes,
            pkCols, versionCol, payloadCols)
        else
          Scd2.buildHistory(changes, pkCols, versionCol, payloadCols)
      // stage then MOVE: `next` reads the live files the overwrite
      // would delete, and a second write would double per-trigger I/O
      val staging = s"$historyPath.staging"
      next.write.mode("overwrite").parquet(staging)
      Fs.replace(spark, staging, historyPath)
    }

  /** Continuous maintenance: parquet file feed → per-trigger
    * [[foldBatch]]. The checkpoint carries source progress only; the
    * history store itself is the state (replay-safe, see object doc).
    */
  def historyStream(spark: SparkSession, sourceDir: String, historyPath: String,
                    checkpoint: String, pkCols: Seq[String], versionCol: String,
                    payloadCols: Seq[String],
                    maxFilesPerTrigger: Int = 10,
                    feedSchema: Option[org.apache.spark.sql.types.StructType] = None): StreamingQuery = {
    val schema = graft.util.Fs.feedSchema(spark, sourceDir, feedSchema)
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(sourceDir)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime("1 second"))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        foldBatch(spark, batch, historyPath, pkCols, versionCol, payloadCols)
      }
      .start()
  }
}
