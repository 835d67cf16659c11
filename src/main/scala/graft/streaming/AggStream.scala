package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.cdc.{AggMaintain, Merge}
import graft.util.Fs

/** Streaming materialized-view maintenance: a CDC feed keeps BOTH a
  * base-table replica and a per-group (count, sum) aggregate of it up
  * to date — the aggregate folded forward incrementally
  * ([[graft.cdc.AggMaintain]], O(batch) per trigger), never recomputed
  * from the base.
  *
  * Exactly-once fold under foreachBatch's at-least-once contract: the
  * base upsert is idempotent (replaying a merge of the same rows is a
  * no-op), but folding the same DELTA twice corrupts the view. So the
  * aggregate store is swapped in atomically WITH a `_graft_batch`
  * stamp of the batch id that produced it, and a replayed batch that
  * finds its own (or a later) stamp skips the fold. Within a trigger
  * the fold runs BEFORE the base upsert — the delta retracts against
  * the PRE-batch base — so the crash windows replay cleanly:
  *  - crash before the agg swap: nothing changed; replay refolds;
  *  - crash between agg swap and base upsert: replay sees the stamp,
  *    skips the fold, re-runs only the idempotent base merge;
  *  - both swaps are staged+rename, so neither store is ever partial.
  */
object AggStream {

  private val STAMP = "_graft_batch"

  private[graft] def readStamp(spark: SparkSession, dir: String): Option[Long] = {
    val f = Fs.fs(spark, dir)
    val p = new Path(dir, STAMP)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      try Some(new String(in.readAllBytes(), "UTF-8").trim.toLong)
      finally in.close()
    }
  }

  private[graft] def writeStamp(spark: SparkSession, dir: String, batchId: Long): Unit = {
    val out = Fs.fs(spark, dir).create(new Path(dir, STAMP), true)
    try out.write(batchId.toString.getBytes("UTF-8")) finally out.close()
  }

  /** One maintenance micro-batch — public so replay idempotence and
    * the crash windows are directly spec-testable (same pattern as
    * [[CdcStream.nearDupBatch]]).
    *
    * `deleteCol`, when given, names a boolean tombstone column of the
    * feed: a key's latest change row with it true deletes the key.
    */
  def foldBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
                basePath: String, aggPath: String,
                pkCols: Seq[String], grpCols: Seq[String], valCol: String,
                versionColumn: Option[String] = None,
                deleteCol: Option[String] = None,
                cntCol: String = "n_rows", sumCol: String = "sum_value"): Unit =
    if (!batch.isEmpty) {
      // collapse to ONE action per key (last writer wins by version)
      val latest = Merge.latestByKey(batch, pkCols,
        versionColumn.getOrElse(batch.columns.filterNot(pkCols.contains).head))
        .localCheckpoint() // feeds the fold AND the merge, under stores being swapped
      val ups = deleteCol.map(c => latest.filter(!col(c)).drop(c)).getOrElse(latest)
      val delKeys = deleteCol.map(c => latest.filter(col(c)).select(pkCols.map(col): _*))
        .getOrElse(latest.limit(0).select(pkCols.map(col): _*))

      val baseExists = Fs.hasFileWithSuffix(spark, basePath, ".parquet")
      val base = if (baseExists) spark.read.parquet(basePath) else ups.limit(0)

      // 1. fold the delta into the aggregate — but only once per batch
      //    id: a replay that already published this fold must not
      //    double-apply the delta
      if (!readStamp(spark, aggPath).exists(_ >= batchId)) {
        val oldAgg =
          if (Fs.hasFileWithSuffix(spark, aggPath, ".parquet"))
            Some(spark.read.parquet(aggPath))
          else None // bootstrap: computed from the (possibly empty) base
        val newAgg = AggMaintain.maintainSumCount(spark, base, ups, delKeys,
          pkCols, grpCols, valCol, cntCol, sumCol, oldAgg)
        val staging = s"$aggPath.staging"
        newAgg.write.mode("overwrite").parquet(staging)
        writeStamp(spark, staging, batchId) // stamp rides the atomic swap
        Fs.replace(spark, staging, aggPath)
      }

      // 2. idempotent base upsert (stage + swap, merge reads the files
      //    the swap replaces)
      val merged =
        if (baseExists) Merge.applyDeletes(Merge.upsert(base, ups, pkCols), delKeys, pkCols)
        else ups
      val staging = s"$basePath.staging"
      merged.write.mode("overwrite").parquet(staging)
      Fs.replace(spark, staging, basePath)
      ()
    }

  /** Continuous maintenance of base + aggregate from a file-based
    * change feed. Returns the running query; callers own its
    * lifecycle.
    */
  def maintainStream(spark: SparkSession, sourceDir: String,
                     basePath: String, aggPath: String, checkpoint: String,
                     pkCols: Seq[String], grpCols: Seq[String], valCol: String,
                     versionColumn: Option[String] = None,
                     deleteCol: Option[String] = None,
                     maxFilesPerTrigger: Int = 10): StreamingQuery = {
    val schema = spark.read.parquet(sourceDir).schema
    val feed = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(sourceDir)
    feed.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime("1 second"))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        foldBatch(spark, batch, batchId, basePath, aggPath,
          pkCols, grpCols, valCol, versionColumn, deleteCol)
      }
      .start()
  }
}
