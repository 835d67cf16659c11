package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.cdc.{AggMaintain, BucketedLayout, Merge}
import graft.util.Fs

/** Streaming materialized-view maintenance: a CDC feed keeps BOTH a
  * base-table replica and a per-group (count, sum) aggregate of it up
  * to date — the aggregate maintained incrementally
  * ([[graft.cdc.AggMaintain.deltas]]), never recomputed from the base.
  *
  * The aggregate store is an APPEND-ONLY DELTA LOG, not a rewritten
  * table: each trigger writes its batch's per-group deltas into a
  * deterministic `batch=<id>` partition (dynamic-partition overwrite,
  * so a replay rewrites exactly its own directory), and [[readAgg]]
  * folds the log — count/sum deltas are associative, so the fold is
  * one partial-aggregated pass. Per-trigger aggregate I/O is
  * O(groups TOUCHED BY THE BATCH), never O(all groups) and never
  * O(base); [[compactDeltas]] folds old partitions into a base dir so
  * log listing stays bounded with stream age (same recipe as the
  * near-dup store). The base replica is maintained alongside — flat
  * stage-and-swap for small tables, or hash-bucketed partitions
  * (`nBuckets`, reusing [[graft.cdc.BucketedLayout]]) where a trigger
  * rewrites only the partitions its keys hash into.
  *
  * Exactly-once fold under foreachBatch's at-least-once contract:
  * the delta for batch N is computed against the PRE-batch base, so
  * it is only correct while the base hasn't advanced. The ordering
  * makes that an invariant: delta write → `_graft_batch` stamp →
  * base update. A replay that finds its stamp skips the delta
  * (whether or not the base half finished) and re-runs only the
  * idempotent base merge; a replay without the stamp recomputes an
  * IDENTICAL delta (the base can't have advanced — base updates only
  * run after stamping) and overwrites its own partition. Crash inside
  * the flat base swap itself (destination deleted, rename pending) is
  * healed by [[graft.util.Fs.recoverReplace]] before any base read,
  * so a missing base is never misread as an empty one.
  *
  * Durability trade, named (shared with [[JoinStream]]): per-trigger
  * intermediates pin with `localCheckpoint()` — executor-local
  * blocks, not reliable storage. An executor loss mid-trigger fails
  * the trigger and foreachBatch retries it; the stamp ordering above
  * makes the retry safe (identical recompute before the stamp,
  * idempotent merges after), so executor churn costs retry latency,
  * never correctness.
  */
object AggStream {

  private val STAMP = "_graft_batch"

  /** A missing OR garbled stamp reads as absent — absent means
    * "refold", which is always safe: the base only advances after the
    * stamp lands, so an attempt that died mid-stamp left the base
    * pre-batch and the recomputed delta is identical.
    */
  private[graft] def readStamp(spark: SparkSession, dir: String): Option[Long] =
    Fs.readSmallText(spark, dir, STAMP).flatMap(_.toLongOption)

  private[graft] def writeStamp(spark: SparkSession, dir: String, batchId: Long): Unit =
    Fs.writeSmallText(spark, dir, STAMP, batchId.toString)

  /** The maintained view: fold the delta log. One partial-aggregated
    * pass over O(groups × retained dirs) delta rows; groups whose
    * retractions cancelled out (count 0) have left the view.
    */
  def readAgg(spark: SparkSession, aggPath: String, grpCols: Seq[String],
              cntCol: String = "n_rows", sumCol: String = "sum_value"): DataFrame =
    spark.read.option("basePath", aggPath).parquet(aggPath)
      .groupBy(grpCols.map(col): _*)
      .agg(sum(col("d_count")).as(cntCol),
        coalesce(sum(col("d_sum")), lit(BigDecimal(0)))
          .cast("decimal(18,2)").as(sumCol))
      .filter(col(cntCol) > 0)

  /** One maintenance micro-batch — public so replay idempotence and
    * the crash windows are directly spec-testable (same pattern as
    * [[CdcStream.nearDupBatch]]).
    *
    * `deleteCol`, when given, names a boolean tombstone column of the
    * feed: a key's latest change row with it true deletes the key.
    * `nBuckets` lays the base replica out as hash-bucket partitions
    * (O(batch) base I/O per trigger); None keeps a flat staged-swap
    * target for small tables.
    */
  def foldBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
                basePath: String, aggPath: String,
                pkCols: Seq[String], grpCols: Seq[String], valCol: String,
                versionColumn: Option[String] = None,
                deleteCol: Option[String] = None,
                nBuckets: Option[Int] = None,
                maxDeltaDirs: Int = 8): Unit =
    if (!batch.isEmpty) {
      // collapse to ONE action per key (last writer wins by version)
      val latest = Merge.latestByKey(batch, pkCols,
        versionColumn.getOrElse(batch.columns.filterNot(pkCols.contains).head))
        .localCheckpoint() // feeds the fold AND the merge, under stores being swapped
      val ups = deleteCol.map(c => latest.filter(!col(c)).drop(c)).getOrElse(latest)
      val delKeys = deleteCol.map(c => latest.filter(col(c)).select(pkCols.map(col): _*))
        .getOrElse(latest.limit(0).select(pkCols.map(col): _*))

      // heal a base swap that crashed mid-way (full swap: destination
      // deleted with the rename pending; bucketed: some partition dirs
      // swapped, the rest still staged) — otherwise this replay would
      // misread the base and truncate the replica or drop co-bucketed
      // rows
      if (nBuckets.isDefined) BucketedLayout.recoverSwap(spark, basePath)
      else Fs.recoverReplace(spark, s"$basePath.staging", basePath)
      // "exists" must mean "holds a readable dataset": a marker-only
      // shell (all rows deleted, or an aborted bootstrap) has no
      // parquet footer to infer a schema from and would wedge every
      // later trigger
      val f = Fs.fs(spark, basePath)
      val baseExists = nBuckets match {
        case Some(_) => f.exists(new Path(basePath)) &&
          f.listStatus(new Path(basePath))
            .exists(_.getPath.getName.startsWith(s"${BucketedLayout.GB}="))
        case None => Fs.hasFileWithSuffix(spark, basePath, ".parquet")
      }
      // the buckets this batch touches — prunes BOTH the step-1
      // retract read and the step-2 merge read to O(batch) partitions
      val touched: Seq[Int] = nBuckets match {
        case Some(n) if baseExists =>
          ups.select(pkCols.map(col): _*)
            .unionByName(delKeys).distinct()
            .select(BucketedLayout.bucketExpr(pkCols, n).as("gb"))
            .distinct().collect().map(_.getInt(0)).toIndexedSeq
        case _ => Nil
      }
      val base =
        if (!baseExists) ups.limit(0)
        else nBuckets match {
          case Some(_) =>
            spark.read.parquet(basePath)
              .filter(col(BucketedLayout.GB).isin(touched: _*))
              .drop(BucketedLayout.GB)
          case None => spark.read.parquet(basePath)
        }

      // 1. the batch's aggregate delta, computed against the PRE-batch
      //    base — append it as this batch's own partition, compact,
      //    THEN stamp. A replay with the stamp skips (the base may
      //    have advanced); one without it recomputes the identical
      //    delta and re-enters a half-finished compaction under the
      //    SAME derived base id (whose exists-guard skips straight to
      //    the source deletes — no delta is ever folded twice). A
      //    stamp AHEAD of the batch id means a fresh checkpoint was
      //    pointed at an old store: folding would silently skip and
      //    the view would diverge from the base — refuse instead.
      val stamp = readStamp(spark, aggPath)
      if (stamp.exists(_ > batchId))
        throw new IllegalStateException(
          s"$aggPath was maintained up to batch ${stamp.get}, but this stream is " +
            s"at batch $batchId — a fresh checkpoint against an existing store " +
            "would silently skip folds. Start a fresh aggPath/basePath, or keep " +
            "the original checkpoint.")
      if (!stamp.contains(batchId)) {
        val delta = AggMaintain.deltas(
          AggMaintain.replacedRows(base, ups, delKeys, pkCols), ups, grpCols, valCol)
          .localCheckpoint() // materialize once: the emptiness gate AND the write
        // an empty delta (e.g. an all-tombstone bootstrap batch) must
        // not write: a zero-row partitioned write into a store that
        // does not exist yet would publish a schema-less _SUCCESS
        // shell that wedges readAgg's schema inference
        if (!delta.isEmpty) {
          delta.withColumn("batch", lit(batchId))
            .write.partitionBy("batch")
            .option("partitionOverwriteMode", "dynamic")
            .mode("overwrite").parquet(aggPath)
          compactDeltas(spark, aggPath, batchId, grpCols, maxDeltaDirs)
        }
        writeStamp(spark, aggPath, batchId)
      }

      // 2. idempotent base apply
      nBuckets match {
        case Some(n) =>
          if (baseExists) {
            // base is already pruned to the touched partitions; merge
            // + delete, swap exactly those back. No checkpoint and no
            // kept-bucket collect: overwriteBuckets stages the merge
            // output before deleting anything (the pre-swap read never
            // races the swap) and clears only touched buckets its own
            // staged partitions did not survive into — two driver
            // actions gone from every bucketed trigger
            val merged = Merge.applyDeletes(
              Merge.upsert(base, ups, pkCols), delKeys, pkCols)
            BucketedLayout.overwriteBuckets(spark, merged, pkCols, n, basePath,
              clearBuckets = touched)
          } else if (!ups.isEmpty) {
            // an all-tombstone bootstrap batch has nothing to write —
            // a partitioned write of zero rows would publish a
            // schema-less marker shell (`ups` filters the checkpointed
            // `latest`, so the emptiness probe reads local blocks)
            BucketedLayout.writeFull(spark, ups, pkCols, n, basePath)
          }
        case None =>
          val merged =
            if (baseExists)
              Merge.applyDeletes(Merge.upsert(base, ups, pkCols), delKeys, pkCols)
            else ups
          val staging = s"$basePath.staging"
          merged.write.mode("overwrite").parquet(staging)
          Fs.replace(spark, staging, basePath)
      }
      ()
    }

  /** Fold delta partitions older than `batchId - 1` into a single base
    * partition when more than `maxDirs` accumulated — log listing and
    * the [[readAgg]] fold stay bounded as the stream ages. Same
    * crash-safe recipe as the near-dup store's compaction: stage the
    * fold, rename to `batch=<negative base id>`, only then delete the
    * sources; a replayed trigger recomputes the same compaction, and
    * count/sum deltas are associative so a crash that leaves base +
    * undeleted sources only double-counts until the replay's delete
    * step — which the `!exists(basePath)` guard re-skips to.
    */
  private[graft] def compactDeltas(spark: SparkSession, aggPath: String,
                                   batchId: Long, grpCols: Seq[String],
                                   maxDirs: Int): Unit = {
    val f = Fs.fs(spark, aggPath)
    val root = new Path(aggPath)
    if (f.exists(root)) {
      val ids = f.listStatus(root).map(_.getPath.getName)
        .filter(_.startsWith("batch=")).map(_.stripPrefix("batch=").toLong)
      val baseId = -batchId - 2
      val srcs = ids.filter(id => id != baseId && id <= batchId - 2)
      val basePath = s"$aggPath/batch=$baseId"
      val staging = s"$aggPath/__staging_compact"
      if (f.exists(new Path(basePath))) {
        // this batch's compaction already published its base (a replay
        // after a crash mid-delete): the sources ARE folded — unlike
        // the near-dup store's candidate overlap, a leftover delta
        // source would DOUBLE-COUNT, so always finish the deletes,
        // even if the dir count has meanwhile dropped under maxDirs
        srcs.foreach(id => Fs.delete(spark, s"$aggPath/batch=$id"))
        Fs.delete(spark, staging)
      } else if (ids.length > maxDirs && srcs.nonEmpty) {
        spark.read.parquet(srcs.map(id => s"$aggPath/batch=$id").toIndexedSeq: _*)
          .groupBy(grpCols.map(col): _*)
          .agg(sum(col("d_count")).as("d_count"),
            sum(col("d_sum")).cast("decimal(28,2)").as("d_sum"))
          // all-zero groups carry no information — drop them so the
          // compacted base shrinks to the live group set
          .filter(col("d_count") =!= 0L || col("d_sum") =!= lit(BigDecimal(0)))
          .coalesce(1)
          .write.mode("overwrite").parquet(staging)
        if (!f.rename(new Path(staging), new Path(basePath)))
          throw new java.io.IOException(s"rename $staging -> $basePath failed")
        srcs.foreach(id => Fs.delete(spark, s"$aggPath/batch=$id"))
        Fs.delete(spark, staging)
      }
    }
  }

  /** Continuous maintenance of base + aggregate from a file-based
    * change feed. Returns the running query; callers own its
    * lifecycle. Read the maintained view with [[readAgg]].
    */
  def maintainStream(spark: SparkSession, sourceDir: String,
                     basePath: String, aggPath: String, checkpoint: String,
                     pkCols: Seq[String], grpCols: Seq[String], valCol: String,
                     versionColumn: Option[String] = None,
                     deleteCol: Option[String] = None,
                     nBuckets: Option[Int] = None,
                     maxFilesPerTrigger: Int = 10,
                     feedSchema: Option[org.apache.spark.sql.types.StructType] = None): StreamingQuery = {
    val schema = graft.util.Fs.feedSchema(spark, sourceDir, feedSchema)
    val feed = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(sourceDir)
    feed.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime("1 second"))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        foldBatch(spark, batch, batchId, basePath, aggPath,
          pkCols, grpCols, valCol, versionColumn, deleteCol, nBuckets)
      }
      .start()
  }
}
