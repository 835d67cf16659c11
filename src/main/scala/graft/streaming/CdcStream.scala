package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.cdc.Merge

/** Streaming CDC: the continuous (`-c`) mode of the reference
  * (main.go:60, polling loop) re-expressed as Structured Streaming.
  *
  * The reference polls the source and applies chunked upserts; here the
  * change feed is a file stream (new parquet files landing in the
  * source directory — the cluster-world shape of a CDC feed) and each
  * micro-batch applies the same Merge.upsert used in batch mode via
  * foreachBatch. Checkpointing replaces the state table for stream
  * progress; `maxFilesPerTrigger` is the throttle knob
  * (reference: throttlePercentage).
  *
  * At scale the target is hash-bucket partitioned (`nBuckets`): each
  * micro-batch reads and rewrites ONLY the partitions its keys hash
  * into — O(batch) I/O per trigger. A flat parquet target (the
  * stage-and-swap branch) remains for small tables; a transactional
  * table format would replace the swap with MERGE INTO.
  */
object CdcStream {

  /** Continuous upsert of a file-based change feed into a parquet
    * target. Returns the running query; callers own its lifecycle.
    *
    * A micro-batch can carry SEVERAL change rows for one PK (two feed
    * files landing in one trigger), so each batch is collapsed to one
    * row per PK before the upsert: by highest `versionColumn` when
    * given (last-writer-wins), else by an arbitrary-but-deterministic
    * struct max over the payload — pass the version column whenever
    * the feed has one.
    */
  def upsertStream(spark: SparkSession, sourceDir: String, targetPath: String,
                   checkpoint: String, pkCols: Seq[String],
                   maxFilesPerTrigger: Int = 10,
                   versionColumn: Option[String] = None,
                   nBuckets: Option[Int] = None): StreamingQuery = {
    val schema = spark.read.parquet(sourceDir).schema
    val feed = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(sourceDir)

    feed.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime("1 second"))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val vcol = versionColumn.getOrElse(
          batch.columns.filterNot(pkCols.contains).head)
        val latest = Merge.latestByKey(batch, pkCols, vcol)
        nBuckets match {
          case Some(n) =>
            // bucketed target: merge touches ONLY the partitions this
            // micro-batch's keys hash into — O(batch) I/O per trigger,
            // not O(target). This is the scale shape; the flat-target
            // branch below survives for small tables and demos.
            import graft.cdc.BucketedLayout
            if (graft.util.Fs.existsNonEmpty(spark, targetPath)) {
              val affected = latest
                .select(BucketedLayout.bucketExpr(pkCols, n).as("gb"))
                .distinct().collect().map(_.getInt(0)).toSeq
              val base = spark.read.parquet(targetPath)
                .filter(col(BucketedLayout.GB).isin(affected: _*))
                .drop(BucketedLayout.GB)
              BucketedLayout.overwriteBuckets(spark,
                Merge.upsert(base, latest, pkCols), pkCols, n, targetPath)
            } else BucketedLayout.writeFull(spark, latest, pkCols, n, targetPath)
          case None =>
            val merged =
              if (graft.util.Fs.hasFileWithSuffix(spark, targetPath, ".parquet")) {
                Merge.upsert(spark.read.parquet(targetPath), latest, pkCols)
              } else latest
            // stage then MOVE (not re-write): the merged frame reads the
            // files the overwrite would replace, and a second Spark write
            // would double the I/O per micro-batch
            val staging = s"$targetPath.staging"
            merged.write.mode("overwrite").parquet(staging)
            graft.util.Fs.replace(spark, staging, targetPath)
        }
        ()
      }
      .start()
  }

  /** Streaming exact dedup on a key within an event-time watermark —
    * the streaming member of the dedup family (SURVEY C-block):
    * `dropDuplicatesWithinWatermark` keeps state bounded, unlike a
    * naive global dropDuplicates.
    */
  def dedupStream(feed: DataFrame, tsCol: String, keyCols: Seq[String],
                  watermark: String = "10 minutes"): DataFrame =
    feed.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)
}
