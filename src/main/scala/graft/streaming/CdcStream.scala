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
  * At scale the target would be a transactional table format; with
  * plain parquet we stage-and-swap per batch, which keeps the demo
  * self-contained while the merge plan itself is the production one.
  */
object CdcStream {

  /** Continuous upsert of a file-based change feed into a parquet
    * target. Returns the running query; callers own its lifecycle.
    */
  def upsertStream(spark: SparkSession, sourceDir: String, targetPath: String,
                   checkpoint: String, pkCols: Seq[String],
                   maxFilesPerTrigger: Int = 10): StreamingQuery = {
    val schema = spark.read.parquet(sourceDir).schema
    val feed = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(sourceDir)

    feed.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime("1 second"))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val tgt = new java.io.File(targetPath)
        val merged =
          if (tgt.exists() && tgt.listFiles() != null &&
              tgt.listFiles().exists(_.getName.endsWith(".parquet"))) {
            Merge.upsert(spark.read.parquet(targetPath), batch, pkCols)
          } else batch
        // stage then MOVE (not re-write): the merged frame reads the
        // files the overwrite would replace, and a second Spark write
        // would double the I/O per micro-batch
        val staging = new java.io.File(s"$targetPath.staging")
        merged.write.mode("overwrite").parquet(staging.toString)
        if (tgt.exists()) org.apache.commons.io.FileUtils.deleteDirectory(tgt)
        org.apache.commons.io.FileUtils.moveDirectory(staging, tgt)
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
