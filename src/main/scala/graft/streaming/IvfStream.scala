package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.sim.IvfIndex

/** Streaming IVF index maintenance — [[graft.sim.IvfIndex]]'s
  * ingestion twin (the near-dup store discipline applied to the ANN
  * index): a file feed of embedding batches continuously assigns
  * against the PERSISTED quantizer and appends to the `gb=`-bucketed
  * inverted file, one `batch=<batchBase + micro-batch id>` partition
  * per trigger, while each trigger also writes its drift DECISION
  * (batch per-dimension means vs the stored seed profile) under
  * `<store>/decisions/` — the signal that schedules the only
  * O(corpus) operation, [[graft.sim.IvfIndex.recluster]], OUTSIDE the
  * stream (reclustering mid-trigger would block ingestion on a corpus
  * rebuild; the decision log is the handoff, exactly like the batch
  * Replicator's resync policy).
  *
  * Replay-safe under foreachBatch's at-least-once contract: both the
  * assignment append ([[graft.streaming.CdcStream.writeStorePartitions]]
  * dynamic-partition overwrite) and the decision row land in
  * partitions keyed by the micro-batch id, so a replayed trigger
  * rewrites exactly its own directories. `batchBase` keeps the
  * stream's batch ids clear of ids already in the store (build writes
  * `batch=0`).
  */
object IvfStream {

  /** One trigger's work, exposed for direct spec drive (the
    * quotaBatch convention): append the batch's assignments as
    * `batch=<storeBatchId>`, write the drift decision row. Returns the
    * decision (n_drifted, n_dims, decision).
    */
  def ivfBatch(spark: SparkSession, batch: DataFrame, vecCol: String,
               idCol: String, store: String, storeBatchId: Long, dim: Int,
               toleranceMicro: Long, minDriftedDims: Long = 1L): DataFrame = {
    IvfIndex.append(spark, batch, vecCol, idCol, store, storeBatchId, dim)
    val dec = IvfIndex.reclusterDecision(spark, store, batch, vecCol,
      toleranceMicro, minDriftedDims)
    dec.withColumn("batch", lit(storeBatchId))
      .repartition(1)
      .write.partitionBy("batch")
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite").parquet(s"$store/decisions")
    dec
  }

  /** The running stream; callers own its lifecycle. The feed schema
    * pins at start ([[graft.util.Fs.feedSchema]]); embedding feeds are
    * append-only dumps, so the CDC drift machinery does not apply.
    */
  def ivfStream(spark: SparkSession, sourceDir: String, store: String,
                vecCol: String, idCol: String, checkpoint: String, dim: Int,
                toleranceMicro: Long, minDriftedDims: Long = 1L,
                batchBase: Long = 1000000L,
                maxFilesPerTrigger: Int = 10): StreamingQuery = {
    val schema = graft.util.Fs.feedSchema(spark, sourceDir, None)
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(sourceDir)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime("1 second"))
      .foreachBatch { (batch: DataFrame, id: Long) =>
        if (!batch.isEmpty) {
          ivfBatch(spark, batch, vecCol, idCol, store, batchBase + id,
            dim, toleranceMicro, minDriftedDims)
        }
        ()
      }
      .start()
  }

  /** The decision log — (batch, n_drifted, n_dims, decision) rows, one
    * per non-empty trigger.
    */
  def decisions(spark: SparkSession, store: String): DataFrame =
    spark.read.option("basePath", s"$store/decisions")
      .parquet(s"$store/decisions")
}
