package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.sim.GraphAnnIndex

/** Streaming graph-ANN index maintenance —
  * [[graft.sim.GraphAnnIndex]]'s ingestion twin (the IvfStream shape
  * for the HNSW-lineage store): a file feed of embedding batches
  * continuously INSERTS into the persisted graph — each trigger's
  * vectors beam-search the pre-trigger graph for their neighbors and
  * land their node rows plus forward+reverse edges as
  * `batch=<batchBase + micro-batch id>` — while each trigger also
  * writes a one-row HEALTH report (the [[GraphAnnIndex.stats]]
  * degree/dead-edge readout) under `<store>/health/`, the signal that
  * schedules the only O(corpus) operations — a diversified rebuild or
  * a tombstone [[graft.sim.GraphAnnIndex.vacuum]] — OUTSIDE the
  * stream (the IvfStream recluster-decision handoff discipline). A
  * vacuum slot that runs while this stream is live must pass the
  * store's `_graft_batch` stamp ([[readStamp]]) as vacuum's
  * `upToBatch`: folding an in-flight trigger's rows into the negative
  * base would defeat its replay's exclude-own-writes read (the fold
  * bound + tombstone-retention contract is documented on vacuum).
  *
  * Replay-safe under foreachBatch's at-least-once contract twice
  * over: the insert reads only versions `< batchId` (the
  * exclude-own-writes discipline — a replayed trigger recomputes
  * identical edges) and writes land in partitions keyed by the
  * micro-batch id (dynamic-partition overwrite — a replayed trigger
  * rewrites exactly its own directories). `batchBase` keeps stream
  * batch ids clear of ids already in the store and MONOTONE above
  * them, which the exclude-own-writes read requires.
  */
object GraphAnnStream {

  private val STAMP = "_graft_batch"

  private[graft] def readStamp(spark: SparkSession, dir: String): Option[Long] =
    graft.util.Fs.readSmallText(spark, dir, STAMP).flatMap(_.toLongOption)

  private[graft] def writeStamp(spark: SparkSession, dir: String, id: Long): Unit =
    graft.util.Fs.writeSmallText(spark, dir, STAMP, id.toString)

  /** One trigger's work, exposed for direct spec drive (the ivfBatch
    * convention): insert the batch at `batch=<storeBatchId>`, write
    * the health row. Returns the health report.
    */
  def graphBatch(spark: SparkSession, batch: DataFrame, vecCol: String,
                 idCol: String, store: String, storeBatchId: Long,
                 connectK: Int, entries: Int, beam: Int, rounds: Int,
                 dim: Int): DataFrame = {
    // fresh-checkpoint guard (the JoinStream/AggStream refusal): a new
    // checkpoint (or a second stream) restarts foreachBatch ids at 0,
    // and a COLLIDING storeBatchId would dynamic-overwrite an existing
    // ingestion batch with unrelated vectors while the
    // exclude-own-writes read (versions < batchId) hides every later
    // batch — silent data loss linked against a stale snapshot. The
    // stamp is the store's high-water mark; a replay of the stamped id
    // itself is the legitimate at-least-once case and recomputes
    // identical content.
    readStamp(spark, store).foreach { hw =>
      if (storeBatchId < hw)
        throw new IllegalStateException(
          s"$store was ingested up to batch $hw, but this stream is at " +
            s"batch $storeBatchId — a fresh checkpoint against an existing " +
            "store would overwrite prior ingestion batches. Keep the " +
            "original checkpoint, or raise batchBase above the stamp.")
    }
    GraphAnnIndex.insert(spark, batch, vecCol, idCol, store, storeBatchId,
      connectK, entries, beam, rounds, dim)
    writeStamp(spark, store, storeBatchId)
    val health = GraphAnnIndex.stats(spark, store)
    health.withColumn("batch", lit(storeBatchId))
      .repartition(1)
      .write.partitionBy("batch")
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite").parquet(s"$store/health")
    health
  }

  /** The running stream; callers own its lifecycle. Embedding feeds
    * are append-only dumps, so the feed schema pins at start.
    */
  def graphStream(spark: SparkSession, sourceDir: String, store: String,
                  vecCol: String, idCol: String, checkpoint: String,
                  connectK: Int, entries: Int, beam: Int, rounds: Int,
                  dim: Int, batchBase: Long = 1000000L,
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
          graphBatch(spark, batch, vecCol, idCol, store, batchBase + id,
            connectK, entries, beam, rounds, dim)
        }
        ()
      }
      .start()
  }

  /** The health log — one stats row per non-empty trigger. */
  def health(spark: SparkSession, store: String): DataFrame =
    spark.read.option("basePath", s"$store/health")
      .parquet(s"$store/health")
}
