package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.util.Hashing

/** Streaming per-group quota admission — the ingestion twin of
  * `Sampling.groupCap` (SURVEY §2 C11w): admit at most `quota` docs
  * per group (domain, source) ACROSS the whole stream life, so a
  * link-farm domain cannot flood the corpus no matter how many
  * crawl dumps it spans. Within a trigger the admitted subset is
  * chosen in deterministic hash order (groupCap's uniform-sample
  * property); across triggers it is first-come by batch id, which is
  * the admission-order semantics every ingest filter has
  * (`exactDedupStream`'s contract).
  *
  * State = CUMULATIVE per-group admitted counts, VERSIONED by batch:
  * `stateDir/batch=<id>` holds the totals AFTER batch id. A trigger
  * reads only versions `< batchId` (the newest such), so an
  * at-least-once replay of batch B sees exactly the pre-B state and
  * recomputes byte-identical output + state — the same
  * exclude-own-writes discipline as the near-dup store's probe.
  * Write order: output first, state last; a crash between the two
  * replays to an identical recompute, never to a count whose docs
  * were dropped. Old versions beyond a small keep window are pruned
  * (state is |groups| rows per version — listing stays bounded).
  *
  * Scale shape: per trigger one batch-sized group exchange +
  * in-partition sort (groupCap's plan) against a broadcast
  * |groups|-row state table; nothing driver-side grows with the
  * corpus.
  */
object QuotaStream {

  private val KEEP_VERSIONS = 4

  /** Latest state version strictly below `batchId`, if any. */
  private def priorCounts(spark: SparkSession, stateDir: String,
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

  /** One admission micro-batch (directly callable for backfills). */
  def quotaBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
                 outDir: String, stateDir: String,
                 groupCol: String, idCol: String, quota: Int,
                 salt: String = "graft"): Unit = if (!batch.isEmpty) {
    import org.apache.spark.sql.expressions.Window
    require(quota >= 1, s"quota must be >= 1, got $quota")
    val prior = priorCounts(spark, stateDir, batchId)
      .getOrElse(spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("__grp",
            batch.schema(groupCol).dataType),
          org.apache.spark.sql.types.StructField("admitted",
            org.apache.spark.sql.types.LongType)))))
      .withColumnRenamed("__grp", groupCol)
      .localCheckpoint() // read state ONCE: it feeds admission AND the new version
    val h = Hashing.portableHash64(
      concat(lit(salt + ":quota:"), col(idCol).cast("string")))
    val w = Window.partitionBy(col(groupCol)).orderBy(col("__h"), col(idCol))
    // null-safe (<=>) joins throughout: a NULL group key is still ONE
    // group — a plain equi-join never matches it, so every trigger
    // would re-admit `quota` null-group rows and the state merge would
    // stack duplicate null-key rows across versions
    val admitted = batch
      .withColumn("__h", h)
      .withColumn("__r", row_number().over(w).cast("long"))
      .join(broadcast(prior.withColumnRenamed(groupCol, "__pg")),
        col(groupCol) <=> col("__pg"), "left")
      .filter(col("__r") <= lit(quota.toLong) - coalesce(col("admitted"), lit(0L)))
      .drop("__h", "__r", "admitted", "__pg")
      .localCheckpoint() // feeds the output AND the count delta
    admitted.write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
    val next = prior
      .join(admitted.groupBy(groupCol).agg(count(lit(1)).as("__d"))
          .withColumnRenamed(groupCol, "__dg"),
        col(groupCol) <=> col("__dg"), "full_outer")
      .select(
        // the true key is null only when BOTH sides are null → coalesce
        // yields null, which is exactly the null-key group's state row
        coalesce(col(groupCol), col("__dg")).as(groupCol),
        (coalesce(col("admitted"), lit(0L)) + coalesce(col("__d"), lit(0L)))
          .as("admitted"))
    next.write.mode("overwrite").parquet(s"$stateDir/batch=$batchId")
    // prune old versions; never the newest KEEP_VERSIONS (replay only
    // ever reaches back to the last uncommitted batch, but a window
    // costs |groups| rows per version and buys slack)
    val f = graft.util.Fs.fs(spark, stateDir)
    f.listStatus(new Path(stateDir)).map(_.getPath.getName)
      .filter(_.startsWith("batch="))
      .map(_.stripPrefix("batch=").toLong)
      .sorted.dropRight(KEEP_VERSIONS)
      .foreach(v => graft.util.Fs.delete(spark, s"$stateDir/batch=$v"))
  }

  /** File-fed admission stream: new parquet files under `sourceDir`
    * pass the per-group quota gate; admitted rows land under
    * `outDir/batch=<id>`.
    */
  def quotaStream(spark: SparkSession, sourceDir: String, outDir: String,
                  stateDir: String, checkpoint: String,
                  groupCol: String, idCol: String, quota: Int,
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
        quotaBatch(spark, batch, batchId, outDir, stateDir, groupCol, idCol,
          quota)
      }
      .start()
  }
}
