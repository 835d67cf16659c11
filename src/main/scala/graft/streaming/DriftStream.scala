package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.ops.TextAnalysis

/** Streaming corpus-drift monitor — the production twin of
  * `Profile.tokenDrift` (SURVEY §2 C11r): every ingested micro-batch
  * is scored against a STATIC reference token distribution, and the
  * per-stratum drift lands in an append-only monitoring sink keyed by
  * batch id. The alert a crawl pipeline wants: "this dump's token
  * distribution left the mixture" BEFORE the batch is admitted to the
  * corpus.
  *
  * Add-one smoothing handles tokens absent from the reference (a
  * batch CAN contain novel tokens, unlike the all-in-one batch KL
  * where c_st > 0 ⇒ c_t > 0):
  *   drift_micro = Σ_t c_bt · round(ln( (c_bt·(N_r + V)) /
  *                                      ((c_rt + 1)·N_b) ) · 10⁶)
  * an exact long sum — order/partitioning independent, and replaying
  * a batch recomputes the identical row.
  *
  * Scale shape: the reference model is a vocab-sized (tok, cr)
  * aggregate built once; per trigger one batch-sized explode + one
  * (stratum, tok) partial agg joins it on the token key (both sides
  * pre-aggregated — no hot-key blowup), reference totals fold in as
  * one broadcast row. The monitor write is a deterministic
  * `batch=<id>` overwrite, so foreachBatch's at-least-once replays
  * are idempotent.
  */
object DriftStream {

  /** Vocab-sized (tok, cr) reference counts from a reference corpus. */
  def referenceModel(ref: DataFrame, textCol: String): DataFrame =
    ref.select(explode(split(TextAnalysis.normalize(col(textCol)), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy("tok").agg(count(lit(1)).as("cr"))

  /** Per-stratum smoothed drift of one batch vs the reference model:
    * (stratum, n_tokens, drift_micro).
    */
  def drift(batch: DataFrame, refModel: DataFrame,
            textCol: String, stratumCol: String): DataFrame = {
    val totals = refModel.agg(sum(col("cr")).as("nr"), count(lit(1)).as("v"))
    val cbt = batch
      .select(col(stratumCol).as("stratum"),
        explode(split(TextAnalysis.normalize(col(textCol)), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy("stratum", "tok").agg(count(lit(1)).as("cb"))
    val nb = cbt.groupBy("stratum").agg(sum("cb").as("nb"))
    cbt.join(refModel, Seq("tok"), "left")
      .join(broadcast(nb), Seq("stratum"))
      .crossJoin(broadcast(totals))
      .select(col("stratum"), col("cb"),
        round(log(col("cb").cast("double")
            * (col("nr") + col("v")).cast("double")
            / ((coalesce(col("cr"), lit(0L)) + 1L).cast("double")
              * col("nb").cast("double"))) * 1e6)
          .cast("long").as("q"))
      .groupBy("stratum")
      .agg(sum(col("cb")).as("n_tokens"),
        sum(col("cb") * col("q")).as("drift_micro"))
  }

  /** One monitor micro-batch (directly callable for backfills): the
    * drift rows overwrite a deterministic `batch=<id>` partition of
    * the monitor sink — pure function of (batch, reference), so
    * at-least-once replay rewrites identical bytes.
    */
  def driftBatch(batch: DataFrame, refModel: DataFrame, batchId: Long,
                 monitorDir: String, textCol: String,
                 stratumCol: String): Unit = if (!batch.isEmpty) {
    drift(batch, refModel, textCol, stratumCol)
      .write.mode("overwrite").parquet(s"$monitorDir/batch=$batchId")
  }

  /** File-fed monitor stream: reads new parquet files under
    * `sourceDir`, scores each trigger against the reference corpus at
    * `refDir`, appends per-batch drift rows under `monitorDir`.
    */
  def driftStream(spark: SparkSession, sourceDir: String, refDir: String,
                  monitorDir: String, checkpoint: String,
                  textCol: String, stratumCol: String,
                  maxFilesPerTrigger: Int = 10,
                  feedSchema: Option[org.apache.spark.sql.types.StructType] = None): StreamingQuery = {
    val schema = graft.util.Fs.feedSchema(spark, sourceDir, feedSchema)
    // vocab-sized, reused every trigger for the stream's lifetime:
    // materialize once, durably under spark.graft.checkpointDir (a
    // mid-stream executor loss must not strand the reference model)
    val refModel = graft.util.Lineage.truncate(
      referenceModel(spark.read.parquet(refDir), textCol))
    val feed = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(sourceDir)
    feed.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime("1 second"))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        driftBatch(batch, refModel, batchId, monitorDir, textCol, stratumCol)
      }
      .start()
  }
}
