package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.util.Hashing

/** Streaming per-group quantile monitor — `profile_quantiles_sketch`'s
  * ingestion twin, and the fourth monitoring axis next to DriftStream
  * (token distribution), AnomalyStream (metric moments), and
  * CardinalityStream (volume vs novelty): track each group's LIFETIME
  * p50/p90/p99 of a numeric column across the whole stream, so a feed
  * whose latency/length/score distribution shifts in the tail — the
  * part a mean-and-sigma monitor smooths over — is visible at the
  * trigger it happens.
  *
  * State is a MERGEABLE weighted bottom-k value sample: per group the
  * k distinct values with the smallest portable hashes, each carrying
  * its exact lifetime occurrence count. Bottom-k-by-hash membership is
  * MONOTONE — once a value is evicted, the k smaller hashes that
  * evicted it stay in state forever, so it can never re-enter — which
  * gives the invariant that every SURVIVING value's count is its
  * complete lifetime count (it was in every intermediate sample since
  * first seen). Hence:
  *
  *  - below saturation (≤ k distinct values) the sample IS the full
  *    weighted value histogram and the reported quantiles are EXACT
  *    over the entire stream history (spec-pinned equality);
  *  - above saturation the sample is a uniform subsample of distinct
  *    values with exact weights — the standard KMV trade, error
  *    ~1/sqrt(k) in rank;
  *  - merge is union + count-sum + re-select: computed from the k-row
  *    state and the batch's own value aggregate, NEVER from history,
  *    so per-trigger cost is one batch-sized partial agg plus a
  *    window over ≤ k + |batch distinct values| rows per group, and
  *    state stays ≤ |groups|·k rows per version regardless of age.
  *
  * Quantiles are the LOWER weighted quantile (smallest sampled v with
  * cum·100 ≥ p·total) — an actual data value selected by integer
  * comparison, no interpolation arithmetic, so replays and recomputes
  * are byte-identical. The window orders by (v, h): h breaks the
  * measure-zero case of distinct values sharing a hash, keeping the
  * selection total-ordered.
  *
  * Versioning follows the exclude-own-writes discipline
  * (QuotaStream/CardinalityStream): `stateDir/batch=<id>` holds state
  * AFTER batch id, a trigger reads the newest version `< batchId`,
  * write order is report first then state, old versions pruned to
  * KEEP_VERSIONS. Rows with a NULL value advance the volume counters
  * but not the sample (count(col) semantics) — the monitor stays loud
  * when a feed starts emitting nulls.
  */
object QuantileStream {

  private val KEEP_VERSIONS = 4

  /** Newest state version strictly below `batchId`, if any:
    * (group, v, h, cnt, rows_seen) sample rows. */
  private def priorState(spark: SparkSession, stateDir: String,
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

  /** One monitoring micro-batch (directly callable for backfills).
    * Emits one report row per group PRESENT IN THE BATCH to
    * `outDir/batch=<id>`: (group, batch_rows, rows_seen, k_eff,
    * sampled_rows, p50, p90, p99) — rows_seen the group's lifetime
    * row count (nulls included), k_eff the sample's distinct-value
    * count, sampled_rows the exact row mass the sample covers
    * (= rows_seen minus null-valued rows when unsaturated).
    */
  def quantileBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
                    outDir: String, stateDir: String,
                    groupCol: String, valueCol: String, k: Int = 256)
      : Unit = if (!batch.isEmpty) {
    require(k >= 2, s"k must be >= 2, got $k")
    val prior = priorState(spark, stateDir, batchId)
    // canonical value key: double value + portable hash of its string
    // form, so integer and double feeds of the same numbers agree
    val v = col(valueCol).cast("double")
    val batchAgg = batch
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("batch_rows"))
      .localCheckpoint() // feeds the totals union AND the report join
    val batchSample = batch
      .filter(v.isNotNull)
      .groupBy(col(groupCol), v.as("v"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("h", Hashing.portableHash64(col("v").cast("string")))
    // merged sample: sum counts per (group, value) over state ∪ batch,
    // then re-select bottom-k by hash — membership monotonicity keeps
    // surviving counts exact (see object doc)
    val priorSample = prior.map(_.select(col(groupCol), col("v"), col("h"), col("cnt")))
      .getOrElse(batchSample.limit(0).select(col(groupCol), col("v"), col("h"), col("cnt")))
    val wk = Window.partitionBy(col(groupCol)).orderBy(col("h"), col("v"))
    val merged = batchSample.select(col(groupCol), col("v"), col("h"), col("cnt"))
      .unionByName(priorSample)
      .groupBy(col(groupCol), col("v"), col("h"))
      .agg(sum(col("cnt")).as("cnt"))
      .withColumn("__r", row_number().over(wk))
      .filter(col("__r") <= k)
      .drop("__r")
    // lifetime rows: union-aggregate of prior totals and batch totals
    // (never a join, so null groups need no special care)
    val priorTotals = prior
      .map(_.groupBy(groupCol).agg(max(col("rows_seen")).as("n")))
      .getOrElse(batchAgg.limit(0).select(col(groupCol), col("batch_rows").as("n")))
    val totals = batchAgg.select(col(groupCol), col("batch_rows").as("n"))
      .unionByName(priorTotals)
      .groupBy(groupCol).agg(sum(col("n")).as("rows_seen"))
    // totals drive a LEFT join to the sample: an all-null group keeps
    // one v-null state row so its lifetime count survives
    val state = totals.withColumnRenamed(groupCol, "__tg")
      .join(merged.select(col(groupCol).as("__mg"), col("v"), col("h"), col("cnt")),
        col("__tg") <=> col("__mg"), "left")
      .select(col("__tg").as(groupCol), col("v"), col("h"), col("cnt"),
        col("rows_seen"))
      .localCheckpoint() // one computation feeds the report AND the state write
    // lower weighted quantiles over the ≤ k sample rows per group
    val wcum = Window.partitionBy(col(groupCol)).orderBy(col("v"), col("h"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wtot = Window.partitionBy(col(groupCol))
    val quant = state
      .filter(col("v").isNotNull)
      .withColumn("__cum", sum(col("cnt")).over(wcum))
      .withColumn("__tot", sum(col("cnt")).over(wtot))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("k_eff"),
        max(col("__tot")).as("sampled_rows"),
        min(when(col("__cum") * 100 >= col("__tot") * 50, col("v"))).as("p50"),
        min(when(col("__cum") * 100 >= col("__tot") * 90, col("v"))).as("p90"),
        min(when(col("__cum") * 100 >= col("__tot") * 99, col("v"))).as("p99"))
    val lifetime = state.groupBy(groupCol)
      .agg(max(col("rows_seen")).as("rows_seen"))
    val report = batchAgg
      .join(lifetime.withColumnRenamed(groupCol, "__lg"),
        col(groupCol) <=> col("__lg"))
      .join(quant.withColumnRenamed(groupCol, "__qg"),
        col(groupCol) <=> col("__qg"), "left")
      .select(col(groupCol), col("batch_rows"), col("rows_seen"),
        coalesce(col("k_eff"), lit(0L)).as("k_eff"),
        coalesce(col("sampled_rows"), lit(0L)).as("sampled_rows"),
        col("p50"), col("p90"), col("p99"))
    report.write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
    state.write.mode("overwrite").parquet(s"$stateDir/batch=$batchId")
    val f = graft.util.Fs.fs(spark, stateDir)
    f.listStatus(new Path(stateDir)).map(_.getPath.getName)
      .filter(_.startsWith("batch="))
      .map(_.stripPrefix("batch=").toLong)
      .sorted.dropRight(KEEP_VERSIONS)
      .foreach(ver => graft.util.Fs.delete(spark, s"$stateDir/batch=$ver"))
  }

  /** File-fed monitoring stream: new parquet files under `sourceDir`
    * update the per-group samples; reports land under
    * `outDir/batch=<id>`.
    */
  def quantileStream(spark: SparkSession, sourceDir: String, outDir: String,
                     stateDir: String, checkpoint: String,
                     groupCol: String, valueCol: String, k: Int = 256,
                     maxFilesPerTrigger: Int = 10,
                     feedSchema: Option[org.apache.spark.sql.types.StructType] = None)
      : StreamingQuery = {
    val schema = graft.util.Fs.feedSchema(spark, sourceDir, feedSchema)
    val feed = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(sourceDir)
    feed.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime("1 second"))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        quantileBatch(spark, batch, batchId, outDir, stateDir,
          groupCol, valueCol, k)
      }
      .start()
  }
}
