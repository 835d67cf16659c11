package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming per-group HEAVY-HITTER monitor — the ingestion twin of
  * the batch `q_heavy_hitters` profiler (SURVEY §2 B13): track each
  * group's dominant items (hot keys, hot domains, hot shingles) with
  * BOUNDED state, so a single source suddenly flooding one value —
  * a stuck crawler, a template page, a skew key about to melt a
  * downstream join — is visible at the trigger it happens.
  * CardinalityStream watches volume vs novelty; this watches WHERE
  * the volume concentrates.
  *
  * Summary: Misra–Gries with k counters per group (Misra & Gries
  * 1982; the MERGEABLE form of Agarwal et al., PODS 2012): merge =
  * add counters item-wise, then subtract the (k+1)-th largest count
  * from every counter and drop the non-positive. Guarantees, all
  * deterministic integers (engine-exact, replay-idempotent):
  *  - stored count ≤ true count ≤ stored count + `decremented`
  *    (the group's cumulative subtraction total, reported per row);
  *  - any item with true frequency > n/(k+1) is ALWAYS present;
  *  - with ≤ k distinct items per group the counts are EXACT.
  *
  * Per-trigger cost: one batch-sized partial-agg count + a window
  * over ≤ k + |batch items| rows per group; state stays ≤ k+1 rows
  * per group per version (k counters + one bookkeeping row)
  * regardless of stream age. Versioning follows QuotaStream's
  * exclude-own-writes discipline (`stateDir/batch=<id>` written
  * AFTER the report, newest version `< batchId` read, pruned to
  * KEEP_VERSIONS); the in-trigger truncation is `localCheckpoint`
  * by design (Lineage.scala: streaming re-runs a failed trigger
  * from checkpointed offsets).
  */
object TopKStream {

  private val KEEP_VERSIONS = 4

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
    * Emits one row per surviving counter of every group PRESENT IN
    * THE BATCH to `outDir/batch=<id>`:
    * (group, item, rank, est_min, decremented, lifetime_rows, hh_ppm)
    * with est_min the stored (lower-bound) count, `decremented` the
    * group's cumulative MG subtraction (upper bound = est_min +
    * decremented), and hh_ppm = 10⁶·est_min div lifetime_rows.
    *
    * State rows: (group, item, cnt) counters plus one item-NULL
    * bookkeeping row per group carrying (rows_seen, dec) — NULL item
    * values in the feed are counted in rows_seen but never become
    * counters (count(col) semantics), mirroring CardinalityStream's
    * null-feed alerting: a feed gone all-null keeps advancing volume
    * while its counters stall.
    */
  def topkBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
                outDir: String, stateDir: String,
                groupCol: String, itemCol: String, k: Int = 64)
      : Unit = if (!batch.isEmpty) {
    require(k >= 1, s"k must be >= 1, got $k")
    val prior = priorState(spark, stateDir, batchId)
    val batchCounts = batch.groupBy(groupCol)
      .agg(count(lit(1)).as("batch_rows"))
    val batchItems = batch.select(col(groupCol), col(itemCol).as("item"))
      .filter(col("item").isNotNull)
      .groupBy(groupCol, "item").agg(count(lit(1)).as("cnt"))
    val priorCounters = prior.map(_.filter(col("item").isNotNull)
        .select(col(groupCol), col("item"), col("cnt")))
      .getOrElse(batchItems.limit(0))
    // bookkeeping values are DENORMALIZED onto every state row of the
    // group (counter rows carry them too; a counter-less group keeps
    // one item-null row) — recover them with a max roll-up, the
    // CardinalityStream pattern
    val priorBook = prior.map(_.groupBy(groupCol)
        .agg(max(col("rows_seen")).as("rows_seen"), max(col("dec")).as("dec")))
      .getOrElse(batchCounts.limit(0).select(col(groupCol),
        col("batch_rows").as("rows_seen"), col("batch_rows").as("dec")))
    // MG merge: item-wise counter sum, then subtract the (k+1)-th
    // largest count per group and drop non-positive counters. The
    // (cnt desc, item asc) window is a TOTAL order, so ties at the
    // boundary resolve identically on every run and engine.
    val summed = batchItems.unionByName(priorCounters)
      .groupBy(groupCol, "item").agg(sum("cnt").as("cnt"))
    val w = Window.partitionBy(groupCol)
      .orderBy(col("cnt").desc, col("item"))
    val wg = Window.partitionBy(groupCol)
    val ranked = summed.withColumn("r", row_number().over(w))
      .withColumn("c_kp1",
        max(when(col("r") === k + 1, col("cnt")).otherwise(lit(0L))).over(wg))
    val counters = ranked
      .filter(col("r") <= k && col("cnt") > col("c_kp1"))
      .select(col(groupCol), col("item"),
        (col("cnt") - col("c_kp1")).as("cnt"))
    // bookkeeping: lifetime rows (prior + batch) and cumulative
    // decrement (prior + this trigger's c_kp1) — union-aggregates,
    // NULL group keys form one group natively
    val decNow = ranked.filter(col("r") === 1)
      .select(col(groupCol), col("c_kp1").as("d"))
    val book = batchCounts.select(col(groupCol),
        col("batch_rows").as("n"), lit(0L).as("d"))
      .unionByName(priorBook.select(col(groupCol),
        col("rows_seen").as("n"), col("dec").as("d")))
      .unionByName(decNow.select(col(groupCol), lit(0L).as("n"), col("d")))
      .groupBy(groupCol)
      .agg(sum("n").as("rows_seen"), sum("d").as("dec"))
    val state = book.withColumnRenamed(groupCol, "__bg")
      .join(counters.select(col(groupCol).as("__cg"), col("item"), col("cnt")),
        col("__bg") <=> col("__cg"), "left")
      .select(col("__bg").as(groupCol), col("item"), col("cnt"),
        col("rows_seen"), col("dec"))
      .localCheckpoint() // one computation feeds the report AND the state write
    val report = state
      .join(batchCounts.select(col(groupCol).as("__rg")),
        col(groupCol) <=> col("__rg"))
      .filter(col("item").isNotNull)
      .withColumn("rank", row_number().over(Window.partitionBy(groupCol)
        .orderBy(col("cnt").desc, col("item"))))
      .select(col(groupCol), col("item"), col("rank").cast("long").as("rank"),
        col("cnt").as("est_min"), col("dec").as("decremented"),
        col("rows_seen").as("lifetime_rows"))
      .withColumn("hh_ppm",
        expr("est_min * 1000000 div greatest(lifetime_rows, 1)"))
    report.write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
    state.write.mode("overwrite").parquet(s"$stateDir/batch=$batchId")
    val f = graft.util.Fs.fs(spark, stateDir)
    f.listStatus(new Path(stateDir)).map(_.getPath.getName)
      .filter(_.startsWith("batch="))
      .map(_.stripPrefix("batch=").toLong)
      .sorted.dropRight(KEEP_VERSIONS)
      .foreach(v => graft.util.Fs.delete(spark, s"$stateDir/batch=$v"))
  }

  /** File-fed monitoring stream: new parquet files under `sourceDir`
    * update the per-group summaries; reports land under
    * `outDir/batch=<id>`.
    */
  def topkStream(spark: SparkSession, sourceDir: String, outDir: String,
                 stateDir: String, checkpoint: String,
                 groupCol: String, itemCol: String, k: Int = 64,
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
        topkBatch(spark, batch, batchId, outDir, stateDir,
          groupCol, itemCol, k)
      }
      .start()
  }
}
