package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming COLUMN-PROFILE drift monitor — `profile_table`'s
  * ingestion twin and the schema-health axis next to the value-level
  * monitors (DriftStream distributions, AnomalyStream moments,
  * FreshnessStream liveness): a crawler upgrade that starts emitting
  * 40% null `lang`, an extractor change that blanks `text`, a
  * serializer that turns absent fields into empty strings — each
  * shifts a column's null/blank SHARE long before any value-level
  * monitor trips, and each is invisible to them (they profile the
  * values that ARE there). Every trigger reports, per profiled
  * column, the batch's null/blank ppm against the cumulative baseline
  * of all PRIOR batches and flags columns whose share moved more than
  * `tolerancePpm`.
  *
  * Integer-exact: shares are x·10⁶ div n (pure long arithmetic), the
  * baseline is exact cumulative counts — no decaying averages, no
  * floats — so a replayed trigger recomputes byte-identical reports.
  * Cold start is honest: drift flags stay 0 until the baseline holds
  * `minBaseRows` rows (a 3-row first batch must not calibrate a
  * tolerance).
  *
  * Versioning follows the exclude-own-writes discipline:
  * `stateDir/batch=<id>` holds totals AFTER batch id, a trigger reads
  * the newest version `< batchId`, report writes before state, old
  * versions pruned to KEEP_VERSIONS. State is ONE row per profiled
  * column per version — bounded by |cols| forever, regardless of
  * stream age or key churn. Per-trigger cost: one stack-unpivot scan
  * of the batch (|cols|× row inflation, the tableProfile trade) into
  * a |cols|-row partial agg + a |cols|-row state merge.
  */
object ProfileStream {

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
    * Emits one report row per profiled column to `outDir/batch=<id>`:
    * (col_name, batch_rows, batch_null_ppm, batch_blank_ppm,
    * base_rows, base_null_ppm, base_blank_ppm, null_drift,
    * blank_drift).
    */
  def profileBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
                   outDir: String, stateDir: String, cols: Seq[String],
                   tolerancePpm: Long = 50000L, minBaseRows: Long = 100L)
      : Unit = if (!batch.isEmpty) {
    require(cols.nonEmpty, "profileBatch needs at least one column")
    require(tolerancePpm > 0, s"tolerancePpm must be positive, got $tolerancePpm")
    val prior = priorState(spark, stateDir, batchId)
    val stackArgs = cols.map(c => s"'$c', cast(`$c` as string)").mkString(", ")
    val bAgg = batch
      .selectExpr(s"stack(${cols.size}, $stackArgs) as (col_name, val)")
      .groupBy("col_name")
      .agg(count(lit(1)).as("batch_rows"),
        sum(when(col("val").isNull, 1L).otherwise(0L)).as("batch_null"),
        sum(when(col("val").isNotNull && trim(col("val")) === "", 1L)
          .otherwise(0L)).as("batch_blank"))
      .localCheckpoint() // feeds the report AND the state merge
    val priorS = prior
      .map(_.select(col("col_name"), col("rows_total"), col("null_total"),
        col("blank_total")))
      .getOrElse(bAgg.select(col("col_name"),
        col("batch_rows").as("rows_total"), col("batch_null").as("null_total"),
        col("batch_blank").as("blank_total")).limit(0))
    // full outer on the column name: a column absent from a non-empty
    // batch cannot happen (stack emits every col per row), but a
    // profiled-column change across a restart must not drop history
    val merged = priorS.withColumnRenamed("col_name", "__sc")
      .join(bAgg.withColumnRenamed("col_name", "__bc"),
        col("__sc") <=> col("__bc"), "full")
      .select(
        coalesce(col("__sc"), col("__bc")).as("col_name"),
        coalesce(col("rows_total"), lit(0L)).as("base_rows"),
        coalesce(col("null_total"), lit(0L)).as("base_null"),
        coalesce(col("blank_total"), lit(0L)).as("base_blank"),
        coalesce(col("batch_rows"), lit(0L)).as("batch_rows"),
        coalesce(col("batch_null"), lit(0L)).as("batch_null"),
        coalesce(col("batch_blank"), lit(0L)).as("batch_blank"))
      .localCheckpoint() // one computation feeds report and state
    val ppm = (x: String, n: String) =>
      when(col(n) > 0L, expr(s"($x * 1000000) div $n")).otherwise(lit(0L))
    val drift = (bp: String, rp: String) =>
      (col("base_rows") >= minBaseRows &&
        abs(col(bp) - col(rp)) > tolerancePpm).cast("int")
    val report = merged
      .withColumn("batch_null_ppm", ppm("batch_null", "batch_rows"))
      .withColumn("batch_blank_ppm", ppm("batch_blank", "batch_rows"))
      .withColumn("base_null_ppm", ppm("base_null", "base_rows"))
      .withColumn("base_blank_ppm", ppm("base_blank", "base_rows"))
      .withColumn("null_drift", drift("batch_null_ppm", "base_null_ppm"))
      .withColumn("blank_drift", drift("batch_blank_ppm", "base_blank_ppm"))
      .select("col_name", "batch_rows", "batch_null_ppm", "batch_blank_ppm",
        "base_rows", "base_null_ppm", "base_blank_ppm",
        "null_drift", "blank_drift")
    report.write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
    merged.select(col("col_name"),
        (col("base_rows") + col("batch_rows")).as("rows_total"),
        (col("base_null") + col("batch_null")).as("null_total"),
        (col("base_blank") + col("batch_blank")).as("blank_total"))
      .write.mode("overwrite").parquet(s"$stateDir/batch=$batchId")
    val f = graft.util.Fs.fs(spark, stateDir)
    f.listStatus(new Path(stateDir)).map(_.getPath.getName)
      .filter(_.startsWith("batch="))
      .map(_.stripPrefix("batch=").toLong)
      .sorted.dropRight(KEEP_VERSIONS)
      .foreach(ver => graft.util.Fs.delete(spark, s"$stateDir/batch=$ver"))
  }

  /** File-fed monitoring stream: new parquet files under `sourceDir`
    * advance the per-column profile baseline; reports land under
    * `outDir/batch=<id>`.
    */
  def profileStream(spark: SparkSession, sourceDir: String, outDir: String,
                    stateDir: String, checkpoint: String, cols: Seq[String],
                    tolerancePpm: Long = 50000L, minBaseRows: Long = 100L,
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
        profileBatch(spark, batch, batchId, outDir, stateDir, cols,
          tolerancePpm, minBaseRows)
      }
      .start()
  }
}
