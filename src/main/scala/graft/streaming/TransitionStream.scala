package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming Markov TRANSITION-DRIFT monitor — the ingestion twin of
  * the batch `q_markov_transitions` matrix (SURVEY §2 B42): per
  * trigger, count state→next transitions over per-key event
  * sequences, fold them into the lifetime matrix, and alert when a
  * transition's batch-local probability deviates from its lifetime
  * probability — a broken client suddenly looping view→view, a funnel
  * step silently dropping out, a bot swarm skewing signup→purchase,
  * all visible at the trigger they start.
  *
  * Sequence continuity across triggers is EXACT: the state carries
  * each key's LAST event (bounded by key cardinality), prepended to
  * the next batch before the lag window — so an event pair split
  * across two triggers counts exactly once (the pair attributes to
  * the trigger carrying its SECOND element; prepended rows provide
  * lag context only and never re-count). The spec pins
  * split-vs-single-batch equality.
  *
  * All integers: counts are BIGINT, probabilities floor-ppm,
  * deviation |batch_ppm − lifetime_ppm| where lifetime EXCLUDES the
  * current batch (drift compares new against established). State
  * versioning follows the QuotaStream exclude-own-writes discipline
  * (`.../batch=<id>` written AFTER the report, newest version
  * `< batchId` read, pruned to KEEP_VERSIONS) — a replayed trigger
  * recomputes identical outputs.
  *
  * Per-trigger cost: one key-partitioned window over batch+|keys in
  * batch| rows, two partial aggs; state is |keys| last-event rows +
  * the |states|² count matrix — never stream-age-sized.
  */
object TransitionStream {

  private val KEEP_VERSIONS = 4

  private def prior(spark: SparkSession, dir: String, batchId: Long)
      : Option[DataFrame] = {
    val f = graft.util.Fs.fs(spark, dir)
    val root = new Path(dir)
    if (!f.exists(root)) None
    else f.listStatus(root).map(_.getPath.getName)
      .filter(_.startsWith("batch="))
      .map(_.stripPrefix("batch=").toLong)
      .filter(_ < batchId)
      .sorted.lastOption
      .map(v => spark.read.parquet(s"$dir/batch=$v"))
  }

  private def prune(spark: SparkSession, dir: String): Unit = {
    val f = graft.util.Fs.fs(spark, dir)
    if (f.exists(new Path(dir)))
      f.listStatus(new Path(dir)).map(_.getPath.getName)
        .filter(_.startsWith("batch="))
        .map(_.stripPrefix("batch=").toLong)
        .sorted.dropRight(KEEP_VERSIONS)
        .foreach(v => graft.util.Fs.delete(spark, s"$dir/batch=$v"))
  }

  /** One monitoring micro-batch (directly callable for backfills).
    * Emits to `outDir/batch=<id>` one row per transition PRESENT IN
    * THE BATCH: (state, next_state, batch_n, lifetime_n, batch_ppm,
    * lifetime_ppm, dev_ppm, alert) — lifetime/dev NULL when the
    * state has no prior history (nothing established to drift from).
    */
  def transitionBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
                      outDir: String, stateDir: String, keyCol: String,
                      tsMsCol: String, tieCol: String, stateCol: String,
                      tolPpm: Long, minCount: Long): Unit =
    if (!batch.isEmpty) {
      val lastDir = s"$stateDir/last"
      val cntDir = s"$stateDir/counts"
      val ev = batch.select(col(keyCol).as("k"),
        col(tsMsCol).cast("long").as("ms"), col(tieCol).cast("long").as("tie"),
        col(stateCol).as("st"), lit(true).as("cur"))
      val priorLast = prior(spark, lastDir, batchId)
        .map(_.withColumn("cur", lit(false)))
        .getOrElse(ev.limit(0))
      val combined = ev.unionByName(priorLast)
      val w = Window.partitionBy("k").orderBy(col("ms").asc, col("tie").asc)
      // pairs attribute to the row carrying the SECOND element, and
      // only CURRENT rows count — prepended last-events are lag
      // context, already counted by their own trigger
      val pairs = combined
        .withColumn("prev_st", lag(col("st"), 1).over(w))
        .filter(col("cur") && col("prev_st").isNotNull)
        .groupBy(col("prev_st").as("state"), col("st").as("next_state"))
        .agg(count(lit(1)).as("batch_n"))
      val priorCnt = prior(spark, cntDir, batchId)
        .getOrElse(pairs.limit(0).select(col("state"), col("next_state"),
          col("batch_n").as("lifetime_n")))
      // report BEFORE state writes (exclude-own-writes). The prior
      // per-state total sums over ALL established transitions out of
      // the state (not just those present in the batch) — otherwise a
      // batch flooding one transition would compare against a
      // denominator missing every transition it starved out
      val wS = Window.partitionBy("state")
      val priorTot = priorCnt.groupBy("state")
        .agg(sum("lifetime_n").as("prior_tot"))
      val report = pairs
        .join(priorCnt.withColumnRenamed("lifetime_n", "prior_n"),
          Seq("state", "next_state"), "left")
        .join(priorTot, Seq("state"), "left")
        .withColumn("prior_n", coalesce(col("prior_n"), lit(0L)))
        .withColumn("prior_tot", coalesce(col("prior_tot"), lit(0L)))
        .withColumn("batch_tot", sum("batch_n").over(wS))
        .withColumn("batch_ppm",
          expr("batch_n * 1000000 DIV batch_tot"))
        .withColumn("lifetime_ppm",
          when(col("prior_tot") > 0L,
            expr("prior_n * 1000000 DIV prior_tot")))
        .withColumn("dev_ppm", abs(col("batch_ppm") - col("lifetime_ppm")))
        .withColumn("alert",
          coalesce(col("dev_ppm") > tolPpm, lit(false)) &&
            col("batch_n") >= minCount)
        .select(col("state"), col("next_state"), col("batch_n"),
          col("prior_n").as("lifetime_n"), col("batch_ppm"),
          col("lifetime_ppm"), col("dev_ppm"), col("alert"))
        .localCheckpoint()
      report.write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
      // fold the lifetime matrix and advance the per-key last event
      val newCnt = priorCnt.select(col("state"), col("next_state"),
          col("lifetime_n").as("n"))
        .unionByName(pairs.select(col("state"), col("next_state"),
          col("batch_n").as("n")))
        .groupBy("state", "next_state").agg(sum("n").as("lifetime_n"))
      val newLast = combined.drop("cur")
        .withColumn("rn", row_number().over(
          Window.partitionBy("k").orderBy(col("ms").desc, col("tie").desc)))
        .filter(col("rn") === 1).drop("rn")
        .localCheckpoint()
      newCnt.write.mode("overwrite").parquet(s"$cntDir/batch=$batchId")
      newLast.write.mode("overwrite").parquet(s"$lastDir/batch=$batchId")
      prune(spark, cntDir); prune(spark, lastDir)
    }

  /** File-fed monitoring stream: new parquet files under `sourceDir`
    * update the transition matrix; reports land under
    * `outDir/batch=<id>`.
    */
  def transitionStream(spark: SparkSession, sourceDir: String,
                       outDir: String, stateDir: String, checkpoint: String,
                       keyCol: String, tsMsCol: String, tieCol: String,
                       stateCol: String, tolPpm: Long = 200000L,
                       minCount: Long = 10L,
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
        transitionBatch(spark, batch, batchId, outDir, stateDir,
          keyCol, tsMsCol, tieCol, stateCol, tolPpm, minCount)
      }
      .start()
  }
}
