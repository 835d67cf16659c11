package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming per-key EMBEDDING-distribution drift monitor — the
  * vector-space member of the drift fleet (DriftStream watches token
  * KL, this watches the polynomial-kernel MMD of
  * [[graft.sim.Similarity.mmdPoly2]] between each key's lifetime
  * vector stream and a FROZEN reference sample): the alarm a serving
  * pipeline needs when an upstream embedder is silently swapped or
  * fine-tuned — the new vectors can keep their means and norms while
  * the covariance structure moves, which is exactly what the degree-2
  * kernel sees and a centroid monitor misses.
  *
  * Mechanics: per key the state is the exact integer GRAM accumulator
  * (d(d+1)/2 upper-triangle sums + the vector count — a few KB per
  * key, bounded forever); each trigger folds the batch's gram
  * (ONE d²/2-explode partial aggregate over the batch, the mmdPoly2
  * shape) into it by array addition, then scores the key against the
  * reference gram with the Frobenius contraction
  *
  *   MMD² = Σkxx/n² + Σkrr/m² − 2·Σkxr/(n·m),
  *
  * every contraction term BigInt-exact from the integer grams (the
  * doubles appear only in the final three divisions — deterministic,
  * so replays rebuild identical reports). Alarm when MMD² ≥
  * `alarmMicro`/10⁶ with at least `minRows` vectors; an alarm RESETS
  * the accumulator (re-arm, the Page–Hinkley contract) so the monitor
  * re-measures the post-change regime instead of alarming forever,
  * while rows_seen/n_alarms keep the audit trail.
  *
  * The reference is a parquet dir of embedding rows — BY CONTRACT a
  * bounded sample (thousands of vectors, the eval-set convention):
  * its gram is recomputed per trigger (cost |ref|·d²/2, trivial at
  * contract size) and collected once per trigger as 2·KB of longs.
  * Versioning is the exclude-own-writes discipline; report before
  * state; versions pruned.
  */
object EmbDriftStream {

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

  /** Upper-triangle gram pairs of a quantized vector column, in the
    * canonical (i, j) order the state arrays use. */
  private def gramPairs(qv: org.apache.spark.sql.Column, dim: Int) =
    flatten(transform(sequence(lit(0), lit(dim - 1)), i =>
      transform(sequence(i, lit(dim - 1)), j =>
        element_at(qv, i + lit(1)) * element_at(qv, j + lit(1)))))

  /** Per-key exact gram: (k, n, gram[d(d+1)/2]) — one partial-agg
    * explode, array assembled positionally (the canonical order). */
  private def gramByKey(df: DataFrame, keyCol: String, vecCol: String,
                        dim: Int): DataFrame = {
    val q = df
      .filter(col(vecCol).isNotNull && size(col(vecCol)) === dim)
      .select(col(keyCol).cast("string").as("k"),
        transform(col(vecCol),
          x => floor(x.cast("double") * 1e4).cast("long")).as("qv"))
    val m = dim * (dim + 1) / 2
    q.select(col("k"), posexplode(gramPairs(col("qv"), dim)).as(Seq("pos", "p")))
      .groupBy("k", "pos").agg(sum(col("p")).as("g"))
      .groupBy("k")
      .agg(count(lit(1)).as("__npos"),
        transform(sort_array(collect_list(struct(col("pos"), col("g")))),
          s => s.getField("g")).as("gram"))
      // every qualifying row emits ALL m positions, so a key either
      // has the full gram or had no qualifying rows at all
      .filter(col("__npos") === m)
      .select(col("k"), col("gram"))
  }

  private[streaming] case class EdState(k: String, n: Long,
                                        gram: Seq[Long], rows_seen: Long,
                                        n_alarms: Long, batch_rows: Long,
                                        in_batch: Boolean)

  /** One monitoring micro-batch (directly callable for backfills).
    * Report per key present in the batch: (key, batch_rows, n, n_ref,
    * mmd2_micro, alarm). NULL/wrong-dim vectors advance rows_seen but
    * not the gram (the count(col) discipline).
    */
  def driftBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
                 outDir: String, stateDir: String,
                 keyCol: String, vecCol: String, refDir: String,
                 dim: Int, alarmMicro: Long, minRows: Long = 50L)
      : Unit = if (!batch.isEmpty) {
    require(dim >= 1 && alarmMicro > 0 && minRows >= 1,
      s"bad dim=$dim alarmMicro=$alarmMicro minRows=$minRows")
    import spark.implicits._
    val m = dim * (dim + 1) / 2
    val prior = priorState(spark, stateDir, batchId)
    // reference gram: a bounded sample by contract — collected as
    // (count, 2080ish longs) and closed over by the per-key scorer
    val ref = spark.read.parquet(refDir)
    val refQ = ref.filter(col(vecCol).isNotNull && size(col(vecCol)) === dim)
      .select(transform(col(vecCol),
        x => floor(x.cast("double") * 1e4).cast("long")).as("qv"))
    val refRows = refQ
      .select(posexplode(gramPairs(col("qv"), dim)).as(Seq("pos", "p")))
      .groupBy("pos").agg(sum(col("p")).as("g"))
      .orderBy("pos").select("g").as[Long].collect()
    require(refRows.length == m,
      s"reference gram has ${refRows.length} entries, expected $m — " +
        s"is '$refDir' empty or a different dimension?")
    val nRef = refQ.count()
    require(nRef >= 2, s"reference needs >= 2 vectors, got $nRef")
    val refGram: Array[Long] = refRows
    // syy is a constant of the reference — computed once per trigger
    def contract(a: IndexedSeq[Long], b: IndexedSeq[Long]): BigInt = {
      var acc = BigInt(0); var pos = 0
      var i = 0
      while (i < dim) {
        var j = i
        while (j < dim) {
          val w = if (i == j) 1 else 2
          acc += BigInt(a(pos)) * BigInt(b(pos)) * w
          pos += 1; j += 1
        }
        i += 1
      }
      acc
    }
    val syy = contract(refGram, refGram)
    val batchTotals = batch
      .groupBy(col(keyCol).cast("string").as("k"))
      .agg(count(lit(1)).as("batch_rows"),
        sum(when(col(vecCol).isNotNull &&
          size(col(vecCol)) === dim, 1L).otherwise(0L)).as("bn"))
    val batchGram = gramByKey(batch, keyCol, vecCol, dim)
    val obs = batchTotals.join(batchGram, Seq("k"), "left")
    val stateCols = Seq("k", "n", "gram", "rows_seen", "n_alarms")
    val priorS = prior.map(_.select(stateCols.map(col): _*))
      .getOrElse(obs.limit(0).select(col("k"), lit(0L).as("n"),
        col("gram"), lit(0L).as("rows_seen"), lit(0L).as("n_alarms")))
    val zero = array((0 until m).map(_ => lit(0L)): _*)
    val folded = priorS
      .withColumnRenamed("k", "__pk").withColumnRenamed("gram", "__pg")
      .join(obs, col("__pk") <=> col("k"), "full_outer")
      .select(coalesce(col("k"), col("__pk")).as("k"),
        (coalesce(col("n"), lit(0L)) + coalesce(col("bn"), lit(0L))).as("n"),
        zip_with(coalesce(col("__pg"), zero), coalesce(col("gram"), zero),
          (a, b) => a + b).as("gram"),
        (coalesce(col("rows_seen"), lit(0L))
          + coalesce(col("batch_rows"), lit(0L))).as("rows_seen"),
        coalesce(col("n_alarms"), lit(0L)).as("n_alarms"),
        coalesce(col("batch_rows"), lit(0L)).as("batch_rows"),
        col("batch_rows").isNotNull.as("in_batch"))
      .as[EdState]
      .map { st =>
        // BigInt-exact contractions; doubles only in the final ratio
        val g = st.gram.toIndexedSeq
        val mmd2Micro =
          if (st.n < 2) 0L
          else {
            val sxx = contract(g, g)
            val sxy = contract(g, refGram)
            val v = sxx.toDouble / (st.n.toDouble * st.n) +
              syy.toDouble / (nRef.toDouble * nRef) -
              2.0 * sxy.toDouble / (st.n.toDouble * nRef)
            StrictMath.floor(v / 1e16 * 1e6).toLong // gram units → micro
          }
        val alarm = st.in_batch && st.n >= minRows && mmd2Micro >= alarmMicro
        (st.k, st.n, st.gram, st.rows_seen, st.n_alarms, st.batch_rows,
          st.in_batch, mmd2Micro, alarm)
      }
      .toDF("k", "n", "gram", "rows_seen", "n_alarms", "batch_rows",
        "in_batch", "mmd2_micro", "alarm")
      .localCheckpoint()
    folded.filter(col("in_batch"))
      .select(col("k").as(keyCol), col("batch_rows"), col("n"),
        lit(nRef).as("n_ref"), col("mmd2_micro"),
        col("alarm").cast("int").as("alarm"))
      .write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
    folded.select(col("k"),
        when(col("alarm"), lit(0L)).otherwise(col("n")).as("n"),
        when(col("alarm"), zero).otherwise(col("gram")).as("gram"),
        col("rows_seen"),
        (col("n_alarms") + col("alarm").cast("long")).as("n_alarms"))
      .write.mode("overwrite").parquet(s"$stateDir/batch=$batchId")
    val f = graft.util.Fs.fs(spark, stateDir)
    f.listStatus(new Path(stateDir)).map(_.getPath.getName)
      .filter(_.startsWith("batch="))
      .map(_.stripPrefix("batch=").toLong)
      .sorted.dropRight(KEEP_VERSIONS)
      .foreach(ver => graft.util.Fs.delete(spark, s"$stateDir/batch=$ver"))
  }

  /** File-fed monitoring stream: new parquet vector files under
    * `sourceDir` fold into the per-key gram accumulators; reports
    * land under `outDir/batch=<id>`.
    */
  def driftStream(spark: SparkSession, sourceDir: String, outDir: String,
                  stateDir: String, checkpoint: String,
                  keyCol: String, vecCol: String, refDir: String,
                  dim: Int, alarmMicro: Long, minRows: Long = 50L,
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
      .foreachBatch { (b: DataFrame, id: Long) =>
        driftBatch(spark, b, id, outDir, stateDir, keyCol, vecCol,
          refDir, dim, alarmMicro, minRows)
      }
      .start()
  }
}
