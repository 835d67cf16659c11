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
/** Parquet row for the KLL mode's per-group state: the whole sketch as
  * nested arrays (level l = items of weight 2^l), plus the lifetime
  * volume counter. One row per group per version. `k` persists the
  * sketch parameter the levels were built under — level capacities are
  * a function of k, so rebuilding a stored ladder under a different k
  * would silently reinterpret it and void the error bound; kllBatch
  * fails loudly on mismatch instead. */
case class KllGroupState(g: String, k: Int, rows_seen: Long, cnt: Long,
                         compactions: Long, levels: Seq[Seq[Double]])

private[streaming] case class KllCg(st: KllGroupState, inBatch: Boolean,
                                    batchRows: Long)

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
    pruneVersions(spark, stateDir)
  }

  private def pruneVersions(spark: SparkSession, stateDir: String): Unit = {
    val f = graft.util.Fs.fs(spark, stateDir)
    f.listStatus(new Path(stateDir)).map(_.getPath.getName)
      .filter(_.startsWith("batch="))
      .map(_.stripPrefix("batch=").toLong)
      .sorted.dropRight(KEEP_VERSIONS)
      .foreach(ver => graft.util.Fs.delete(spark, s"$stateDir/batch=$ver"))
  }

  /** [[quantileBatch]]'s KLL-backed sibling (the r12-verdict ask): the
    * bottom-k sample's lifetime quantiles are EXACT below saturation
    * but degrade to uniform-subsample error (~1/sqrt(k) rank) once a
    * group exceeds k distinct values; this mode swaps the sample for a
    * [[graft.ops.Kll]] sketch per group, whose ~O(1/k) rank-error
    * BOUND holds regardless of how many distinct values the lifetime
    * stream accumulates — the saturation cliff becomes a proven error
    * envelope (the spec flip: the sample mode pins exactness-then-
    * saturation, this mode pins the bound at 100× the distinct count).
    *
    * Mechanics mirror the sample mode: exclude-own-writes
    * `batch=<id>` versioning, report-then-state write order, pruned
    * version window, null rows advance `rows_seen` but not the sketch.
    * Per trigger the work is one cogroup of the batch against
    * |groups| state rows; each group folds its batch values (sorted —
    * the deterministic-replay order) into a fresh sketch and merges it
    * onto its prior state, so state stays ≤ ~3k doubles per group
    * per version regardless of age, and a replayed batch rewrites
    * byte-identical output (deterministic coins + deterministic fold
    * order). Weight conservation makes `sampled_rows` the EXACT
    * non-null lifetime count. `k` must stay constant across a state
    * dir's lifetime (sketches of different k don't merge) — ENFORCED:
    * the state rows persist k, and a rebuild under a different k fails
    * loudly instead of silently reinterpreting the stored levels.
    *
    * Report schema matches the sample mode: (group-as-string,
    * batch_rows, rows_seen, k_eff = retained items, sampled_rows,
    * p50, p90, p99) — lower weighted quantiles, actual data values.
    */
  def kllBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
               outDir: String, stateDir: String,
               groupCol: String, valueCol: String, k: Int = 256)
      : Unit = if (!batch.isEmpty) {
    import spark.implicits._
    import graft.ops.{Kll, KllState}
    val prior = priorState(spark, stateDir, batchId)
    // group keys as strings: the typed cogroup needs one key encoder,
    // and a monitor's group is a feed/source name
    val batchKV = batch
      .select(col(groupCol).cast("string").as("g"),
        col(valueCol).cast("double").as("v"))
      .as[(String, Option[Double])]
    val priorDs: org.apache.spark.sql.Dataset[KllGroupState] =
      prior.map { p =>
        // migration: state dirs written before k was persisted carry
        // no k column — those ladders were built under the k the
        // caller passed on every trigger (the only k that code path
        // ever had), so adopting the run's k IS the stored k: a
        // schema-checked backfill, not a guess. Rows that DO carry k
        // still hit the mismatch require below.
        val withK = if (p.columns.contains("k")) p
                    else p.withColumn("k", lit(k))
        withK.as[KllGroupState]
      }.getOrElse(spark.emptyDataset[KllGroupState])
    val cg = batchKV.groupByKey(_._1)
      .cogroup(priorDs.groupByKey(_.g)) { (key, bIt, pIt) =>
        val bs = bIt.map(_._2).toVector
        val pr = pIt.toSeq.headOption
        pr.foreach { p =>
          require(p.k == k,
            s"KLL state for group '$key' was built with k=${p.k} but " +
              s"this run passed k=$k; k must stay constant across a " +
              "state dir's lifetime (level capacities depend on it). " +
              "Use the stored k or start a fresh stateDir.")
        }
        val priorSk = pr
          .map(p => KllState(p.k, p.cnt, p.compactions,
            p.levels.map(_.toVector).toVector))
          .getOrElse(Kll.empty(k))
        // sorted fold: the batch multiset enters in one canonical
        // order, so an at-least-once replay rebuilds identical bytes
        val batchSk = bs.flatten.sorted.foldLeft(Kll.empty(k))(Kll.update)
        val merged = Kll.merge(priorSk, batchSk)
        val rowsSeen = pr.map(_.rows_seen).getOrElse(0L) + bs.size
        Iterator.single(KllCg(
          KllGroupState(key, k, rowsSeen, merged.count, merged.compactions,
            merged.levels.map(_.toVector).toVector),
          bs.nonEmpty, bs.size.toLong))
      }
      .localCheckpoint() // one computation feeds the report AND the state
    val report = cg.filter(_.inBatch).map { c =>
      val sk = KllState(c.st.k, c.st.cnt, c.st.compactions,
        c.st.levels.map(_.toVector).toVector)
      (c.st.g, c.batchRows, c.st.rows_seen, sk.totalRetained.toLong,
        c.st.cnt, Kll.quantile(sk, 50L), Kll.quantile(sk, 90L),
        Kll.quantile(sk, 99L))
    }.toDF(groupCol, "batch_rows", "rows_seen", "k_eff", "sampled_rows",
      "p50", "p90", "p99")
    report.write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
    cg.map(_.st).write.mode("overwrite").parquet(s"$stateDir/batch=$batchId")
    pruneVersions(spark, stateDir)
  }

  /** File-fed monitoring stream: new parquet files under `sourceDir`
    * update the per-group samples; reports land under
    * `outDir/batch=<id>`.
    */
  def quantileStream(spark: SparkSession, sourceDir: String, outDir: String,
                     stateDir: String, checkpoint: String,
                     groupCol: String, valueCol: String, k: Int = 256,
                     maxFilesPerTrigger: Int = 10,
                     feedSchema: Option[org.apache.spark.sql.types.StructType] = None,
                     mode: String = "sample")
      : StreamingQuery = {
    require(mode == "sample" || mode == "kll",
      s"mode must be 'sample' or 'kll', got '$mode'")
    val schema = graft.util.Fs.feedSchema(spark, sourceDir, feedSchema)
    val feed = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(sourceDir)
    feed.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime("1 second"))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (mode == "kll")
          kllBatch(spark, batch, batchId, outDir, stateDir,
            groupCol, valueCol, k)
        else
          quantileBatch(spark, batch, batchId, outDir, stateDir,
            groupCol, valueCol, k)
      }
      .start()
  }
}
