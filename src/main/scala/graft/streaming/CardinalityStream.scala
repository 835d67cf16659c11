package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ops.Sketch
import graft.util.Hashing

/** Streaming per-group cardinality monitor — the ingestion twin of
  * `profile_sketch` (SURVEY §2 C19b): track each group's lifetime
  * DISTINCT count next to its lifetime row count, so a collapsing
  * distinct/total ratio — a crawler loop, a replayed dump, a mirror
  * fed twice — is visible at the trigger it happens, before any of
  * it is admitted. DriftStream watches the token DISTRIBUTION,
  * AnomalyStream the metric moments; this watches VOLUME vs NOVELTY,
  * the axis a wholesale re-ingestion moves first.
  *
  * State = the per-group KMV bottom-k sketch (k rows per group), plus
  * the group's lifetime row count denormalized onto the sketch rows
  * (one value repeated ≤ k times buys a single state schema). KMV
  * sketches are MERGEABLE — bottom-k(state ∪ batch) is computed from
  * the k-row state and the batch's own distinct hashes, never from
  * history — so per-trigger cost is one batch-sized partial-agg
  * distinct plus a window over ≤ k + |batch distincts| rows per
  * group, and state stays |groups|·k rows per version regardless of
  * stream age.
  *
  * Versioning follows QuotaStream's exclude-own-writes discipline:
  * `stateDir/batch=<id>` holds the sketch AFTER batch id; a trigger
  * reads the newest version `< batchId`, so an at-least-once replay
  * recomputes byte-identical output and state. Write order is output
  * first, state last. The sketch merge and the totals roll-up are
  * UNION + groupBy (a NULL group key forms one group natively); the
  * two small denormalization joins are null-safe (<=>), QuotaStream's
  * lesson.
  */
object CardinalityStream {

  private val KEEP_VERSIONS = 4

  /** Newest state version strictly below `batchId`, if any:
    * (group, h, rows_seen) sketch rows. */
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
    * `outDir/batch=<id>`:
    * (group, batch_rows, batch_distinct, lifetime_rows, k_eff,
    * est_distinct, dup_ppm) with dup_ppm = the duplicated fraction
    * 10⁶·(1 − est_distinct/lifetime_rows), clamped at 0 for
    * estimator overshoot — all integer arithmetic, so replays and
    * recomputes are byte-identical.
    *
    * Row counts include NULL-valued rows; only the distinct sketch
    * skips them (count(col) semantics). A feed that starts emitting
    * nulls for a group therefore still advances batch_rows and
    * lifetime_rows while est_distinct stalls — dup_ppm RISES, which
    * is the alert (a monitor that dropped null rows from the volume
    * axis would go silent on exactly that fault). A group whose
    * sketch is empty persists in state as one h-null row so its
    * lifetime count survives.
    *
    * Estimator: [[graft.ops.Sketch.estimate]]'s quotient+remainder
    * form — below saturation it is EXACT, above it carries no
    * systematic bias at any n/k ratio (the earlier pre-multiply floor
    * underestimated by up to ~50% for groups with n not far above k,
    * which here read as a FALSE duplication alert of up to
    * ~500000 ppm on a dup-free feed — the monitor's core failure
    * mode, and one the cross-engine gate can't catch because the
    * oracle replays the same arithmetic).
    */
  def cardinalityBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
                       outDir: String, stateDir: String,
                       groupCol: String, valueCol: String, k: Int = 256)
      : Unit = if (!batch.isEmpty) {
    require(k >= 2, s"k must be >= 2, got $k")
    val prior = priorState(spark, stateDir, batchId)
    // batch side: per-group row counts + distinct hash set, one scan
    val hashed = batch.select(col(groupCol),
        Hashing.portableHash64(col(valueCol)).as("h"))
      .localCheckpoint() // feeds counts, the merge, AND batch_distinct
    val batchCounts = hashed.groupBy(groupCol)
      .agg(count(lit(1)).as("batch_rows"),
        count_distinct(col("h")).as("batch_distinct"))
    // merged sketch: bottom-k of (prior sketch hashes ∪ batch hashes)
    // through the SAME selection rule as the batch operator
    val priorSketch = prior.map(_.select(col(groupCol), col("h")))
      .getOrElse(hashed.limit(0).select(col(groupCol), col("h")))
    val merged = Sketch.kmvFromHashes(
      hashed.select(col(groupCol), col("h"))
        .unionByName(priorSketch)
        .filter(col("h").isNotNull)
        .distinct(),
      groupCol, k).drop("pos")
    // lifetime rows: prior totals ∪ batch totals, summed per group —
    // a union-aggregate, not a join, so null groups need no <=> care
    val priorTotals = prior
      .map(_.groupBy(groupCol).agg(max(col("rows_seen")).as("n")))
      .getOrElse(batchCounts.limit(0)
        .select(col(groupCol), col("batch_rows").as("n")))
    val totals = batchCounts.select(col(groupCol), col("batch_rows").as("n"))
      .unionByName(priorTotals)
      .groupBy(groupCol).agg(sum(col("n")).as("rows_seen"))
    // totals drive the join (every group with history or batch rows),
    // LEFT to the sketch: a sketch-less group keeps one h-null state
    // row instead of losing its lifetime count
    val state = totals.withColumnRenamed(groupCol, "__tg")
      .join(merged.select(col(groupCol).as("__mg"), col("h")),
        col("__tg") <=> col("__mg"), "left")
      .select(col("__tg").as(groupCol), col("h"), col("rows_seen"))
      .localCheckpoint() // one computation feeds the report AND the state write
    // report: groups present in this batch, with lifetime estimates
    val est = state.groupBy(groupCol)
      .agg(count(col("h")).as("k_eff"), max(col("h")).as("h_k"),
        max(col("rows_seen")).as("lifetime_rows"))
      .withColumn("est_distinct", Sketch.estimate(col("k_eff"), "h_k", k))
      .drop("h_k")
    val report = batchCounts
      .join(est.withColumnRenamed(groupCol, "__eg"),
        col(groupCol) <=> col("__eg"))
      .withColumn("dup_ppm",
        greatest(lit(0L), expr(
          "1000000 - est_distinct * 1000000 div greatest(lifetime_rows, 1)")))
      .select(col(groupCol), col("batch_rows"), col("batch_distinct"),
        col("lifetime_rows"), col("k_eff"), col("est_distinct"),
        col("dup_ppm"))
    report.write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
    state.write.mode("overwrite").parquet(s"$stateDir/batch=$batchId")
    val f = graft.util.Fs.fs(spark, stateDir)
    f.listStatus(new Path(stateDir)).map(_.getPath.getName)
      .filter(_.startsWith("batch="))
      .map(_.stripPrefix("batch=").toLong)
      .sorted.dropRight(KEEP_VERSIONS)
      .foreach(v => graft.util.Fs.delete(spark, s"$stateDir/batch=$v"))
  }

  /** HLL mode (NEW r14) — [[cardinalityBatch]]'s constant-register
    * sibling for groups whose lifetime distinct count dwarfs any
    * sensible KMV k: the KMV sketch is EXACT until k distinct values
    * and then an estimator, but its per-group state is k hash rows
    * chosen from history; HLL caps state at 2^p register rows per
    * group forever (p=10 → ≤1024 rows, ~3.2% std err) and merges by
    * MAX — commutative, idempotent, replay-proof by algebra rather
    * than by selection-rule discipline. The register derivation and
    * the estimate expression are [[graft.ops.Profile]]'s
    * (hllRegisters/hllEstimateCol), so the batch profiler
    * (profile_distinct_hll, oracle-replayed bit-for-bit) and this
    * monitor can never fork arithmetic.
    *
    * Report shape matches the KMV mode: (group, batch_rows,
    * batch_distinct, lifetime_rows, n_regs, est_distinct, dup_ppm) —
    * n_regs standing where k_eff stood. Null values don't observe
    * (the sketch side) but do count (the volume side) — the same
    * loud-on-nulls contract; a registerless group persists one
    * idx-null state row so its lifetime count survives.
    */
  def hllBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
               outDir: String, stateDir: String,
               groupCol: String, valueCol: String, p: Int = 10)
      : Unit = if (!batch.isEmpty) {
    require(p >= 4 && p <= 18, s"p in [4,18], got $p")
    val prior = priorState(spark, stateDir, batchId)
    val hashed = batch.select(col(groupCol),
        Hashing.portableHash64(
          concat(lit("hll:"), col(valueCol).cast("string"))).as("h"))
      .localCheckpoint()
    val batchCounts = hashed.groupBy(groupCol)
      .agg(count(lit(1)).as("batch_rows"),
        count_distinct(col("h")).as("batch_distinct"))
    val bregs = graft.ops.Profile.hllRegisters(
      hashed.filter(col("h").isNotNull), Seq(groupCol), "h", p)
    val priorRegs = prior
      .map(_.filter(col("idx").isNotNull)
        .select(col(groupCol), col("idx"), col("mr")))
      .getOrElse(bregs.limit(0))
    val merged = bregs.unionByName(priorRegs)
      .groupBy(col(groupCol), col("idx")).agg(max("mr").as("mr"))
    val priorTotals = prior
      .map(_.groupBy(groupCol).agg(max(col("rows_seen")).as("n")))
      .getOrElse(batchCounts.limit(0)
        .select(col(groupCol), col("batch_rows").as("n")))
    val totals = batchCounts.select(col(groupCol), col("batch_rows").as("n"))
      .unionByName(priorTotals)
      .groupBy(groupCol).agg(sum(col("n")).as("rows_seen"))
    val state = totals.withColumnRenamed(groupCol, "__tg")
      .join(merged.select(col(groupCol).as("__mg"), col("idx"), col("mr")),
        col("__tg") <=> col("__mg"), "left")
      .select(col("__tg").as(groupCol), col("idx"), col("mr"),
        col("rows_seen"))
      .localCheckpoint()
    val est = state.groupBy(groupCol)
      .agg(count(col("idx")).as("n_regs"),
        sum(when(col("idx").isNotNull, expr(
          "cast(shiftleft(1L, cast(61 - mr as int)) as decimal(38,0))")))
          .as("s_present"),
        max(col("rows_seen")).as("lifetime_rows"))
      .withColumn("est_distinct",
        graft.ops.Profile.hllEstimateCol(col("n_regs"), col("s_present"), p))
      .drop("s_present")
    val report = batchCounts
      .join(est.withColumnRenamed(groupCol, "__eg"),
        col(groupCol) <=> col("__eg"))
      .withColumn("dup_ppm",
        greatest(lit(0L), expr(
          "1000000 - est_distinct * 1000000 div greatest(lifetime_rows, 1)")))
      .select(col(groupCol), col("batch_rows"), col("batch_distinct"),
        col("lifetime_rows"), col("n_regs"), col("est_distinct"),
        col("dup_ppm"))
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
    * update the per-group sketches; reports land under
    * `outDir/batch=<id>`. `mode` picks the sketch: "kmv" (exact to k
    * distinct, then estimated) or "hll" (bounded registers forever).
    */
  def cardinalityStream(spark: SparkSession, sourceDir: String, outDir: String,
                        stateDir: String, checkpoint: String,
                        groupCol: String, valueCol: String, k: Int = 256,
                        maxFilesPerTrigger: Int = 10,
                        feedSchema: Option[org.apache.spark.sql.types.StructType] = None,
                        mode: String = "kmv", p: Int = 10)
      : StreamingQuery = {
    require(mode == "kmv" || mode == "hll",
      s"mode must be 'kmv' or 'hll', got '$mode'")
    val schema = graft.util.Fs.feedSchema(spark, sourceDir, feedSchema)
    val feed = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(sourceDir)
    feed.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime("1 second"))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (mode == "hll")
          hllBatch(spark, batch, batchId, outDir, stateDir,
            groupCol, valueCol, p)
        else
          cardinalityBatch(spark, batch, batchId, outDir, stateDir,
            groupCol, valueCol, k)
      }
      .start()
  }
}
