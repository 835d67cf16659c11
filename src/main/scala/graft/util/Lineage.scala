package graft.util

import org.apache.spark.sql.DataFrame

/** Lineage truncation for iterative operators (connected components,
  * PageRank, k-means, PQ refinement, BPE, classifier GD).
  *
  * Why truncate at all: `persist` caches data but keeps the logical
  * plan, so per-round lineage compounds and Catalyst re-optimizes an
  * exponentially growing plan on every action — optimizer time, not
  * execution, becomes the bottleneck within a handful of rounds.
  *
  * Two modes, chosen by session config:
  *
  *  - DEFAULT (`localCheckpoint`): truncated blocks live on executor
  *    block managers. Fastest, and fine on local[k] or a static
  *    cluster — but an executor loss (spot kill, dynamic-allocation
  *    decommission, OOM) makes truncated lineage UNRECOVERABLE: the
  *    blocks are gone and the plan that could rebuild them was cut,
  *    so the job dies. At 1000-executor scale this is the first
  *    operational incident of any long iterative run.
  *  - RELIABLE: set `spark.graft.checkpointDir` to a durable path
  *    (HDFS/S3) and every iterative operator switches to
  *    `Dataset.checkpoint()` against that directory. Blocks survive
  *    executor loss; a lost partition re-reads from storage instead
  *    of failing the job. Costs one durable write per round — the
  *    right trade for any run whose round count × round cost exceeds
  *    what you are willing to restart from zero.
  *
  * Results are IDENTICAL in both modes (LineageSpec pins this) —
  * only the recovery story differs, which is why this is a session
  * conf and not a per-operator argument: an orchestrator flips one
  * knob for the whole pipeline.
  *
  * Scope: EVERY eager batch-path truncation routes through here —
  * iterative rounds, pair-set materializations (minhash / ngram /
  * winnow), sketch frames, pipeline mid-frames, CDC change batches,
  * and stream-lifetime reference frames. The one deliberate
  * exception is truncation INSIDE a `foreachBatch` trigger
  * (CdcStream / AggStream / QuotaStream / CardinalityStream /
  * DriftStream): those frames live only for the trigger, Structured
  * Streaming re-runs a failed batch from the checkpointed source
  * offsets anyway, and a durable write per trigger would add a
  * storage round-trip to every micro-batch for recovery the engine
  * already provides — they stay `localCheckpoint` by design.
  */
object Lineage {

  val ConfKey = "spark.graft.checkpointDir"

  /** PLAN-AUDIT knob: `spark.graft.keepLineage=true` makes both
    * truncation helpers return `df` unchanged, so `.explain` shows
    * the real operator tree instead of the opaque
    * `Scan ExistingRDD ... localCheckpoint` a cut leaves behind (the
    * r17 evidence defect: lineage-cut operators produced 7-line plan
    * dumps that proved nothing, and PlanAuditSpec lost coverage of
    * their join shapes). Audit-only — never set it for a bench or a
    * production run: without the cuts, reuse frames recompute per
    * consumer and iterative plans regrow per round.
    */
  val KeepKey = "spark.graft.keepLineage"

  private def keep(df: DataFrame): Boolean =
    df.sparkSession.conf.getOption(KeepKey).contains("true")

  /** Truncate `df`'s lineage; eager in both modes (the caller is
    * about to iterate on the result, and lazy checkpoints re-run the
    * full upstream plan once more on first use).
    */
  def truncate(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    if (keep(df)) return df
    spark.conf.getOption(ConfKey) match {
      case Some(dir) if dir.nonEmpty =>
        val sc = spark.sparkContext
        // setCheckpointDir creates a fresh UUID subdir per call — set
        // it once per configured dir, not per round; re-point only
        // when the session conf moved (an orchestrator redirecting
        // checkpoints between jobs must be honored, not ignored
        // because an earlier job already set a dir)
        if (!sc.getCheckpointDir.exists(_.startsWith(dir)))
          sc.setCheckpointDir(dir)
        df.checkpoint()
      case _ => df.localCheckpoint()
    }
  }

  /** Truncate WITHOUT forcing a materialization job — for bounded
    * fixed-round loops that never read a per-round probe (beam-search
    * expansions, fixed-stride DAG relaxations, one-shot pair-set
    * reuse frames): the Catalyst plan is cut to a LogicalRDD at call
    * time exactly as [[truncate]] does (planning cost stays bounded
    * per round), but the blocks materialize inside the FIRST
    * downstream action instead of a dedicated job per round — N
    * rounds collapse from N+1 jobs into 1, and the result is cached
    * for every later consumer. Identical results; only job shape
    * differs (LineageSpec pins equality).
    *
    * RELIABLE mode (spark.graft.checkpointDir set) deliberately stays
    * EAGER: a non-eager `Dataset.checkpoint()` recomputes the full
    * upstream plan a second time when the checkpoint files are
    * written, which is the exact double-pass this helper exists to
    * avoid — and durable-recovery callers already accepted one write
    * job per round as the price of surviving executor loss.
    *
    * Durability trade, named (same as [[truncate]]'s default mode):
    * the cut blocks live on executor block managers only, and the
    * plan that could rebuild them is gone — an executor loss after
    * materialization FAILS the consuming job rather than recomputing,
    * and the caller (or its retry layer: foreachBatch replays, the
    * bench's fresh run, an orchestrator's job retry) re-runs from the
    * sources. Acceptable wherever the cut frame is cheap relative to
    * a retry; set `spark.graft.checkpointDir` where it is not.
    */
  def truncateLazy(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    if (keep(df)) return df
    spark.conf.getOption(ConfKey) match {
      case Some(dir) if dir.nonEmpty => truncate(df)
      case _ => df.localCheckpoint(eager = false)
    }
  }
}
