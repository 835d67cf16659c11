package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Snapshot retention / GC planning — the other half of store
  * maintenance next to [[Compaction]]: a snapshot-per-day store grows
  * without bound unless old snapshots expire on a schedule, and the
  * schedule everyone actually runs is calendar-tiered ("keep dailies
  * for N days, weeklies for M weeks, drop the rest").
  *
  * Decisions are CALENDAR-anchored to the newest snapshot in the
  * manifest (never wall clock — reruns are byte-identical):
  *  - age < keepDailyDays            → `keep-daily`
  *  - else newest snapshot of its epoch-week AND age <
  *    keepWeeklyWeeks·7              → `keep-weekly`
  *  - else                           → `drop`
  *
  * Shape at scale: the manifest is snapshot-cardinality (days, not
  * data); the only window is partitioned by epoch-week, and the
  * stream-time anchor is a one-row broadcast fold. Pure BIGINT day
  * arithmetic end to end.
  */
object Retention {

  /** Test-injectable failpoint (the A40 compactor / IVF-vacuum
    * crash-drill discipline applied to [[execute]]): invoked at every
    * crash-relevant boundary — `before-move:<day>` and `moved:<day>`
    * around each snapshot's rename into trash, `before-purge` once
    * every planned drop is staged. Production leaves the no-op; the
    * spec installs a throwing hook and proves a plain re-run heals
    * every window.
    */
  private[graft] var gcFailpoint: String => Unit = _ => ()

  /** EXECUTE the calendar-tiered [[plan]] against a snapshot-per-day
    * store laid out as `root/snap_day=<d>/…` (one parquet dataset per
    * day). Metadata-only discipline: a dropped day RENAMES atomically
    * into `root/__trash_gc/snap_day=<d>` — a reader never sees a
    * half-deleted snapshot dir — and the trash purges after all moves.
    * Single-writer OFFLINE contract (the same maintenance slot as
    * [[Compaction.compactStore]]).
    *
    * Crash windows, healed by the recovery pass that runs first on
    * every invocation ([[recoverGc]] = purge the trash — a day is only
    * ever IN the trash because the plan said drop):
    *  - mid-move: some planned drops live, some in trash. The plan is
    *    anchored to the NEWEST day, which is never droppable, and a
    *    dropped day can never promote a surviving day's decision
    *    (a week-max older than the weekly horizon drops, but every
    *    other day of that week is older still and was already a drop),
    *    so the re-run recomputes identical decisions for the survivors
    *    and finishes the moves.
    *  - mid/post-purge: the trash holds partially-deleted dirs; the
    *    recovery pass purges the rest.
    * Re-running after ANY window — or after a clean finish — converges
    * to the same store listing (idempotent).
    *
    * Scale shape: the manifest is snapshot-cardinality (days, not
    * data) so the driver-side plan collect is bounded by the calendar;
    * every store mutation is a directory rename or delete — the bytes
    * in kept snapshots are never read or rewritten.
    *
    * @return (kept_daily, kept_weekly, dropped) day counts
    */
  def execute(spark: org.apache.spark.sql.SparkSession, root: String,
              keepDailyDays: Int, keepWeeklyWeeks: Int): (Long, Long, Long) = {
    import org.apache.hadoop.fs.Path
    import graft.util.Fs
    val f = Fs.fs(spark, root)
    recoverGc(spark, root)
    val PFX = "snap_day="
    val days =
      if (!f.exists(new Path(root))) Seq.empty[Long]
      else f.listStatus(new Path(root)).map(_.getPath.getName)
        .filter(_.startsWith(PFX)).map(_.stripPrefix(PFX).toLong).toSeq.sorted
    if (days.isEmpty) return (0L, 0L, 0L)
    import spark.implicits._
    val decisions = plan(days.toDF("snap_day"), "snap_day",
        keepDailyDays, keepWeeklyWeeks)
      .select("snap_day", "action").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val drops = days.filter(d => decisions(d) == "drop")
    val trash = new Path(root, "__trash_gc")
    if (drops.nonEmpty) {
      f.mkdirs(trash)
      drops.foreach { d =>
        gcFailpoint(s"before-move:$d")
        if (!f.rename(new Path(root, s"$PFX$d"), new Path(trash, s"$PFX$d")))
          throw new java.io.IOException(s"gc rename of $PFX$d failed")
        gcFailpoint(s"moved:$d")
      }
      gcFailpoint("before-purge")
      f.delete(trash, true)
    }
    (decisions.values.count(_ == "keep-daily").toLong,
      decisions.values.count(_ == "keep-weekly").toLong,
      drops.size.toLong)
  }

  /** Heal an interrupted [[execute]] — see its crash-window contract.
    * A snapshot is only ever under `__trash_gc` because a computed
    * plan said drop, so recovery is always "finish the purge".
    * @return true if anything was repaired
    */
  def recoverGc(spark: org.apache.spark.sql.SparkSession,
                root: String): Boolean = {
    import org.apache.hadoop.fs.Path
    val f = graft.util.Fs.fs(spark, root)
    val trash = new Path(root, "__trash_gc")
    if (f.exists(trash)) { f.delete(trash, true); true } else false
  }

  def plan(snapshots: DataFrame, dayCol: String,
           keepDailyDays: Int, keepWeeklyWeeks: Int): DataFrame = {
    val days = snapshots.select(col(dayCol).cast("long").as("snap_day"))
      .distinct()
    val anchor = days.agg(max("snap_day").as("__max_day"))
    val wk = Window.partitionBy(col("__week"))
    days.crossJoin(broadcast(anchor))
      .withColumn("age_days", col("__max_day") - col("snap_day"))
      .withColumn("__week", expr("snap_day DIV 7"))
      .withColumn("__week_max", max("snap_day").over(wk))
      .select(col("snap_day"), col("age_days"),
        when(col("age_days") < keepDailyDays, lit("keep-daily"))
          .when(col("snap_day") === col("__week_max") &&
            col("age_days") < keepWeeklyWeeks * 7L, lit("keep-weekly"))
          .otherwise(lit("drop")).as("action"))
  }
}
