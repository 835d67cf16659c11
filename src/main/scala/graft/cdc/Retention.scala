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
