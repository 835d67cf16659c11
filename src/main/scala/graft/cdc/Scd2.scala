package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type-2 history over a CDC change feed —
  * the replication *sink mode* that keeps every version of a row
  * instead of only the latest (the natural extension of the
  * reference's upsert apply, `internal/updates.go:162`, for targets
  * that need time travel: "what did this row say at version v?").
  *
  * Model: a change feed of (pk, version, payload) rows — exactly what
  * [[ChangeCapture.incrementalPull]] extracts (version = the xmin
  * analog). The history table has one row per *effective* change
  * (consecutive identical payloads collapse) carrying
  * `[valid_from, valid_to)` version intervals; the open interval uses
  * `valid_to = ` [[Scd2.OpenSentinel]] rather than NULL so outputs are
  * NULL-free (driver hash contract, SURVEY §4) and range predicates
  * (`valid_from <= v AND v < valid_to`) need no null branch.
  *
  * Scale shape: ONE hash shuffle on pk; the dedup-lag and the
  * interval-lead run over the same (partition, ordering) spec so
  * Catalyst plans a single Exchange + single Sort for both windows.
  * No self-joins, no driver state.
  */
object Scd2 {

  /** Open-interval sentinel (max signed 64-bit, same literal on both
    * engines) — any real version compares strictly below it.
    */
  val OpenSentinel: Long = Long.MaxValue

  /** Build the full SCD2 history from a change feed.
    *
    * @param changes     (pk..., version, payload...) change rows; at most
    *                    one row per (pk, version)
    * @param pkCols      primary-key columns
    * @param versionCol  monotone version column (xmin analog)
    * @param payloadCols tracked attribute columns; consecutive rows of a
    *                    key with identical payloads collapse into one
    *                    interval
    * @return one row per effective change: pk..., payload...,
    *         valid_from (= its version), valid_to (next effective
    *         change's version, or [[OpenSentinel]]), is_current
    */
  def buildHistory(changes: DataFrame, pkCols: Seq[String], versionCol: String,
                   payloadCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(pkCols.map(col): _*).orderBy(col(versionCol))
    val payload = struct(payloadCols.map(col): _*)
    // keep a change iff its payload differs from the key's previous
    // change (null-safe struct compare; the first change always stays)
    val effective = changes
      .withColumn("_prev", lag(payload, 1).over(w))
      .filter(not(payload <=> col("_prev")))
      .drop("_prev")
    effective
      .select((pkCols ++ payloadCols).map(col) :+ col(versionCol).as("valid_from"): _*)
      .withColumn("valid_to",
        coalesce(lead(col("valid_from"), 1).over(
          Window.partitionBy(pkCols.map(col): _*).orderBy(col("valid_from"))),
          lit(OpenSentinel)))
      .withColumn("is_current", col("valid_to") === lit(OpenSentinel))
  }

  /** Fold ONE change batch into an existing SCD2 history without
    * rebuilding untouched keys — the per-cycle maintenance step.
    *
    * Contract (the CDC invariant [[ChangeCapture.incrementalPull]]
    * guarantees): every batch version is strictly greater than every
    * version already in `history`.
    *
    * Work is O(touched keys): the batch's key set (small) broadcasts
    * into a semi/anti join against the history, only the affected
    * keys' interval lists are re-derived (their history rows ARE their
    * effective-change feed, so rebuild input is |affected history| +
    * |batch|), and untouched rows pass through by reference. On a
    * bucketed/partitioned history store the anti-join side is the
    * partition-pruned identity — nothing is read or rewritten for
    * untouched partitions (same posture as [[AggMaintain]]).
    */
  def maintain(history: DataFrame, batch: DataFrame, pkCols: Seq[String],
               versionCol: String, payloadCols: Seq[String]): DataFrame = {
    // eager truncation (Lineage.truncate; durable under the
    // spark.graft.checkpointDir knob): the distinct is computed ONCE
    // for both probes (not re-derived per join), and the planner sizes
    // the join from the materialized blocks — a normal batch
    // broadcasts, but a huge catch-up/backfill batch falls back to a
    // shuffle join instead of blowing the broadcast threshold or
    // driver memory on a hint
    val keys = graft.util.Lineage.truncate(
      batch.select(pkCols.map(col): _*).distinct())
    val affected = history.join(keys, pkCols, "left_semi")
    val untouched = history.join(keys, pkCols, "left_anti")
    // a history row is exactly one effective change at version = valid_from
    val affectedChanges = affected
      .select((pkCols ++ payloadCols).map(col) :+ col("valid_from").as(versionCol): _*)
    val rebuilt = buildHistory(
      affectedChanges.unionByName(
        batch.select((pkCols ++ payloadCols).map(col) :+ col(versionCol): _*)),
      pkCols, versionCol, payloadCols)
    untouched.unionByName(rebuilt)
  }

  /** Point-in-time lookup: the payload each key had at `version`. */
  def asOf(history: DataFrame, version: Long): DataFrame =
    history.filter(col("valid_from") <= version && lit(version) < col("valid_to"))
      .drop("is_current")
}
