package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Upsert/apply semantics — the Spark-native form of sslr's
  * delete-then-CopyFrom apply step (reference: internal/updates.go:162-226
  * `applyUpdates` / `deleteRows`).
  *
  * The reference deletes matching PKs inside a transaction and bulk
  * re-inserts. A distributed engine expresses the same end state
  * declaratively: `updates ∪ (base ⟕anti updates)` — every PK takes its
  * newest row, rows absent from updates survive unchanged.
  *
  * Scale: one shuffle of each side on the PK. When the target is
  * parquet bucketed by PK (see Replicator), the base side's shuffle is
  * avoided entirely; the anti join also benefits from AQE converting to
  * broadcast when the update batch is small — the common CDC case.
  */
object Merge {

  /** Apply `updates` to `base` by primary key (last-writer-wins). */
  def upsert(base: DataFrame, updates: DataFrame, pkCols: Seq[String]): DataFrame = {
    require(pkCols.nonEmpty, "upsert needs at least one primary-key column")
    val survivors = base.join(updates.select(pkCols.map(col): _*), pkCols, "left_anti")
    updates.unionByName(survivors)
  }

  /** Collapse a change batch to ONE row per PK, keeping the highest
    * version (ties broken deterministically by the remaining columns).
    * `upsert` assumes PK-unique updates — true when updates come from a
    * table snapshot, but a streaming micro-batch can carry several
    * change rows for the same PK (two files landing in one trigger),
    * and unioning them all would leave duplicate PKs in the target.
    *
    * Struct-max, not a row_number window: max is commutative, so Spark
    * partial-aggregates map-side and the shuffle carries one row per
    * (partition, PK) instead of every change row.
    */
  def latestByKey(updates: DataFrame, pkCols: Seq[String], versionCol: String): DataFrame = {
    val payload = updates.columns.filterNot(pkCols.contains).toSeq
    require(payload.nonEmpty, "latestByKey needs at least one non-PK column")
    require(updates.columns.contains(versionCol), s"unknown version column $versionCol")
    // a PK version column (append-only feeds version by the key itself)
    // is constant within a group — order by the payload alone then
    val ordered =
      if (payload.contains(versionCol)) versionCol +: payload.filterNot(_ == versionCol)
      else payload
    updates.groupBy(pkCols.map(col): _*)
      .agg(max(struct(ordered.map(col): _*)).as("__latest"))
      .select(pkCols.map(col) ++ ordered.map(c => col(s"__latest.`$c`").as(c)): _*)
      .select(updates.columns.toIndexedSeq.map(col): _*)
  }

  /** Remove rows whose PK appears in `deletedKeys`
    * (reference: deleteRows, updates.go:228).
    */
  def applyDeletes(target: DataFrame, deletedKeys: DataFrame, pkCols: Seq[String]): DataFrame =
    target.join(deletedKeys.select(pkCols.map(col): _*), pkCols, "left_anti")
}
