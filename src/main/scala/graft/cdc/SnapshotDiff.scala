package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Full snapshot diff: classify every PK as insert / update / delete
  * between two table versions. This is the whole-table generalization
  * of what sslr accomplishes with xmin tracking (updates) plus range
  * hashing (deletes) — when both snapshots are readable, one full
  * outer join on the PK does everything in a single shuffle.
  *
  * Row identity is an md5 over all non-PK columns (portable: the same
  * expression evaluates identically in DuckDB), so "update" means
  * "PK present on both sides with differing payload". Each payload
  * column is md5'd individually before joining (NULL → sentinel) so a
  * NULL↔shifted-value change can't produce the same row hash — a raw
  * concat_ws drops NULLs and would classify such rows "unchanged".
  */
object SnapshotDiff {

  def diff(oldSnap: DataFrame, newSnap: DataFrame, pkCols: Seq[String]): DataFrame = {
    val payloadCols = newSnap.columns.filterNot(pkCols.contains).sorted.toSeq
    require(payloadCols.nonEmpty, "snapshot diff needs at least one non-PK column")
    def hashed(df: DataFrame, tag: String) =
      df.select(pkCols.map(col) :+
        md5(concat_ws("|",
          payloadCols.map(c => coalesce(md5(col(c).cast("string")), lit("N"))): _*))
          .as(s"${tag}_hash"): _*)
    val o = hashed(oldSnap, "old")
    val n = hashed(newSnap, "new")
    o.join(n, pkCols, "full_outer")
      .withColumn("change_type",
        when(col("old_hash").isNull, lit("insert"))
          .when(col("new_hash").isNull, lit("delete"))
          .when(col("old_hash") =!= col("new_hash"), lit("update"))
          .otherwise(lit("unchanged")))
      .filter(col("change_type") =!= "unchanged")
      .select(pkCols.map(col) :+ col("change_type"): _*)
  }

  /** Three-way merge classification: two writers diverged from a
    * common base snapshot — which keys merge cleanly and which
    * CONFLICT? The branch-reconciliation question behind dual-master
    * repair, A/B backfills and "replay the other region's edits",
    * which one-way replication ([[diff]], the merge upsert) cannot
    * answer: it sees that the sides differ, not whether they differ
    * FROM BASE in incompatible ways.
    *
    * Git merge semantics per key (insert/delete = presence change,
    * same md5 row-identity convention as [[diff]] — per-column md5
    * with NULL sentinels, so NULL↔value shifts can't alias):
    *  - neither side changed vs base → `unchanged`
    *  - exactly one side changed → `left` / `right` (clean pick-up)
    *  - both changed identically (same payload, or both deleted) →
    *    `agree` (clean; convergent writes are not conflicts)
    *  - both changed, differently → `conflict` (needs a policy)
    * Keys absent from base and inserted on one side only are clean
    * `left`/`right`; inserted on BOTH sides they `agree`/`conflict`
    * by payload.
    *
    * Scale shape: each snapshot collapses to (pk, hash) in its own
    * scan (payload never crosses a join), then ONE 3-way full-outer
    * join chain on the pk — hash-partitioned once, both joins reuse
    * the exchange; |keys| rows out, `unchanged` filtered before the
    * wire. At 100 TB bucket all three snapshots by pk and the joins
    * are co-located.
    */
  def threeWay(base: DataFrame, left: DataFrame, right: DataFrame,
               pkCols: Seq[String]): DataFrame = {
    val payloadCols = base.columns.filterNot(pkCols.contains).sorted.toSeq
    require(payloadCols.nonEmpty, "three-way merge needs a non-PK column")
    // row fingerprint for EQUALITY ONLY (never leaves the query, so
    // no oracle portability constraint): per-cell 60-bit portable
    // hash with an "N" null sentinel, folded once more — one digest
    // per cell, long comparisons across the 3-way join instead of
    // 32-char hex strings. Accepted-risk delta vs the md5 form this
    // replaced: a 60-bit row-hash collision between one pk's variants
    // (~2⁻⁶⁰ per comparison) would misread a changed row as unchanged
    // or a conflict as agreement — the same order of risk every other
    // portable-hash equality in this repo already carries
    def hashed(df: DataFrame, tag: String) =
      df.select(pkCols.map(col) :+
        graft.util.Hashing.portableHash64(concat_ws("|",
          payloadCols.map(c => coalesce(
            graft.util.Hashing.portableHash64(col(c).cast("string"))
              .cast("string"),
            lit("N"))): _*))
          .as(s"${tag}_hash"): _*)
    // presence-aware equality: NULL hash = key absent on that side;
    // <=> (null-safe equality) makes "both deleted" compare equal
    val j = hashed(base, "b")
      .join(hashed(left, "l"), pkCols, "full_outer")
      .join(hashed(right, "r"), pkCols, "full_outer")
    j.withColumn("l_changed", !(col("l_hash") <=> col("b_hash")))
      .withColumn("r_changed", !(col("r_hash") <=> col("b_hash")))
      .withColumn("outcome",
        when(!col("l_changed") && !col("r_changed"), lit("unchanged"))
          .when(col("l_changed") && !col("r_changed"), lit("left"))
          .when(!col("l_changed") && col("r_changed"), lit("right"))
          .when(col("l_hash") <=> col("r_hash"), lit("agree"))
          .otherwise(lit("conflict")))
      .filter(col("outcome") =!= "unchanged")
      .select(pkCols.map(col) :+ col("outcome"): _*)
  }

  /** Column-level audit changelog between two snapshots — WHAT
    * changed inside each updated row, the shape an audit table or a
    * downstream column-sensitive consumer ("re-embed only if `text`
    * moved, ignore `fetched_at` churn") actually wants; [[diff]] says
    * WHICH keys changed, this says which COLUMNS and from/to what.
    * One (pk, column, old_value, new_value) row per changed cell of
    * each key present in both snapshots (inserts/deletes are
    * [[diff]]'s axis, not cell changes); null↔value shifts are cells
    * too (null-safe inequality), rendered as NULL on their side.
    *
    * Values cross the wire as strings. Diff STRING/INTEGER columns
    * directly; pre-scale FLOATING columns to integer units (cents,
    * micro) before calling — double→string formatting is an engine's
    * own shortest-representation choice, not a cross-engine contract
    * (the OutputContract lesson applied to rendering).
    *
    * Scale shape: both snapshots first collapse to (pk, row-hash) in
    * their own scans and ONLY changed keys' payloads cross the two
    * semi joins + the pk join (the [[threeWayResolve]] discipline:
    * payload moves once, changed keys only); the per-column stack is
    * per-row, post-join. |changed keys|·|changed cols| rows out —
    * at 100 TB bucket both snapshots by pk.
    */
  def columnDiff(oldDf: DataFrame, newDf: DataFrame,
                 pkCols: Seq[String], cols: Seq[String]): DataFrame = {
    def hashed(df: DataFrame, tag: String) =
      df.select(pkCols.map(col) :+
        md5(concat_ws("|",
          cols.map(c => coalesce(md5(col(c).cast("string")), lit("N"))): _*))
          .as(s"${tag}_hash"): _*)
    val changed = hashed(oldDf, "o").join(hashed(newDf, "n"), pkCols)
      .filter(col("o_hash") =!= col("n_hash"))
      .select(pkCols.map(col): _*)
    val o = oldDf.join(changed, pkCols, "left_semi")
      .select(pkCols.map(col) ++
        cols.map(c => col(c).cast("string").as(s"o_$c")): _*)
    val n = newDf.join(changed, pkCols, "left_semi")
      .select(pkCols.map(col) ++
        cols.map(c => col(c).cast("string").as(s"n_$c")): _*)
    val stackArgs = cols.map(c => s"'$c', `o_$c`, `n_$c`").mkString(", ")
    o.join(n, pkCols)
      .selectExpr(pkCols ++ Seq(
        s"stack(${cols.size}, $stackArgs) as (column_name, old_value, new_value)"): _*)
      .filter(!(col("old_value") <=> col("new_value")))
  }

  /** [[columnDiff]]'s INVERSE: apply a (pk, column, old, new) cell
    * changelog to a snapshot — the consumer side of the audit table
    * (replay an upstream's cell edits without re-shipping full rows;
    * at column-diff granularity the wire carries changed CELLS only).
    * A change row with a NULL `new_value` sets the cell to NULL (the
    * presence flag, not the value, decides application — the
    * columnDiff null-axis round-trips). Cells are cast back to the
    * snapshot column's own type; `applyCellChanges(snap,
    * columnDiff(snap, next, pk, cols), pk, cols) == next` on the
    * shared keys is the spec-pinned identity.
    *
    * Scale shape: the changelog collapses to ONE row per touched key
    * (partial-agg pivot by known column list), then one pk join
    * against the snapshot — untouched keys stream through the join's
    * left side unmodified; per-cell conditionals are per-row.
    */
  def applyCellChanges(snap: DataFrame, changes: DataFrame,
                       pkCols: Seq[String], cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(max(when(col("column_name") === c, lit(1))).as(s"has_$c"),
        max(when(col("column_name") === c, col("new_value"))).as(s"nv_$c"))
    }
    val perKey = changes.groupBy(pkCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
    val applied = snap.join(perKey, pkCols, "left")
    snap.columns.foldLeft(applied) { (df, c) =>
      if (!cols.contains(c)) df
      else df.withColumn(c,
        when(col(s"has_$c") === 1,
          col(s"nv_$c").cast(snap.schema(c).dataType)).otherwise(col(c)))
    }.select(snap.columns.map(col): _*)
  }

  /** [[threeWay]]'s RESOLUTION: apply a conflict policy and emit the
    * merged snapshot itself — the table a dual-master repair actually
    * writes back. Per-key semantics (git merge with a chosen side on
    * conflicts): `unchanged` keys keep the base row, clean one-side
    * changes adopt that side's STATE (its row, or its absence — a
    * clean delete stays deleted), `agree` adopts the shared state,
    * `conflict` adopts the preferred side's state (`preferLeft`;
    * last-writer-wins by timestamp is this with the fresher branch
    * passed as the preferred side). Deletes resolve structurally: a
    * key whose winning side lacks it simply has no row to join — no
    * tombstone bookkeeping.
    *
    * Scale shape: the [[threeWay]] hash classification (payload never
    * crosses the 3-way key join), then each source contributes rows
    * through ONE key-only left_semi join against its decision slice —
    * payload bytes move once, on the winning side only. Bucket all
    * three snapshots by pk at 100 TB and every join co-locates.
    */
  def threeWayResolve(base: DataFrame, left: DataFrame, right: DataFrame,
                      pkCols: Seq[String],
                      preferLeft: Boolean = true): DataFrame = {
    val payloadCols = base.columns.filterNot(pkCols.contains).sorted.toSeq
    require(payloadCols.nonEmpty, "three-way merge needs a non-PK column")
    // equality-only row fingerprint — the threeWay form (one digest
    // per cell, long hashes across the 3-way join)
    def hashed(df: DataFrame, tag: String) =
      df.select(pkCols.map(col) :+
        graft.util.Hashing.portableHash64(concat_ws("|",
          payloadCols.map(c => coalesce(
            graft.util.Hashing.portableHash64(col(c).cast("string"))
              .cast("string"),
            lit("N"))): _*))
          .as(s"${tag}_hash"): _*)
    val j = hashed(base, "b")
      .join(hashed(left, "l"), pkCols, "full_outer")
      .join(hashed(right, "r"), pkCols, "full_outer")
    val winner = j
      .withColumn("l_changed", !(col("l_hash") <=> col("b_hash")))
      .withColumn("r_changed", !(col("r_hash") <=> col("b_hash")))
      .withColumn("src",
        when(!col("l_changed") && !col("r_changed"), lit("b"))
          .when(col("l_changed") && !col("r_changed"), lit("l"))
          .when(!col("l_changed") && col("r_changed"), lit("r"))
          .when(col("l_hash") <=> col("r_hash"), lit("l")) // agree
          .otherwise(lit(if (preferLeft) "l" else "r")))   // conflict
      .select(pkCols.map(col) :+ col("src"): _*)
    def take(df: DataFrame, tag: String) =
      df.join(winner.filter(col("src") === tag).select(pkCols.map(col): _*),
        pkCols, "left_semi")
    take(base, "b").unionByName(take(left, "l")).unionByName(take(right, "r"))
  }
}
