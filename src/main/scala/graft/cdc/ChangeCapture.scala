package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental change detection — the Spark-native form of sslr's
  * xmin-watermark tracking (reference: internal/updates.go:23-66).
  *
  * Postgres `xmin` is a monotonically increasing transaction id; its
  * Spark-world analog is any monotone version column in a change feed
  * (an autoincrement id, an epoch, a CDC log offset). Operators take
  * the version column explicitly.
  *
  * Scale: both operators are single-scan, filter-pushed (version
  * predicates reach the parquet reader as `PushedFilters`), and
  * aggregate map-side — no full shuffle at any size.
  */
object ChangeCapture {

  /** The update range for a table: filtered row count + max version.
    * Reference computes `select count(*), max(xmin) from t where …`
    * (updates.go:44); this is its exact distributed equivalent (one
    * column-pruned scan, partial aggregation, single-row result).
    */
  def updateRange(source: DataFrame, versionCol: Column, filter: Column = lit(true)): DataFrame =
    source.filter(filter)
      .agg(count(lit(1)).as("row_count"), max(versionCol).as("max_version"))

  /** Changed-row extract: rows with version > watermark, optionally
    * filtered. The reference pulls these in ordered chunks with
    * offset/limit because it streams over one connection
    * (updates.go:68-160); in Spark ordering/chunking is partitioning,
    * so the operator returns the whole incremental set and lets the
    * sink partition it. Deterministic order keys are the caller's
    * sort columns if a stable file layout is wanted.
    *
    * `upperBound` closes the watermark race on LIVE sources: the
    * Replicator records `max_version` from one read and pulls in a
    * second — rows landing between the two with version ≤ max would be
    * skipped forever once the watermark advances. Bounding the pull to
    * the recorded max makes "state says seen ≤ V" and "rows pulled"
    * consistent for append-only monotone feeds; sources that UPDATE
    * rows in place additionally require snapshot-isolated reads (a
    * parquet dir or table-format version is exactly that).
    */
  def incrementalPull(source: DataFrame, versionCol: Column, watermark: Long,
                      filter: Column = lit(true),
                      upperBound: Option[Long] = None): DataFrame = {
    val bounded = upperBound.map(ub => source.filter(versionCol <= lit(ub))).getOrElse(source)
    bounded.filter(versionCol > lit(watermark)).filter(filter)
  }

  /** Decide full-copy vs incremental per table: a target holding fewer
    * than `threshold * source_rows` rows is considered stale and gets
    * a full resync (reference: updates.go:55-60, fullCopyThreshold).
    * Counts are map-side aggregated; the result is one row.
    */
  def fullCopyDecision(source: DataFrame, target: DataFrame, tableName: String,
                       threshold: Double, filter: Column = lit(true)): DataFrame = {
    val s = source.filter(filter).agg(count(lit(1)).as("source_rows"))
      .withColumn("table_name", lit(tableName))
    val t = target.filter(filter).agg(count(lit(1)).as("target_rows"))
      .withColumn("table_name", lit(tableName))
    s.join(t, "table_name")
      .withColumn("full_copy", col("target_rows") < col("source_rows") * lit(threshold))
      .select("table_name", "source_rows", "target_rows", "full_copy")
  }

  /** Full filtered copy (reference: internal/copy.go:11). Spark-side
    * this is just a pushed-down scan; materialization is the sink's
    * `.write` (partitioned parquet on a cluster).
    */
  def fullCopy(source: DataFrame, filter: Column = lit(true)): DataFrame =
    source.filter(filter)

  /** Equi-depth chunk plan over an integer primary key — the planning
    * step in front of a chunked initial copy: the reference streams a
    * full copy over one connection so it never needs boundaries, but
    * a parallel extractor (JDBC partitionColumn bounds, a backfill
    * fanning out range scans, a resync driving [[RangeHashDiff]] per
    * chunk) wants `chunks` key ranges with ~n/`chunks` ROWS each —
    * equal-WIDTH ranges on a typical auto-increment key with deleted
    * eras or a hot recent segment put most rows in few chunks and
    * idle workers on the rest. Returns one row per chunk: `chunk_id`,
    * `n_rows`, `lo_key`/`hi_key` (inclusive bounds; consecutive
    * chunks abut on distinct keys so `k >= lo AND k <= hi` partitions
    * exactly).
    *
    * A duplicated key (non-unique "pk") lands WHOLE in one chunk —
    * its first global rank decides, the honest choice when chunk
    * queries predicate on key ranges. All arithmetic is integer rank
    * walking ((cum − cnt)·chunks div n).
    *
    * Scale shape: the profile_histogram_eq rank walk on one column
    * with no cents quantization (keys are already integers): (key)
    * partial-agg counts, ≤4097 range buckets by construction,
    * broadcast triangular bucket offsets, cumulative window
    * PARTITIONED by bucket — no partition-less window, nothing
    * corpus-sized moves except the first distinct-key groupBy.
    */
  def chunkPlan(df: DataFrame, pkCol: String, chunks: Int): DataFrame = {
    require(chunks >= 1, s"chunks must be >= 1, got $chunks")
    import org.apache.spark.sql.expressions.Window
    val counts = df.select(col(pkCol).cast("long").as("k"))
      .filter(col("k").isNotNull)
      .groupBy("k").agg(count(lit(1)).as("cnt"))
    val range = counts.agg(min(col("k")).as("lo"), max(col("k")).as("hi"),
      sum(col("cnt")).as("n"))
    val bucketed = counts.crossJoin(broadcast(range))
      .withColumn("w", expr("(hi - lo) div 4096 + 1"))
      .withColumn("bkt", expr("(k - lo) div w"))
    val bcnt = bucketed.groupBy("bkt").agg(sum(col("cnt")).as("bc"))
    val boff = bcnt.as("a")
      .join(broadcast(bcnt.as("b")), col("b.bkt") < col("a.bkt"), "left")
      .groupBy(col("a.bkt").as("bkt"))
      .agg(coalesce(sum(col("b.bc")), lit(0L)).as("off"))
    val wCum = Window.partitionBy(col("bkt")).orderBy(col("k"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bucketed.join(broadcast(boff), Seq("bkt"))
      .withColumn("cum", col("off") + sum(col("cnt")).over(wCum))
      .withColumn("chunk_id", expr(s"((cum - cnt) * ${chunks}L) div n"))
      .groupBy("chunk_id")
      .agg(sum(col("cnt")).as("n_rows"),
        min(col("k")).as("lo_key"), max(col("k")).as("hi_key"))
  }
}
