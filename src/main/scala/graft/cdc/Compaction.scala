package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Small-file compaction planning over a store manifest.
  *
  * At 100 TB the bucketed parquet store's operational failure mode is
  * file-count explosion: every incremental cycle appends small files
  * per bucket (see BucketedLayout), and scan cost degrades with open()
  * count long before byte count. The planner turns a manifest
  * (bucket, file, rows) into deterministic merge groups: files below
  * the small-file threshold pack greedily IN FILE ORDER into groups of
  * ~targetRows (each group closes once its cumulative row count
  * crosses the target), files at/above threshold pass through as
  * `keep` singletons.
  *
  * Determinism/scale shape: ONE window partitioned by bucket over the
  * MANIFEST (file-cardinality rows, never data rows) computes the
  * running total; group identity `(cum − rows) DIV target` is pure
  * BIGINT floor arithmetic, so the plan replays identically in any
  * engine and is insensitive to partition layout. The data itself is
  * never read — executing the plan is a per-group rewrite job.
  */
object Compaction {

  def plan(manifest: DataFrame, bucketCol: String, fileCol: String,
           rowsCol: String, targetRows: Long, smallThreshold: Long)
      : DataFrame = {
    require(targetRows > 0 && smallThreshold > 0,
      "targetRows and smallThreshold must be positive")
    val small = manifest.filter(col(rowsCol) < smallThreshold)
    val big = manifest.filter(col(rowsCol) >= smallThreshold)
    val w = Window.partitionBy(col(bucketCol)).orderBy(col(fileCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val merged = small
      .withColumn("__cum", sum(col(rowsCol)).over(w))
      .withColumn("__grp",
        expr(s"(__cum - $rowsCol) DIV ${targetRows}L"))
      .groupBy(col(bucketCol).as("bucket"), col("__grp"))
      .agg(count(lit(1)).as("n_files"),
        sum(col(rowsCol)).as("rows_total"),
        min(col(fileCol)).as("file_lo"),
        max(col(fileCol)).as("file_hi"))
      .select(col("bucket"),
        when(col("n_files") > 1L, lit("merge")).otherwise(lit("keep"))
          .as("action"),
        col("n_files"), col("rows_total"), col("file_lo"), col("file_hi"))
    val kept = big.select(col(bucketCol).as("bucket"),
      lit("keep").as("action"), lit(1L).as("n_files"),
      col(rowsCol).cast("long").as("rows_total"),
      col(fileCol).as("file_lo"), col(fileCol).as("file_hi"))
    merged.unionByName(kept)
  }
}
