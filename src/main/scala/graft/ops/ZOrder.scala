package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering — multi-dimensional data layout for
  * parquet min/max pruning at 100 TB.
  *
  * Sorting a table by ONE column makes filters on that column prune
  * row groups, but filters on any other column read everything.
  * Interleaving the bits of several columns into one sort key gives
  * every participating dimension locality: a range predicate on ANY of
  * them overlaps only O(fraction^(1/n)) of the files instead of all of
  * them. This is the layout step a scan-heavy engine applies at write
  * time so that Spark's scan-time pruning (`PushedFilters` + footer
  * min/max) has something to bite on — the distributed analog of the
  * reference arranging its target tables for indexed access
  * (`internal/schemas.go:217`).
  *
  * The key is pure integer arithmetic over codegen'd built-ins
  * (shift/mod/multiply — no UDF), identical in DuckDB, so the key
  * computation itself is oracle-checkable bit-for-bit.
  */
object ZOrder {

  /** Morton key: interleave the low `bitsPer` bits of each column
    * (col i contributes bit b to key position b·n + i). Inputs must be
    * non-negative; callers mask/shift their values into range first
    * (e.g. `pmod(c, 1 << bitsPer)`).
    */
  def zkey(cols: Seq[Column], bitsPer: Int): Column = {
    val n = cols.size
    require(n >= 2, "zkey interleaves at least two columns")
    require(n * bitsPer <= 62, s"zkey width ${n * bitsPer} exceeds 62 bits")
    val terms =
      for { (c, i) <- cols.zipWithIndex; b <- 0 until bitsPer }
        yield shiftright(c.cast("long"), b) % 2L * lit(1L << (b * n + i))
    terms.reduce(_ + _)
  }

  /** The identical arithmetic as ANSI SQL text (DuckDB oracle side). */
  def zkeySql(colNames: Seq[String], bitsPer: Int): String = {
    val n = colNames.size
    val terms =
      for { (c, i) <- colNames.zipWithIndex; b <- 0 until bitsPer }
        yield s"((($c >> $b) & 1) * ${1L << (b * n + i)})"
    terms.mkString("(", " + ", ")")
  }

  /** Write `df` clustered by the Z-key of `zcols` (each masked to
    * `bitsPer` bits): range-repartition on the key so each output file
    * covers a compact Z-range, sort within partitions so row groups
    * are compact too. Min/max footers on every clustered column then
    * prune both at the file level (Spark's scan listing) and the
    * row-group level (parquet reader). The key column itself is
    * dropped — it is layout, not data.
    */
  def writeClustered(df: DataFrame, zcols: Seq[String], bitsPer: Int,
                     path: String, numFiles: Int): Unit = {
    val key = zkey(zcols.map(c => pmod(col(c), lit(1L << bitsPer))), bitsPer)
    df.withColumn("_zkey", key)
      .repartitionByRange(numFiles, col("_zkey"))
      .sortWithinPartitions("_zkey")
      .drop("_zkey")
      .write.mode("overwrite").parquet(path)
  }

  /** Min/max prune-rate SIMULATOR — the report that justifies (or
    * kills) a re-clustering job before anyone pays for it: model three
    * write layouts of the same table (value-range-partitioned by
    * column A, by column B, and by the Morton key over both), compute
    * every simulated file's per-column min/max — exactly the parquet
    * footer stats scan pruning reads — and count, for a grid of range
    * predicates on each dimension, how many files a scan must touch.
    *
    * The output quantifies CLUSTER.md's layout trade as data: a
    * single-column layout prunes its own column's predicates to
    * ~width/fileWidth files and the OTHER column's to nothing, while
    * the Z-layout prunes BOTH to the O(√fraction) tile band — e.g. at
    * 64 files over 10-bit domains, a width-64 predicate scans 4 files
    * under its own range layout, 64 under the other, 8 under Z.
    *
    * Everything is integer arithmetic on masked values (pmod 2^bits —
    * the zkey convention), file ids are value-equidistant splits
    * (key·nFiles div keySpace — a range-partitioned write), and the
    * predicate grid is the equal division of the masked domain, so
    * the whole simulation replays in DuckDB bit-for-bit. Scale shape:
    * ONE scan (the three layouts explode per-row into (layout,
    * file_id) pairs), one partial-agg min/max groupBy over ≤ 3·nFiles
    * file rows, then a broadcast predicate grid over that tiny table.
    * n_files counts NON-EMPTY files per layout (empty value ranges
    * produce no file, honestly).
    */
  def pruneSim(df: DataFrame, colA: String, colB: String, bitsPer: Int,
               nFiles: Int, nPreds: Int): DataFrame = {
    require(bitsPer >= 2 && 2 * bitsPer <= 62, s"bad bitsPer $bitsPer")
    require(nFiles >= 2 && nPreds >= 2, "need nFiles >= 2 and nPreds >= 2")
    val space = 1L << bitsPer
    val zspace = 1L << (2 * bitsPer)
    val keyed = df
      .select(pmod(col(colA).cast("long"), lit(space)).as("a"),
        pmod(col(colB).cast("long"), lit(space)).as("b"))
      .withColumn("z", zkey(Seq(col("a"), col("b")), bitsPer))
    val exploded = keyed.select(explode(array(
        struct(lit(s"range_$colA").as("layout"),
          expr(s"a * $nFiles div $space").as("file_id"),
          col("a"), col("b")),
        struct(lit(s"range_$colB").as("layout"),
          expr(s"b * $nFiles div $space").as("file_id"),
          col("a"), col("b")),
        struct(lit("zorder").as("layout"),
          expr(s"z * $nFiles div $zspace").as("file_id"),
          col("a"), col("b")))).as("e"))
      .select(col("e.layout").as("layout"), col("e.file_id").as("file_id"),
        col("e.a").as("a"), col("e.b").as("b"))
    val files = exploded.groupBy(col("layout"), col("file_id"))
      .agg(min("a").as("min_a"), max("a").as("max_a"),
        min("b").as("min_b"), max("b").as("max_b"))
    val preds = df.sparkSession.createDataFrame(
      for { dim <- Seq(colA, colB); i <- 0L until nPreds.toLong }
        yield (dim, i, i * space / nPreds, (i + 1) * space / nPreds))
      .toDF("dim", "pred_id", "lo", "hi")
    files.crossJoin(broadcast(preds))
      .withColumn("f_min",
        when(col("dim") === colA, col("min_a")).otherwise(col("min_b")))
      .withColumn("f_max",
        when(col("dim") === colA, col("max_a")).otherwise(col("max_b")))
      .groupBy(col("layout"), col("dim"), col("pred_id"),
        col("lo"), col("hi"))
      .agg(count(lit(1)).as("n_files"),
        sum(when(col("f_min") <= col("hi") - 1 && col("f_max") >= col("lo"),
          1L).otherwise(0L)).as("n_scanned"))
      .withColumn("prune_ppm",
        expr("(n_files - n_scanned) * 1000000 div n_files"))
  }
}
