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
}
