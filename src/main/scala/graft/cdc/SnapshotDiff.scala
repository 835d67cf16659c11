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
}
