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
  * "PK present on both sides with differing payload".
  */
object SnapshotDiff {

  def diff(oldSnap: DataFrame, newSnap: DataFrame, pkCols: Seq[String]): DataFrame = {
    val payloadCols = newSnap.columns.filterNot(pkCols.contains).sorted.toSeq
    require(payloadCols.nonEmpty, "snapshot diff needs at least one non-PK column")
    def hashed(df: DataFrame, tag: String) =
      df.select(pkCols.map(col) :+
        md5(concat_ws("|", payloadCols.map(c => col(c).cast("string")): _*)).as(s"${tag}_hash"): _*)
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
