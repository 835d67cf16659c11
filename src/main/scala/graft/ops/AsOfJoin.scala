package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time-correct (as-of) join — the feature-store/training-
  * pipeline staple: for every left row at time t, attach the LATEST
  * right row with the same key and time ≤ t.
  *
  * Spark-first formulation: pack the right payload into ONE struct,
  * tag both sides, `unionByName`, and carry the last non-null struct
  * forward per key with a single window ordered by
  * (time, side, tiebreak). ONE hash shuffle on the key — never a
  * per-row range probe, never a non-equi join explosion; at 100 TB
  * the shuffle is the same one any per-key window costs. The struct
  * makes the row pick atomic (no cross-row mixing when payload fields
  * are null) and struct ordering gives a deterministic winner among
  * equal-time right rows (greatest tiebreak fields win).
  *
  * Right rows sharing a timestamp with a left row DO match (≤, as-of
  * semantics). Output: all left columns + the payload columns (null
  * when no right row precedes). Payload names must not collide with
  * left columns — rename on the right first.
  */
object AsOfJoin {

  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
           tsCol: String, payloadCols: Seq[String],
           tieBreak: Seq[String] = Nil): DataFrame = {
    val tb = if (tieBreak.nonEmpty) tieBreak else payloadCols
    val structFields = (tb ++ payloadCols.filterNot(tb.contains)).map(col(_))
    val l = left.withColumn("__side", lit(1))
    val r = right
      .select((keys :+ tsCol).map(col(_)) :+ struct(structFields: _*).as("__p"): _*)
      .withColumn("__side", lit(0))
    val u = l.unionByName(r, allowMissingColumns = true)
    // right rows sort before left at equal time (side 0 < 1); struct
    // ordering is field-wise, so tiebreak fields placed first decide
    // ties among right rows deterministically
    val w = Window.partitionBy(keys.map(col(_)): _*)
      .orderBy(col(tsCol).asc, col("__side").asc, col("__p").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    u.withColumn("__p", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(left.columns.toSeq.map(col(_)) ++
        payloadCols.map(p => col(s"__p.$p").as(p)): _*)
  }
}
