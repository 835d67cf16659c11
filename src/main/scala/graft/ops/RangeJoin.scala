package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalable point-in-interval (range) join.
  *
  * A range predicate (`lo <= pt < hi`) has no equality key, so Spark's
  * only built-in physical shapes are broadcast-nested-loop or a
  * cartesian product — both compare every point against every interval,
  * O(P·I) regardless of how few pairs match. The standard distributed
  * fix is BINNING: quantize the domain into fixed-width bins, explode
  * each interval into the bins it covers, map each point to its single
  * bin, and equi-join on the bin — Catalyst then plans an ordinary
  * hash join (broadcast when the interval side is small), and only
  * same-bin candidates are ever compared. An exact containment filter
  * removes same-bin non-matches.
  *
  * Each matching (point, interval) pair meets in EXACTLY one bin — the
  * point's — so the output needs no dedup shuffle.
  *
  * `binWidth` trades fan-out for selectivity: intervals explode into
  * `len/binWidth + 1` rows, and a point meets every interval sharing
  * its bin. Set it near the TYPICAL interval length (fan-out ≈ 2 and
  * candidate lists stay short). Skewed point-time distributions fall
  * out as ordinary equi-join skew, which AQE's skew-join split handles
  * — nothing here is skew-sensitive by construction.
  */
object RangeJoin {

  /** Floor-division bin of a (positive or negative) long value.
    * All-integer arithmetic: `pmod` makes the numerator an exact
    * multiple of `w`, so SQL `div`'s truncation IS the floor — and
    * unlike a Double quotient it stays exact past 2^53 (nanosecond
    * timestamps, hash-derived coordinates). Domain bound: values must
    * exceed Long.MinValue + w (the pmod subtraction would underflow).
    */
  private def bin(c: Column, w: Long): Column =
    call_function("div", c - pmod(c, lit(w)), lit(w))

  /** Join `points` to every interval of `intervals` containing them:
    * `lo <= pt < hi` (half-open, the time-window convention). Output =
    * one row per matching pair, carrying all columns of both inputs
    * (names must not collide).
    *
    * `broadcastIntervals` picks the 100 TB plan for the common
    * many-points × few-intervals shape: the exploded interval side is
    * broadcast and the point side streams through a single map-side
    * stage — NO shuffle of the big side at all. With a large interval
    * side, pass false: both sides shuffle once on the bin key.
    */
  def pointInInterval(points: DataFrame, ptCol: String,
                      intervals: DataFrame, loCol: String, hiCol: String,
                      binWidth: Long,
                      broadcastIntervals: Boolean = true): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    // half-open [lo, hi): the last covered bin is the one holding hi-1;
    // an empty interval (hi <= lo) covers no bins and joins nothing
    val binned = intervals
      .filter(col(hiCol) > col(loCol))
      .withColumn("__bin",
        explode(sequence(bin(col(loCol), binWidth), bin(col(hiCol) - 1, binWidth))))
    val r = if (broadcastIntervals) broadcast(binned) else binned
    points.withColumn("__bin", bin(col(ptCol), binWidth))
      .join(r, "__bin")
      .filter(col(ptCol) >= col(loCol) && col(ptCol) < col(hiCol))
      .drop("__bin")
  }

  /** Interval-OVERLAP join: pair every left interval with every right
    * interval of the same key whose half-open span intersects it
    * (`lLo < rHi && rLo < lHi`) — the two-interval-relation member of
    * the range-join family that [[pointInInterval]] (point×interval)
    * can't express: session×session overlap, downtime×maintenance
    * reconciliation, crawl-window×license-window accounting.
    *
    * Same binning idea, both sides exploded: overlapping pairs share
    * every bin their intersection covers, so a naive bin equi-join
    * would emit duplicates. The dedup is FREE, not a shuffle: a pair's
    * shared bins start exactly at `bin(greatest(lLo, rLo))` (bin() is
    * monotone, and the intersection of two overlapping half-open
    * spans begins at the later start), so keeping only the meeting at
    * THAT bin counts each pair once — no `distinct`, no window.
    *
    * Scale shape: both sides explode into `len/binWidth + 1` rows
    * (size binWidth near the typical interval length: fan-out ≈ 2),
    * then ONE (key, bin) equi-join — hash-partitioned, or map-side
    * with `broadcastRight` for the big-facts × small-windows shape.
    * Key skew is ordinary equi-join skew (AQE splits it). Column
    * names of the two inputs must not collide.
    */
  def overlapJoin(left: DataFrame, lLo: String, lHi: String,
                  right: DataFrame, rLo: String, rHi: String,
                  keyCols: Seq[(String, String)], binWidth: Long,
                  broadcastRight: Boolean = false): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    // distinct bin names (not one ambiguous "__bin"): both sides often
    // derive from the same base relation, and qualified df("col")
    // references across a self-join are fragile in that case
    def explodeBins(df: DataFrame, lo: String, hi: String, as: String) = df
      .filter(col(hi) > col(lo))
      .withColumn(as,
        explode(sequence(bin(col(lo), binWidth), bin(col(hi) - 1, binWidth))))
    val l = explodeBins(left, lLo, lHi, "__lbin")
    val rb = explodeBins(right, rLo, rHi, "__rbin")
    val r = if (broadcastRight) broadcast(rb) else rb
    val keyEq = keyCols.map { case (lk, rk) => col(lk) === col(rk) }
      .foldLeft(col("__lbin") === col("__rbin"))(_ && _)
    l.join(r, keyEq)
      .filter(col(lLo) < col(rHi) && col(rLo) < col(lHi) &&
        col("__lbin") === bin(greatest(col(lLo), col(rLo)), binWidth))
      .drop("__lbin", "__rbin")
  }
}
