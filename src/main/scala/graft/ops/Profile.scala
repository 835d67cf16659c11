package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-distribution profiling — the diagnostic pass a 100 TB job
  * runs BEFORE choosing a join strategy. A skewed key set is the root
  * cause behind every straggler shuffle; knowing the heavy hitters
  * decides broadcast vs salt vs AQE-skew-join (the same decision the
  * reference's chunked scan sidesteps by being single-node,
  * `internal/updates.go:68`).
  */
object Profile {

  /** Top-k most frequent keys with their corpus share, totally
    * ordered (count desc, key asc — deterministic across runs and
    * engines).
    *
    * Scale shape: one partial-aggregated groupBy; the total-row count
    * is the SUM over the same aggregate, so Catalyst's exchange reuse
    * runs the scan+shuffle ONCE (plan shows ReusedExchange, audited in
    * PlanAuditSpec). The ordered limit is TakeOrderedAndProject — a
    * per-partition top-k + driver merge of k·partitions rows, never a
    * global sort.
    */
  def heavyHitters(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum("cnt").as("total"))
    counts.crossJoin(broadcast(total))
      .select(col(keyCol), col("cnt"),
        round(col("cnt").cast("double") / col("total"), 6).as("share"))
      .orderBy(col("cnt").desc, col(keyCol).asc)
      .limit(k)
  }

  /** Per-key frequency histogram summary: how many keys occur once,
    * 2–9, 10–99, … times (log10 buckets). The shape tells you whether
    * a dedup/join key is near-unique (safe) or power-law (salt it).
    * Two partial-aggregated groupBys, both shuffle-bounded by the
    * distinct key count.
    */
  def keyDistribution(df: DataFrame, keyCol: String): DataFrame =
    df.groupBy(col(keyCol)).agg(count(lit(1)).as("cnt"))
      // decade = digits-1: exact integer arithmetic on every engine,
      // where floor(log10(n)) rides on libm rounding at powers of 10
      .select((length(col("cnt").cast("string")) - 1).cast("long").as("freq_decade"))
      .groupBy("freq_decade").agg(count(lit(1)).as("n_keys"))
}
