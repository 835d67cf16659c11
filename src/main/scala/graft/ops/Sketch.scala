package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.util.Hashing

/** Bottom-k (KMV, "k minimum values") sketches over the portable md5
  * hash family — the sub-linear path for the two profiling questions
  * whose EXACT operators carry every distinct key through a shuffle:
  *
  *   - `profile_table`'s exact distinct count groups every distinct
  *     value digest (Profile.tableProfile); at 100 TB that shuffle is
  *     the job.
  *   - `dedup_source_overlap`'s exact overlap matrix self-joins every
  *     distinct (source, hash) pair (PipelineQueries); the join input
  *     is the whole corpus key set, twice.
  *
  * A KMV sketch answers both within ~1/sqrt(k) relative error while
  * only |groups|·k rows survive the scan: the k smallest hash values
  * of a set are a uniform sample of its distinct elements, the kth
  * smallest value estimates the set's density in hash space
  * (distinct ≈ (k-1)·|H|/h_k, Bar-Yossef et al. 2002), and the
  * sketch of a UNION is computable from the two sketches alone —
  * which makes the pairwise-overlap matrix a product of per-group
  * sketches instead of a corpus self-join (Beyer et al. 2007, the
  * DataSketches theta-sketch lineage).
  *
  * Everything is integer arithmetic on [[Hashing.portableHash64]]
  * values (60-bit, uniform, identical in Spark and DuckDB), so the
  * sketches — and the ESTIMATES — are bit-reproducible across runs,
  * partitionings, and engines, and the driver's DuckDB oracle
  * hash-gates them like any exact query. The exact operators stay as
  * the correctness baselines; these are the scale path, the same
  * exact-vs-bucketed split as dedup_embedding vs ann_lsh_pairs.
  */
object Sketch {

  /** Size of the portable hash space: portableHash64 reads 15 hex
    * chars = 60 bits, uniform on [0, 2^60). */
  val HashSpace: Long = 1L << 60

  /** Bottom-k sketch per group: the k smallest distinct 60-bit hashes
    * of `value` within each `groupCol` group, as (group, h, pos) rows
    * with pos = 0-based rank. Groups with fewer than k distinct
    * values keep everything (the sketch is then EXACT — downstream
    * estimators detect saturation via pos count < k).
    *
    * Scale shape: the only corpus-sized work is one partial-agg
    * distinct on (group, hash) — key-only, 8-byte hashes over the
    * wire, never values — followed by a SALTED two-stage k-min: per
    * (group, hash mod salts) bottom-k first (each salt partition
    * holds ~1/salts of the group's hashes, so no single-partition
    * funnel on a dominant group), then bottom-k of the ≤ salts·k
    * survivors per group. Every global bottom-k hash ranks ≤ k
    * within its own salt, so the two-stage result EQUALS the direct
    * window — the oracle replays the direct form.
    */
  def kmv(df: DataFrame, groupCol: String, value: Column, k: Int,
          salts: Int = 16): DataFrame =
    kmvFromHashes(
      df.select(col(groupCol), Hashing.portableHash64(value).as("h"))
        // null values hash to null, and the engines disagree on where
        // nulls rank in a window (Spark NULLS FIRST, DuckDB NULLS
        // LAST) — a sketch counts distinct NON-null values, like
        // count(col)
        .filter(col("h").isNotNull)
        .distinct(),
      groupCol, k, salts)

  /** [[kmv]] over rows already carrying distinct non-null hashes in
    * an `h` column — the entry point for callers that merge an
    * existing sketch with fresh hashes (the streaming cardinality
    * monitor's state update) and must apply the IDENTICAL selection
    * rule.
    */
  def kmvFromHashes(hashed: DataFrame, groupCol: String, k: Int,
                    salts: Int = 16): DataFrame = {
    require(k >= 2, s"kmv needs k >= 2, got $k")
    require(salts >= 1, s"kmv needs salts >= 1, got $salts")
    val w1 = Window.partitionBy(col(groupCol), col("__salt")).orderBy(col("h"))
    val w2 = Window.partitionBy(col(groupCol)).orderBy(col("h"))
    hashed
      .withColumn("__salt", pmod(col("h"), lit(salts.toLong)))
      .withColumn("__r", row_number().over(w1))
      .filter(col("__r") <= k)
      .drop("__salt", "__r")
      .withColumn("pos", row_number().over(w2).cast("long") - 1L)
      .filter(col("pos") < k)
  }

  /** The KMV distinct estimate as an integer column expression:
    * exact k_eff when the sketch is unsaturated (it holds ALL
    * distinct hashes), else ⌊(k-1)·|H| / h_k⌋ — division against the
    * kth-smallest hash, computed in 64-bit as quotient-plus-remainder:
    *
    *   (k-1)·(|H| div h) + ((k-1)·((|H| mod h) div k)) div (h div k)
    *
    * Flooring (|H| div h) BEFORE the multiply loses up to one full
    * quotient unit — at n close to k the quotient is ~1, so the naive
    * form underestimates by up to ~50% (e.g. k=64, n=70: est 63 vs
    * ~69), which in the cardinality monitor reads as a false
    * duplication alert. The remainder term recovers it; both its
    * operands are pre-shifted down by k so (k-1)·((|H| mod h) div k)
    * < |H| < 2⁶³ can never overflow Long for ANY k, at the cost of a
    * remainder error ≤ (k-1)/(h div k) — relative error ~k/|H|,
    * vanishing against the sketch's own 1/sqrt(k) noise. All operands
    * positive, so both engines truncate identically and the oracle
    * replays the same arithmetic verbatim. greatest(h, 1) and
    * greatest(h div k, 1) guard the measure-zero tiny-hash cases:
    * DuckDB raises on integer division by zero where Spark yields
    * null, and a guard both engines evaluate identically is cheaper
    * than either behavior.
    */
  private[graft] def estimate(kEff: Column, hKName: String, k: Int): Column = {
    val h = s"greatest($hKName, 1)"
    when(kEff < k, kEff)
      .otherwise(expr(
        s"${k - 1} * ($HashSpace div $h) + " +
          s"(${k - 1} * (($HashSpace % $h) div $k)) div greatest($h div $k, 1)"))
  }

  /** Sketched per-group distinct count — `profile_table`'s
    * n_distinct at 100 TB: (group, k_eff, h_k, est_distinct), one
    * row per group. k_eff < k marks the exact (unsaturated) case.
    */
  def distinctCount(df: DataFrame, groupCol: String, value: Column,
                    k: Int, salts: Int = 16): DataFrame =
    kmv(df, groupCol, value, k, salts)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("k_eff"), max(col("h")).as("h_k"))
      .withColumn("est_distinct", estimate(col("k_eff"), "h_k", k))

  /** Sketched pairwise-overlap matrix — `dedup_source_overlap` at
    * 100 TB: for every group pair (a < b), the union sketch's size
    * k_eff, the intersection count n_both within it, and the derived
    * integer estimates jaccard_ppm = n_both·10⁶ div k_eff,
    * est_union ≈ |A∪B|, est_shared ≈ |A∩B| (Jaccard × union size).
    * When both sketches are unsaturated the "estimates" are exact.
    *
    * Everything after [[kmv]] runs on ≤ |groups|·k rows: the pair
    * frame is |groups|² (broadcast), the union-sketch merge is two
    * broadcast joins + one window over ≤ 2k rows per pair. The
    * corpus never self-joins.
    */
  def overlap(df: DataFrame, groupCol: String, value: Column, k: Int,
              salts: Int = 16): DataFrame = {
    val ga = groupCol + "_a"
    val gb = groupCol + "_b"
    // the sketch feeds FOUR consumers (the group list twice via the
    // pair frame, then each join side): materialize its |groups|·k
    // rows once — without this the whole kmv subtree (corpus scan +
    // distinct shuffle included) replays per consumer, and exchange
    // reuse can't dedup it across the window stages (plan-verified).
    // Eager truncation via Lineage.truncate (durable under the
    // spark.graft.checkpointDir knob); the consumers run lazily when
    // the RESULT executes, so the truncated blocks must outlive this
    // call — retention is bounded at |groups|·k rows (k longs per
    // group) and the blocks are GC-released with the returned frame,
    // unlike a persist pinned until an explicit unpersist.
    val sk = graft.util.Lineage.truncate(
      kmv(df, groupCol, value, k, salts)
        .select(col(groupCol).as("__g"), col("h")))
    val gs = sk.select(col("__g")).distinct()
    val pairs = gs.select(col("__g").as(ga))
      .crossJoin(gs.select(col("__g").as(gb)))
      .filter(col(ga) < col(gb))
    val sides = broadcast(pairs).join(sk, col(ga) === col("__g"))
      .select(col(ga), col(gb), col("h"),
        lit(1L).as("in_a"), lit(0L).as("in_b"))
      .unionByName(broadcast(pairs).join(sk, col(gb) === col("__g"))
        .select(col(ga), col(gb), col("h"),
          lit(0L).as("in_a"), lit(1L).as("in_b")))
    val w = Window.partitionBy(col(ga), col(gb)).orderBy(col("h"))
    sides.groupBy(ga, gb, "h")
      .agg(max("in_a").as("in_a"), max("in_b").as("in_b"))
      .withColumn("__r", row_number().over(w))
      .filter(col("__r") <= k)
      .groupBy(ga, gb)
      .agg(count(lit(1)).as("k_eff"),
        sum(col("in_a") * col("in_b")).as("n_both"),
        max(col("h")).as("h_k"))
      .withColumn("est_union", estimate(col("k_eff"), "h_k", k))
      .withColumn("jaccard_ppm", expr("n_both * 1000000 div k_eff"))
      .withColumn("est_shared", expr("n_both * est_union div k_eff"))
      .drop("h_k")
  }
}
