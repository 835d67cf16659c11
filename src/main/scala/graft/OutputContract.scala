package graft

import org.apache.spark.sql.types._

/** Build-time guard over every gated query's OUTPUT schema.
  *
  * The driver's correctness gate hashes result values type-sensitively
  * after a DuckDB replay, so a column whose value round-trips but whose
  * TYPE renders differently across engines hash-fails even when the
  * math is exact. Two rounds hit this family: round 8 (interpolated
  * DOUBLE percentiles — Spark and DuckDB interpolate in different ulp
  * paths) and round 9 (decimal(38,0) totals — DuckDB sum() widens to
  * HUGEINT and the compare saw `57447.0 vs 57447`, the q_changepoint
  * lesson in PERF.md). The stable output contract is: integers as
  * BIGINT, text as STRING, and DOUBLE only where a documented exception
  * argues the bits are identical on both engines.
  *
  * This object rejects, for every `SparkEntry.queries` output column:
  *   - DecimalType wider than 18 digits (DuckDB renders as HUGEINT /
  *     unscaled decimal, Spark as java.math.BigDecimal — never emit;
  *     cast to BIGINT with a documented overflow bound, or STRING),
  *   - DoubleType / FloatType not on the documented whitelist below.
  *
  * Enforced in two places: `OutputContractSpec` (sbt test — the
  * build-time gate) and `Verify` (the driver dump — a violating query
  * fails its own dump loudly instead of burning a round on a red hash).
  */
object OutputContract {

  /** Documented double-output exceptions. Every entry below is
    * driver-verified hash-green (CORRECTNESS_r09, all three scale
    * factors) and falls into one of four argued-bit-exact classes; a
    * NEW double column fails the contract until it is consciously
    * added here with its class. Classes (details in PERF.md):
    *
    *  1. PASS-THROUGH — the column is a stored input double emitted
    *     unchanged (copies, as-of payloads, exact lower quantiles =
    *     actual sampled values): bit-identical by construction.
    *  2. ONE-OP — a single IEEE operation on exactly-representable
    *     integers/longs (jaccard = |∩|/|∪| of longs, cosine =
    *     quantized-long dot over integer norms, ratios of counts,
    *     p=0.5 median = one add + one halve): IEEE 754 requires
    *     correctly-rounded +,-,*,/ — both engines produce the same
    *     bits.
    *  3. SMALL-EXACT SUM — sums whose addends and partials are
    *     integers or dyadic-scaled decimals small enough to stay
    *     exactly representable (quantities, 2-decimal prices at sf
    *     scale): every addition is exact, so order doesn't matter.
    *  4. FIXED-FOLD — a deterministic constant-length fold where both
    *     sides evaluate literally the same expression tree over the
    *     same exact aggregates (corr, zipf slope, mean logprob as
    *     sum/count of one-op terms).
    */
  val doubleWhitelist: Set[(String, String)] = Set(
    // 1. pass-through stored doubles
    ("cdc_full_copy", "l_quantity"), ("cdc_full_copy", "l_extendedprice"),
    ("cdc_full_copy", "l_discount"), ("cdc_full_copy", "l_tax"),
    ("cdc_incremental_pull", "value"), ("cdc_latest_by_key", "value"),
    ("cdc_merge_upsert", "o_totalprice"),
    ("cdc_conflict_resolve", "o_totalprice"),
    ("cdc_apply_changelog", "o_totalprice"),
    // pass-through for untouched rows; updated rows are ONE IEEE add
    // of the dyadic constant 10.0 to the stored double (class 2)
    ("cdc_join_maintain", "o_totalprice"),
    ("cdc_join_maintain_outer", "o_totalprice"),
    ("cdc_join_stream_outer", "o_totalprice"),
    // pass-through stored doubles; updated rows are ONE IEEE add of the
    // dyadic constant 1.0 (class 2)
    ("cdc_star_maintain", "l_quantity"),
    ("cdc_changed_range_resync", "o_totalprice"),
    ("q_topk_window", "o_totalprice"), ("q_asof_join", "purchase_value"),
    ("q_anomaly_zscore", "value"), ("q_anomaly_mad", "value"),
    ("q_range_join", "click_value"), ("q_gap_fill", "filled_value"),
    ("q_percentiles", "p25"), ("q_percentiles", "p50"),
    ("q_percentiles", "p75"),
    // exact weighted lower quantile = an actual stored price row
    ("q_weighted_percentile", "value"),
    ("profile_quantiles_sketch", "p50"), ("profile_quantiles_sketch", "p90"),
    ("profile_quantiles_sketch", "p99"),
    // 2. one-op over exact integers
    ("ann_topk", "cosine"), ("ann_ivf", "cosine"), ("ann_lsh_pairs", "cosine"),
    ("ann_cascade", "cosine"), ("ann_filtered", "cosine"),
    ("ann_nndescent", "cosine"), ("ann_graph_search", "cosine"),
    ("ann_graph_hier", "cosine"), ("ann_graph_persisted", "cosine"),
    ("ann_graph_delete", "cosine"),
    ("dedup_embedding", "cosine"), ("dedup_semantic", "cosine"),
    ("dedup_semantic_init", "cosine"), ("emb_kmeans", "centroid_cosine"),
    ("emb_kmeans_init", "centroid_cosine"),
    ("ann_ivf_assign", "centroid_cosine"),
    ("ann_ivf_search", "cosine"), ("ann_ivf_delete", "cosine"),
    ("ann_hard_negatives", "cosine"),
    ("dedup_minhash_lsh", "jaccard"), ("dedup_ngram_jaccard", "jaccard"),
    ("dedup_incremental_lsh", "jaccard"),
    ("text_quality", "punct_ratio"), ("text_quality", "digit_ratio"),
    ("text_quality", "stopword_ratio"), ("text_quality", "mean_token_len"),
    ("text_repetition", "dup_token_frac"), ("text_repetition", "dup_bigram_frac"),
    ("q_heavy_hitters", "share"), ("q_join_advise", "match_coverage"),
    // 3. small-exact sums at gate scale
    ("q1_agg", "sum_qty"), ("q1_agg", "sum_base_price"),
    ("q1_agg", "sum_disc_price"), ("q1_rollup", "sum_qty"),
    ("q3_join_agg", "revenue"), ("q5_multijoin", "revenue"),
    ("q_skew_salted_join", "revenue"), ("q_bloom_join", "urgent_revenue"),
    ("q_cube", "sum_price"), ("q_events_window", "sum_value"),
    ("q_running_sum", "running_qty"), ("q_rolling_window", "rolling_value"),
    ("q_pivot", "qty_f"), ("q_pivot", "qty_o"),
    ("cdc_agg_maintain", "revenue"),
    // 4. fixed deterministic fold over exact aggregates
    ("profile_corr", "corr"), ("text_zipf_slope", "zipf_slope"),
    ("text_unigram_logprob", "mean_logprob"),
    ("text_bigram_logprob", "mean_logprob"),
    // same bit-exactness argument: p is two IEEE divisions of exact
    // longs + one add, one ln per row, round(avg, 4) fold
    ("text_kn_logprob", "mean_logprob")
  )

  /** Returns the violation messages for one query's schema (empty =
    * contract holds). */
  def violations(name: String, schema: StructType): Seq[String] =
    schema.fields.toSeq.flatMap { f =>
      f.dataType match {
        case d: DecimalType if d.precision > 18 =>
          Some(s"$name.${f.name}: decimal(${d.precision},${d.scale}) — " +
            "wide decimals hash as HUGEINT/BigDecimal differently across " +
            "engines; emit BIGINT (document the overflow bound) or STRING")
        case DoubleType | FloatType
            if !doubleWhitelist.contains((name, f.name)) =>
          Some(s"$name.${f.name}: ${f.dataType.simpleString} — floating " +
            "output is not a stable cross-engine contract; emit a " +
            "quantized BIGINT, or document bit-exactness and whitelist " +
            "in OutputContract.doubleWhitelist")
        case _ => None
      }
    }

  /** Throws on the first violating column; call with the un-executed
    * DataFrame's schema (schema resolution is plan-only — cheap). */
  def assertContract(name: String, schema: StructType): Unit = {
    val v = violations(name, schema)
    if (v.nonEmpty)
      throw new IllegalStateException(
        s"output-type contract violation:\n  ${v.mkString("\n  ")}")
  }
}
