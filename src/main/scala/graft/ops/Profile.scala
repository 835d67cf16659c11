package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** Per-group z-score outlier scan — the metric-anomaly monitor
    * ("this purchase amount is 8σ off for its event type") run over an
    * event stream before it feeds dashboards or models.
    *
    * Determinism: values quantize to integer cents (round(·100)), so
    * per-group n, Σq, Σq² are EXACT longs (order/partitioning/engine
    * independent; longs hold to ~10⁹ rows per group at this value
    * range — beyond that, shard the group key before profiling). The
    * z-score is then ONE fixed chain of IEEE ops from those exact
    * integers — (q·n − Σq) / √(n·Σq² − Σq²) — using only +,−,×,÷,√,
    * every one correctly rounded, so DuckDB reproduces the doubles
    * bit-for-bit (stronger than the ln-based scores, which lean on
    * matching libm behavior).
    *
    * Scale shape: one partial-aggregatable groupBy to |groups| stat
    * rows, broadcast back onto the scan; the event stream itself
    * never shuffles. Output is the flagged tail only.
    */
  def zscoreOutliers(df: DataFrame, groupCol: String, valueCol: String,
                     zThreshold: Double): DataFrame =
    zscoreProbe(df, momentStats(df, groupCol, valueCol), groupCol, valueCol,
      zThreshold)

  /** Per-group exact moments (n, Σq, Σq²) of the cents-quantized
    * value — the model half of the z-score scan, reusable as a STATIC
    * reference (streaming monitors score new batches against moments
    * of an already-admitted corpus).
    */
  def momentStats(df: DataFrame, groupCol: String, valueCol: String): DataFrame =
    df.select(col(groupCol), round(col(valueCol) * 100).cast("long").as("q"))
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n"), sum("q").as("s1"),
        sum(col("q") * col("q")).as("s2"))

  /** Probe half: flag rows of `df` whose value is > zThreshold σ from
    * their group's mean under `stats` (a [[momentStats]] output —
    * from the same data for the batch scan, or a frozen reference for
    * the streaming monitor). Groups present in `df` but absent from
    * `stats` are ignored (inner join): no model, no verdict.
    */
  def zscoreProbe(df: DataFrame, stats: DataFrame, groupCol: String,
                  valueCol: String, zThreshold: Double): DataFrame =
    df.withColumn("q", round(col(valueCol) * 100).cast("long"))
      .join(broadcast(stats), Seq(groupCol))
      // zero-variance guard, in EXACT long arithmetic: without it a
      // constant group yields z = 0/0 = NaN, and BOTH engines order
      // NaN above every number — abs(NaN) > t would flag the whole
      // group
      .filter(col("n") * col("s2") > col("s1") * col("s1"))
      .withColumn("z",
        (col("q").cast("double") * col("n") - col("s1"))
          / sqrt(col("n").cast("double") * col("s2")
            - col("s1").cast("double") * col("s1")))
      .filter(abs(col("z")) > zThreshold)
      .withColumn("z_milli", round(col("z") * 1000).cast("long"))
      .drop("q", "n", "s1", "s2", "z")

  /** Median/MAD robust outlier scan — [[zscoreOutliers]]'s
    * heavy-tail-safe sibling: mean and σ are themselves dragged by the
    * outliers they're meant to find, while the median and the median
    * absolute deviation have a 50% breakdown point, so a batch that is
    * 20% garbage still gets scored against the clean majority.
    *
    * Determinism: values quantize to integer cents, and the medians
    * are interpolated percentiles over those integers AT p = 0.5 —
    * which is ulp-exact cross-engine, unlike general interpolated
    * percentiles (the round-8 profile_embeddings failure class):
    * the position fraction (n−1)·0.5 is exactly 0 or ½, so
    * lo + (hi−lo)·frac over longs < 2⁵³ involves only exact IEEE ops
    * (a halving is a power-of-two scale), and the result is exactly
    * k or k+0.5 — on which round(·, 6) is the identity. This
    * exactness argument holds ONLY at p = 0.5 over integer inputs;
    * never copy this shape for other p. The score is then one fixed
    * chain of correctly-rounded IEEE ops. Zero-MAD groups (> 50%
    * identical values) are excluded exactly, like the zero-variance
    * guard.
    *
    * Scale shape: TWO grouped exact percentiles (|groups| rows each,
    * sort-based within group — the same cost class as quality_band's
    * band edges; at extreme group sizes swap in approx_percentile and
    * re-pin the oracle bracket) with the stat table broadcast back
    * onto the scan; the event stream never shuffles.
    */
  def madOutliers(df: DataFrame, groupCol: String, valueCol: String,
                  k: Double): DataFrame =
    madProbe(df, madStats(df, groupCol, valueCol), groupCol, valueCol, k)

  /** Per-group (median, MAD) of the cents-quantized value — the model
    * half of [[madOutliers]], reusable as a FROZEN reference for the
    * streaming monitor (same split as [[momentStats]]/[[zscoreProbe]]).
    */
  def madStats(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val base = df.withColumn("q", round(col(valueCol) * 100).cast("long"))
    val med = base.groupBy(groupCol)
      .agg(round(expr("percentile(q, 0.5)"), 6).as("med"))
    base.join(broadcast(med), Seq(groupCol))
      .withColumn("dev", abs(col("q") - col("med")))
      .groupBy(groupCol)
      .agg(first(col("med")).as("med"),
        round(expr("percentile(dev, 0.5)"), 6).as("mad"))
  }

  /** Robust scaling — the feature-normalization transform every
    * model-input pipeline runs where z-scores break: (value − median)
    * / IQR, with median and quartiles immune to the heavy tails that
    * drag mean/σ (sklearn RobustScaler lineage; the transform sibling
    * of [[madOutliers]], which only FLAGS).
    *
    * Integer-exact contract (round 9): values quantize to cents,
    * median/Q1/Q3 are the LOWER exact quantiles (sampled longs at rank
    * floor(p·(n−1)), integer rank arithmetic — the cross-engine-stable
    * quantile form), and the output is ((q − med)·1000) div IQR. The
    * numerator can be NEGATIVE — which is fine because Spark's `div`
    * and DuckDB's `//` BOTH truncate toward zero (verified: −999 // 2
    * = −499 on both engines); had either floored, the two would split
    * on every below-median row. Zero-IQR groups (> 50% identical
    * values) are excluded exactly, the zero-MAD convention.
    *
    * Scale shape: quantiles from a per-(group, value) count aggregate
    * + one per-group ordered cumulative pass over distinct values (no
    * full-group sort buffer); the |groups|-row stat table broadcasts
    * back onto the scan — the event stream never shuffles.
    */
  def robustScale(df: DataFrame, groupCol: String, idCol: String,
                  valueCol: String): DataFrame = {
    val base = df.select(col(groupCol), col(idCol),
      round(col(valueCol) * 100).cast("long").as("q"))
    val counts = base.groupBy(col(groupCol), col("q"))
      .agg(count(lit(1)).as("cnt"))
    val totals = base.groupBy(col(groupCol)).agg(count(lit(1)).as("n"))
    val wCum = Window.partitionBy(groupCol).orderBy(col("q"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val stats = counts.join(broadcast(totals), Seq(groupCol))
      .withColumn("cum", sum(col("cnt")).over(wCum))
      .groupBy(col(groupCol))
      .agg(
        min(when(col("cum") >= expr("(n - 1) div 4 + 1"), col("q"))).as("q1"),
        min(when(col("cum") >= expr("(n - 1) div 2 + 1"), col("q"))).as("med"),
        min(when(col("cum") >= expr("((n - 1) * 3) div 4 + 1"), col("q"))).as("q3"))
      .withColumn("iqr", col("q3") - col("q1"))
    base.join(broadcast(stats), Seq(groupCol))
      .filter(col("iqr") > 0L)
      .withColumn("num", (col("q") - col("med")) * 1000L)
      .select(col(idCol), col(groupCol),
        expr("num div iqr").as("robust_milli"))
  }

  /** Probe half of the MAD scan: flag rows of `df` whose value is
    * > k MAD from the group median under `stats`. Zero-MAD groups are
    * excluded exactly.
    */
  def madProbe(df: DataFrame, stats: DataFrame, groupCol: String,
               valueCol: String, k: Double): DataFrame =
    df.withColumn("q", round(col(valueCol) * 100).cast("long"))
      .join(broadcast(stats), Seq(groupCol))
      .filter(col("mad") > 0.0)
      .withColumn("score", abs(col("q") - col("med")) / col("mad"))
      .filter(col("score") > k)
      .withColumn("mad_score_milli", round(col("score") * 1000).cast("long"))
      .drop("q", "med", "mad", "score")

  /** Column-level data-quality profile — the validate-the-dump-before-
    * ingesting pass (Deequ-lineage): per column, row count, null
    * count, EXACT distinct count, and lexicographic min/max. A crawl
    * dump whose `lang` column suddenly has 40% nulls or whose id
    * column's distinct count ≠ row count gets caught here, before any
    * downstream operator trains on it.
    *
    * One pass over the table: `stack` unpivots the profiled columns
    * into (col_name, val) rows — the standard one-scan trade (×|cols|
    * row inflation) against |cols| separate scans. Distinct counting
    * groups on md5(val), NOT val, so only 32-hex-char digests cross
    * the wire even when the column is document text; both engines
    * group on the same digest, so (astronomically unlikely) collisions
    * affect both identically. min/max track a 64-char prefix — prefix
    * truncation is monotone under lexicographic order (strings
    * differing within the prefix keep their order; strings equal
    * through it tie), so `min(prefix)` IS the prefix of the true min —
    * bounding the bytes per group by O(1) instead of the longest
    * document. Two partial-aggregatable groupBys, shuffle bounded by
    * Σ per-column distinct counts; output is |cols| rows.
    */
  def tableProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "tableProfile needs at least one column")
    val stackArgs = cols
      .map(c => s"'$c', cast(`$c` as string)").mkString(", ")
    df.selectExpr(s"stack(${cols.size}, $stackArgs) as (col_name, val)")
      .groupBy(col("col_name"), md5(col("val")).as("h"))
      .agg(count(lit(1)).as("cnt"),
        min(substring(col("val"), 1, 64)).as("vmin"),
        max(substring(col("val"), 1, 64)).as("vmax"))
      .groupBy("col_name")
      .agg(sum("cnt").as("n_rows"),
        coalesce(sum(when(col("h").isNull, col("cnt"))), lit(0L)).as("n_nulls"),
        count(col("h")).as("n_distinct"),
        min("vmin").as("min_prefix"),
        max("vmax").as("max_prefix"))
  }

  /** Equi-width histograms per numeric column — the binned
    * distribution view tableProfile's min/max/distinct summary and
    * the quantile sketches don't give: skew bumps, empty ranges and
    * outlier mass are visible per bin. Two passes over the stacked
    * (col_name, v) frame — a bounds aggregate, then binned counts —
    * deliberately NOT materialized between them: the stack is
    * corpus-sized, so re-scanning the (column-pruned) source is
    * cheaper than truncating it (the PMI lesson applies to BOUNDED
    * aggregates; this intermediate isn't one). The bounds table is
    * |cols| rows, broadcast. Bin arithmetic is one deterministic
    * double expression evaluated identically cross-engine; max lands
    * in the last bin by the least() clamp, degenerate min==max
    * columns take bin 0.
    */
  def histogram(df: DataFrame, cols: Seq[String], nBins: Int): DataFrame = {
    require(cols.nonEmpty, "histogram needs at least one column")
    require(nBins >= 1, s"nBins must be >= 1, got $nBins")
    val stackArgs = cols
      .map(c => s"'$c', cast(`$c` as double)").mkString(", ")
    val stacked = df
      .selectExpr(s"stack(${cols.size}, $stackArgs) as (col_name, v)")
      .filter(col("v").isNotNull)
    val bounds = stacked.groupBy("col_name")
      .agg(min("v").as("mn"), max("v").as("mx"))
    stacked.join(broadcast(bounds), Seq("col_name"))
      .select(col("col_name"),
        when(col("mx") > col("mn"),
          least(lit(nBins - 1L),
            floor((col("v") - col("mn")) * nBins / (col("mx") - col("mn")))))
          .otherwise(lit(0L)).as("bin"))
      .groupBy("col_name", "bin")
      .agg(count(lit(1)).as("n_rows"))
  }

  /** Pearson correlation matrix over numeric columns — the
    * relationship member of the profiling family (histogram: shape;
    * quantiles: spread; this: which columns move together — the
    * pre-flight check before treating features as independent, and the
    * leakage probe before training a quality classifier on them).
    *
    * Exactness: values quantize once to cents (round(v·100), the
    * q_anomaly convention), every moment — n, Σx, Σx², Σxy — is an
    * exact integer (pair products fit a long at cents scale; sums
    * accumulate as decimal(38,0), DuckDB HUGEINT), and
    * corr = (n·Σxy − Σx·Σy) / √(n·Σx²−(Σx)²) / √(n·Σy²−(Σy)²) is
    * evaluated as ONE deterministic double expression over those exact
    * integers, rounded to 6 — engine- and order-independent.
    * Zero-variance columns yield NULL corr (no 0/0). Rows with a null
    * in ANY profiled column are dropped once (listwise deletion), so
    * every pair shares the same n — the matrix stays positive
    * semidefinite, which pairwise deletion silently breaks.
    *
    * Scale shape: ONE map-side-combined aggregate producing a single
    * row of |cols|·2 + |pairs| + 1 exact sums; the pair frame then
    * derives from that row by a literal-struct explode — the corpus is
    * scanned exactly once, nothing corpus-sized shuffles, and the
    * output is |cols|²/2 rows regardless of data size.
    */
  def corrMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "corrMatrix needs at least two columns")
    val pairs = for {
      i <- cols.indices; j <- cols.indices if i < j
    } yield (cols(i), cols(j))
    val q = df.na.drop(cols)
      .select(cols.map(c => round(col(c) * 100).cast("long").as(c)): _*)
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val aggs = Seq(count(lit(1)).as("n")) ++
      cols.flatMap(c => Seq(
        sum(dec(col(c))).as(s"s_$c"),
        sum(dec(col(c) * col(c))).as(s"ss_$c"))) ++
      pairs.map { case (a, b) =>
        sum(dec(col(a) * col(b))).as(s"sp_${a}__$b") }
    val m = q.agg(aggs.head, aggs.tail: _*)
    val pairStructs = pairs.map { case (a, b) =>
      struct(lit(a).as("col_x"), lit(b).as("col_y"),
        (dec(col(s"sp_${a}__$b")) * dec(col("n")) -
          dec(col(s"s_$a")) * dec(col(s"s_$b"))).as("num"),
        (dec(col(s"ss_$a")) * dec(col("n")) -
          dec(col(s"s_$a")) * dec(col(s"s_$a"))).as("d1"),
        (dec(col(s"ss_$b")) * dec(col("n")) -
          dec(col(s"s_$b")) * dec(col(s"s_$b"))).as("d2"))
    }
    m.select(col("n"), explode(array(pairStructs: _*)).as("p"))
      .select(col("p.col_x").as("col_x"), col("p.col_y").as("col_y"),
        col("n"),
        when(col("p.d1") > 0 && col("p.d2") > 0,
          round(col("p.num").cast("double") /
            (sqrt(col("p.d1").cast("double")) *
             sqrt(col("p.d2").cast("double"))), 6)).as("corr"))
  }

  /** Per-stratum token-distribution drift: KL(stratum ‖ corpus) over
    * unigram frequencies — the monitoring signal that tells a corpus
    * pipeline one source/crawl-dump/date-bucket has shifted away from
    * the mixture (new boilerplate, language drift, spam injection)
    * BEFORE it trains into a model.
    *
    * Exact arithmetic (same DSIR trick as Sampling.importance): each
    * token's log-ratio ln((c_st·N)/(c_t·N_s)) is quantized to an
    * integer round(·1e6), so the per-stratum score
    * kl_micro = Σ_t c_st·q_t is an EXACT long — summation order,
    * engine and partitioning independent; real KL nats ≈
    * kl_micro / (n_tokens·1e6), left to the consumer so the gated
    * output stays integer-exact. No smoothing is needed: c_st > 0
    * implies c_t > 0.
    *
    * Scale shape: ONE explode + one partial-aggregatable
    * (stratum, token) count; corpus-wide token counts and stratum
    * totals DERIVE from that same aggregate (never a second corpus
    * pass). The token-level join keys are Zipf-skewed but
    * pre-aggregated — each token carries at most |strata| rows, so
    * there is no hot-key blowup. Stratum totals broadcast.
    */
  def tokenDrift(df: DataFrame, textCol: String, stratumCol: String): DataFrame = {
    val cst = df
      .select(col(stratumCol).as("stratum"),
        explode(split(TextAnalysis.normalize(col(textCol)), " ")).as("tok"))
      .groupBy("stratum", "tok").agg(count(lit(1)).as("cst"))
    val ct = cst.groupBy("tok").agg(sum("cst").as("ct"))
    val ns = cst.groupBy("stratum").agg(sum("cst").as("ns"))
    val n = ns.agg(sum("ns").as("n"))
    cst.join(ct, Seq("tok"))
      .join(broadcast(ns), Seq("stratum"))
      .crossJoin(broadcast(n))
      .select(col("stratum"), col("cst"),
        round(log(col("cst").cast("double") * col("n").cast("double")
          / (col("ct").cast("double") * col("ns").cast("double"))) * 1e6)
          .cast("long").as("q"))
      .groupBy("stratum")
      .agg(sum(col("cst")).as("n_tokens"),
        sum(col("cst") * col("q")).as("kl_micro"))
  }

  /** Sampled-quantile column profile — the quantile member of the
    * sketched-profiling family (distinct → `Sketch.distinctCount`,
    * overlap → `Sketch.overlap`): per numeric column, interpolated
    * p50/p90/p99 over a DETERMINISTIC hash row-sample instead of the
    * full-column percentile pass, whose per-group sort over every
    * value IS the job at corpus scale. The keep rule is the
    * stratified-sampling predicate (portable hash threshold on a row
    * key), so it fuses into the scan, reproduces across
    * runs/engines/partitionings — the quantile estimates themselves
    * cross-engine gate — and the quantile pass runs on ~rate·|rows|
    * values. Quantile error is distributional
    * (O(1/sqrt(rate·n)) in rank), the classic sampled-quantile trade.
    *
    * Output contract (round 9): p50/p90/p99 are the LOWER exact
    * quantiles of the sample — the value at 0-based rank
    * floor(p·(m−1)), an ACTUAL sampled double carried through
    * untouched, bit-exact on both engines. (The round-8 form —
    * interpolated `percentile` under round(·, 6) — is the cross-build
    * ulp-drift class that hash-FAILED profile_embeddings.) Rank
    * thresholds are pure integer division. The quantile pass is a
    * per-(col, value) count aggregate + one per-col ordered cumulative
    * pass over distinct values — no full-group sort buffer.
    */
  def quantileSketch(df: DataFrame, keyCol: Column, cols: Seq[String],
                     ratePpm: Long): DataFrame = {
    require(cols.nonEmpty, "quantileSketch needs at least one column")
    require(ratePpm > 0 && ratePpm <= 1000000L,
      s"ratePpm must be in (0, 1000000], got $ratePpm")
    val keep = pmod(graft.util.Hashing.portableHash64(
      concat(lit("qsk:"), keyCol.cast("string"))), lit(1000000L)) < ratePpm
    val stackArgs = cols.map(c => s"'$c', cast(`$c` as double)").mkString(", ")
    val sample = df.filter(keep)
      .selectExpr(s"stack(${cols.size}, $stackArgs) as (col_name, val)")
      .filter(col("val").isNotNull)
    val counts = sample.groupBy("col_name", "val").agg(count(lit(1)).as("cnt"))
    val totals = sample.groupBy("col_name").agg(count(lit(1)).as("n_sample"))
    val wCum = Window.partitionBy("col_name").orderBy(col("val"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    counts.join(broadcast(totals), Seq("col_name"))
      .withColumn("cum", sum(col("cnt")).over(wCum))
      .groupBy("col_name")
      .agg(max(col("n_sample")).as("n_sample"),
        min(when(col("cum") >= expr("(n_sample - 1) div 2 + 1"), col("val")))
          .as("p50"),
        min(when(col("cum") >= expr("((n_sample - 1) * 9) div 10 + 1"), col("val")))
          .as("p90"),
        min(when(col("cum") >= expr("((n_sample - 1) * 99) div 100 + 1"), col("val")))
          .as("p99"))
  }

  /** Equi-DEPTH histogram — [[histogram]]'s skew-proof sibling: equal-
    * WIDTH bins put 99% of a zipfian column in one bar and the whole
    * story in the tail; equal-depth bins (each holding ~n/k rows)
    * show where the mass actually sits, and their edges are what a
    * range-partitioner or a bucketed layout wants as split points.
    * Values enter integer space as floor(v·100) cents (the benford
    * convention — one IEEE op, engine-exact); a distinct value's bin
    * is the bin of its FIRST global rank, bin(r) = (r·k) div n in
    * pure integer arithmetic, so heavy ties land wholly in one bin
    * (reported honestly by the bin's min/max edges) rather than being
    * split by an arbitrary tiebreak.
    *
    * Scale shape — the round-10 bucketed rank walk, per column: one
    * (col, cents) partial-agg count, cents range-bucketed into ≤4097
    * buckets by construction, per-(col, bucket) offsets from a
    * broadcast triangular self-join, and the cumulative window
    * PARTITIONED by (col, bucket) — no partition-less window over
    * unbounded distinct values (the embProfile discipline,
    * generalized per group). Output ≤ k·|cols| rows.
    */
  /** Top-k frequent values per column — the classic profiler output
    * [[profileTable]]'s min/max/null counts don't carry: WHICH values
    * dominate (the categorical-skew view that decides salting keys,
    * dictionary candidates and suspicious constants). Values render
    * as strings (one profiler schema for any column type); ties break
    * on the string ascending, so the result is deterministic on both
    * engines.
    *
    * Scale shape, per column: one (col, value) partial-agg count,
    * then `orderBy(...).limit(k)` — Spark plans that as
    * TakeOrderedAndProject (per-partition top-k heaps, NO global
    * sort: a high-cardinality column never funnels its distinct
    * values through one task — the zipfSlope lesson as a planner
    * guarantee, plan-audited). The final rank window runs over the
    * ≤ k·|cols| surviving rows, partitioned by column.
    */
  def frequentValues(df: DataFrame, cols: Seq[String], k: Int): DataFrame = {
    require(cols.nonEmpty && k >= 1, "need cols and k >= 1")
    val perCol = cols.map { c =>
      df.select(lit(c).as("col_name"), col(c).cast("string").as("value"))
        .filter(col("value").isNotNull)
        .groupBy("col_name", "value").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("value").asc)
        .limit(k)
    }.reduce(_ unionByName _)
    val w = Window.partitionBy(col("col_name"))
      .orderBy(col("n").desc, col("value").asc)
    perCol.withColumn("rank", row_number().over(w).cast("long"))
  }

  def equiDepthHistogram(df: DataFrame, cols: Seq[String],
                         bins: Int): DataFrame = {
    require(cols.nonEmpty && bins >= 1, s"need cols and bins >= 1")
    val stackArgs = cols.map(c => s"'$c', cast(`$c` as double)").mkString(", ")
    val counts = df
      .selectExpr(s"stack(${cols.size}, $stackArgs) as (col_name, val)")
      .filter(col("val").isNotNull)
      .select(col("col_name"),
        expr("cast(floor(val * 100) as bigint)").as("cents"))
      .groupBy("col_name", "cents").agg(count(lit(1)).as("cnt"))
    val range = counts.groupBy("col_name")
      .agg(min(col("cents")).as("lo"), max(col("cents")).as("hi"),
        sum(col("cnt")).as("n"))
    val bucketed = counts.join(broadcast(range), Seq("col_name"))
      .withColumn("w", expr("(hi - lo) div 4096 + 1"))
      .withColumn("bkt", expr("(cents - lo) div w"))
    val bcnt = bucketed.groupBy("col_name", "bkt").agg(sum(col("cnt")).as("bc"))
    val boff = bcnt.as("a")
      .join(broadcast(bcnt.as("b")),
        col("a.col_name") === col("b.col_name") && col("b.bkt") < col("a.bkt"),
        "left")
      .groupBy(col("a.col_name").as("col_name"), col("a.bkt").as("bkt"))
      .agg(coalesce(sum(col("b.bc")), lit(0L)).as("off"))
    val wCum = Window.partitionBy(col("col_name"), col("bkt"))
      .orderBy(col("cents"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bucketed.join(broadcast(boff), Seq("col_name", "bkt"))
      .withColumn("cum", col("off") + sum(col("cnt")).over(wCum))
      .withColumn("bin", expr(s"((cum - cnt) * ${bins}L) div n"))
      .groupBy("col_name", "bin")
      .agg(sum(col("cnt")).as("n_rows"),
        min(col("cents")).as("lo_cents"), max(col("cents")).as("hi_cents"))
  }

  /** Snapshot-to-snapshot column-profile regression — the statistical
    * complement of `cdc_snapshot_diff` (which says WHICH rows changed;
    * this says whether the DATA still looks the same) and the batch
    * twin of `ProfileStream`'s null-share axis: per numeric column,
    * exact row/null counts and cents-quantized mean between a current
    * and a reference snapshot, with integer drift flags — the check a
    * corpus release runs against the previous release before shipping
    * (a re-extraction that nulled a field or rescaled a unit shifts
    * these numbers even when row counts match).
    *
    * Integer contract: null shares in ppm (cnt·10⁶ div n), means in
    * milli (sum_cents·10 div non-null count, matched truncation),
    * mean drift flagged when |Δmean_milli| exceeds
    * `meanTolMilli` and null drift when |Δnull_ppm| exceeds
    * `nullTolPpm` — no float anywhere. Moment sums accumulate as
    * decimal(38,0) (the corrMatrix convention) so 100 TB row counts
    * cannot overflow.
    *
    * Scale shape: ONE wide partial-aggregated pass over each
    * snapshot (2·|cols|+1 sums), the per-column legs exploded from
    * the two one-row aggregates and equi-joined on column name —
    * |cols| rows out, the snapshots are never joined row-wise.
    */
  def profileDiff(cur: DataFrame, ref: DataFrame, cols: Seq[String],
                  meanTolMilli: Long = 1000L,
                  nullTolPpm: Long = 10000L): DataFrame = {
    require(cols.nonEmpty, "profileDiff needs at least one column")
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val side = (df: DataFrame) => {
      val aggs = Seq(count(lit(1)).as("n")) ++ cols.flatMap { c =>
        Seq(sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nn_$c"),
          sum(dec(round(col(c) * 100).cast("long"))).as(s"s_$c"))
      }
      val legs = cols.map { c =>
        struct(lit(c).as("col_name"), col("n").as("n"),
          col(s"nn_$c").as("nulls"),
          expr(s"CASE WHEN n - nn_$c > 0 THEN CAST(s_$c * 10 AS BIGINT)" +
            s" div (n - nn_$c) ELSE 0 END").as("mean_milli"))
      }
      df.agg(aggs.head, aggs.tail: _*)
        .select(explode(array(legs: _*)).as("l"))
        .select(col("l.col_name").as("col_name"), col("l.n").as("n"),
          expr("(l.nulls * 1000000L) div l.n").as("null_ppm"),
          col("l.mean_milli").as("mean_milli"))
    }
    side(cur).select(col("col_name"), col("n").as("n_cur"),
        col("null_ppm").as("null_ppm_cur"), col("mean_milli").as("mean_milli_cur"))
      .join(side(ref).select(col("col_name"), col("n").as("n_ref"),
        col("null_ppm").as("null_ppm_ref"), col("mean_milli").as("mean_milli_ref")),
        Seq("col_name"))
      .select(col("col_name"), col("n_ref"), col("n_cur"),
        col("null_ppm_ref"), col("null_ppm_cur"),
        col("mean_milli_ref"), col("mean_milli_cur"),
        (abs(col("mean_milli_cur") - col("mean_milli_ref")) > meanTolMilli)
          .cast("int").as("mean_drift"),
        (abs(col("null_ppm_cur") - col("null_ppm_ref")) > nullTolPpm)
          .cast("int").as("null_drift"))
  }

  /** Functional-dependency audit: does determinant → dependent hold,
    * and where does it break? The key/constraint-discovery question a
    * schema review asks of data that arrived WITHOUT constraints (is
    * `url` → `domain` clean? does `order_id` really determine
    * `customer_id`?) — [[tableProfile]] says what's IN each column,
    * this says how columns bind to each other.
    *
    * Per determinant value: the number of distinct dependent values
    * (1 = the FD holds there), row count, and for violating
    * determinants the min/max dependent (two concrete witnesses — the
    * repair side wants examples, not just counts). NULL dependents
    * count as a distinct value via a leading-space " NULL" sentinel
    * (a determinant mapping to both NULL and a value IS a violation —
    * the SnapshotDiff NULL lesson). The space prefix keeps it
    * first-sorting before any digit/letter-leading real value while
    * staying greppable (a NUL-byte sentinel makes the whole file read
    * as binary to diff tooling) and matches the oracle byte-for-byte;
    * NULL determinants are grouped like any other value.
    * Emits only violations (`n_dependents > 1`): the clean majority
    * would swamp the report at corpus scale.
    *
    * Scale shape: one distinct on (det, dep) (partial-agg), one
    * groupBy(det) — both shuffles on the determinant; witnesses ride
    * the same aggregate as min/max, no window, no join. |violating
    * determinants| rows out.
    */
  def fdViolations(df: DataFrame, detCol: String, depCol: String): DataFrame = {
    val pairs = df.select(col(detCol).as("det"),
        coalesce(col(depCol).cast("string"), lit(" NULL")).as("dep"))
      .distinct()
    val counts = pairs.groupBy("det").agg(
      count(lit(1)).as("n_dependents"),
      min("dep").as("dep_lo"), max("dep").as("dep_hi"))
    val rows = df.groupBy(col(detCol).as("det"))
      .agg(count(lit(1)).as("n_rows"))
    counts.filter(col("n_dependents") > 1)
      .join(rows, Seq("det"))
      .select(col("det").as(detCol), col("n_rows"), col("n_dependents"),
        col("dep_lo"), col("dep_hi"))
  }

  /** Per-column VALUE-DISTRIBUTION entropy — the concentration axis
    * [[tableProfile]]'s distinct count can't see: a `source` column
    * with 100 distinct values of which one covers 99.9% of rows and a
    * uniform 100-value column profile identically by n_distinct, but
    * the first is a skew/quality risk (one crawler drowning the feed)
    * the entropy exposes in one number. Shannon entropy over the
    * column's value frequencies, in micro-nats per row: Σ cnt·
    * round(ln(n/cnt)·1e6) div n — the text_entropy micro-nat rounding
    * convention (driver-gate-proven: both engines' libm ln agree
    * within the rounding grain), zero for a constant column, ln(k)·1e6
    * for a uniform k-value one. NULLs are excluded from the
    * distribution and reported on their own axis.
    *
    * Scale shape: one stacked scan with values collapsed to md5
    * digests in-scan (32 hex chars cross the wire, never document
    * text — the tableProfile discipline), one (col, digest) partial-
    * agg count, per-column totals re-aggregated from the count table
    * and broadcast back; |cols| rows out.
    */
  def columnEntropy(df: DataFrame, cols: Seq[String]): DataFrame = {
    val stackArgs = cols.map(c => s"'$c', cast($c as string)").mkString(", ")
    val counts = df
      .selectExpr(s"stack(${cols.size}, $stackArgs) as (col_name, val)")
      .select(col("col_name"), md5(col("val")).as("digest"))
      .groupBy("col_name", "digest").agg(count(lit(1)).as("cnt"))
    val totals = counts.filter(col("digest").isNotNull)
      .groupBy("col_name").agg(sum(col("cnt")).as("n"))
    counts.filter(col("digest").isNotNull)
      .join(broadcast(totals), Seq("col_name"))
      .groupBy("col_name")
      .agg(first(col("n")).as("n"),
        count(lit(1)).as("n_distinct"),
        sum(expr("cnt * cast(round(ln(n / cast(cnt as double)) * 1000000)" +
          " as bigint)")).as("tot_micro"))
      .join(
        counts.filter(col("digest").isNull)
          .groupBy("col_name").agg(sum(col("cnt")).as("nn")),
        Seq("col_name"), "left")
      .select(col("col_name"), col("n"), col("n_distinct"),
        coalesce(col("nn"), lit(0L)).as("n_null"),
        expr("tot_micro div n").as("ent_micro"))
  }

  /** HyperLogLog distinct-count estimate per column (Flajolet, Fusy,
    * Gandouet & Meunier, AofA'07) — the CONSTANT-MEMORY cardinality
    * path the profiling family was missing: exact countDistinct
    * shuffles every distinct value, the KMV sketch (profile_sketch)
    * keeps k hashes, HLL keeps 2^p six-bit registers (p=12 → 4 KB,
    * ~1.6% standard error) no matter whether the column holds five
    * languages or a trillion URLs — the estimator every warehouse's
    * APPROX_COUNT_DISTINCT runs.
    *
    * Spark-FIRST formulation — deliberately NOT a custom Aggregator:
    * an HLL register file is a max-fold, and max is relational.
    * idx = top p bits of the 60-bit portable hash, rank = leading-
    * zero count of the remainder + 1 (computed EXACTLY as
    * wBits − length(bin(w)) + 1 — integer string length, no
    * float log2 whose boundary rounding could misrank), registers =
    * groupBy(col, idx).max(rank) — partial-aggregatable, merge-order
    * independent, so unlike KLL the sketch IS byte-stable and the
    * gate replays the ESTIMATE itself.
    *
    * Exactness discipline: the harmonic denominator is the EXACT
    * integer Σ 2^(61−M_j) (shiftleft, DECIMAL sum — empty registers
    * contribute 2^61 via the closed form), cast to double once;
    * α_m = 0.7213/(1 + 1.079/m) written as the same arithmetic
    * expression on both engines; the small-range linear-counting
    * correction (E ≤ 2.5m with empty registers → m·ln(m/V)) is one
    * exact ratio and one ln. NULLs don't observe.
    *
    * Scale shape: one stacked scan to (column, hash) rows, ONE
    * partial-agg max to ≤ |cols|·2^p register rows, one fold to
    * |cols| rows. No window, no join, no driver data.
    */
  def hllDistinct(df: DataFrame, cols: Seq[String], p: Int = 12): DataFrame = {
    require(p >= 4 && p <= 18, s"p in [4,18], got $p")
    require(cols.nonEmpty, "need at least one column")
    val stackArgs = cols.map(c => s"'$c', cast($c as string)").mkString(", ")
    val rows = df
      .selectExpr(s"stack(${cols.size}, $stackArgs) as (col_name, val)")
      .filter(col("val").isNotNull)
      .select(col("col_name"),
        graft.util.Hashing.portableHash64(
          concat(lit("hll:"), col("val"))).as("h"))
    val regs = hllRegisters(rows, Seq("col_name"), "h", p)
    regs.groupBy("col_name").agg(
        count(lit(1)).as("n_regs"),
        sum(expr("cast(shiftleft(1L, cast(61 - mr as int)) as decimal(38,0))"))
          .as("s_present"))
      .select(col("col_name"), col("n_regs"),
        hllEstimateCol(col("n_regs"), col("s_present"), p).as("hll_est"))
  }

  /** Register derivation shared by [[hllDistinct]] and the streaming
    * HLL mode: (keyCols…, idx = top p bits, mr = max rank) from a
    * 60-bit hash column. Rank via length(bin(w)) — integer string
    * length, never a float log2. */
  private[graft] def hllRegisters(rows: DataFrame, keyCols: Seq[String],
                                  hCol: String, p: Int): DataFrame = {
    val wBits = 60 - p
    val wMod = 1L << wBits
    rows
      .select(keyCols.map(col) ++ Seq(
        expr(s"$hCol div ${wMod}L").as("idx"),
        pmod(col(hCol), lit(wMod)).as("w")): _*)
      .select(keyCols.map(col) ++ Seq(col("idx"),
        when(col("w") === 0L, lit(wBits + 1L))
          .otherwise(lit(wBits + 1L) - length(expr("bin(w)")))
          .as("rank")): _*)
      .groupBy((keyCols :+ "idx").map(col): _*).agg(max("rank").as("mr"))
  }

  /** The HLL estimate from (n_regs, exact Σ 2^(61−M) over PRESENT
    * registers) at 2^p registers — one shared expression so the batch
    * profiler and the streaming monitor can never fork arithmetic.
    * Handles the all-empty case (s_present null → estimate 0 via
    * linear counting at V = m). */
  private[graft] def hllEstimateCol(nRegs: Column, sPresent: Column,
                                    p: Int): Column = {
    val m = 1L << p
    val sTotal = coalesce(sPresent, lit(0L).cast("decimal(38,0)")) +
      (lit(m) - nRegs) * lit(2305843009213693952L).cast("decimal(38,0)")
    val v = lit(m) - nRegs
    val eRaw = lit(0.7213d) / (lit(1.0d) + lit(1.079d) / lit(m.toDouble)) *
      lit(m.toDouble) * lit(m.toDouble) * lit(2305843009213693952.0d) /
      sTotal.cast("double")
    when(eRaw <= lit(2.5d * m) && v > 0L,
      round(lit(m.toDouble) * log(lit(m.toDouble) / v.cast("double"))))
      .otherwise(round(eRaw)).cast("long")
  }

  /** Benford first-digit audit — the fabricated-data detector the
    * fraud/forensics literature standardized (Benford 1938; Nigrini's
    * audit practice): naturally occurring multi-scale numeric columns
    * (amounts, populations, file sizes) have first significant digits
    * distributed log10(1+1/d), while invented or template-generated
    * numbers cluster uniformly or on round leads. For a data-quality
    * engine this is a SYNTHETIC-SEGMENT detector: a vendor backfilling
    * a feed with generated rows shifts a column's digit histogram long
    * before any schema or null monitor notices.
    *
    * Cross-engine exactness: the value enters integer space as
    * floor(|x|·100) — ONE IEEE multiply + floor, identical bits both
    * engines (the quantize convention) — and the first digit is the
    * first character of the INTEGER's decimal string (integer-to-
    * string is exact everywhere; no log10, whose ulp behavior near
    * powers of ten is not a cross-engine contract). Expected shares
    * are hardcoded integer ppm literals of log10(1+1/d); observed
    * shares and deviations are floored integer ppm.
    *
    * Scale shape: one stacked scan, one (col, digit) partial-agg
    * count (≤ 9·|cols| groups), per-column totals re-aggregated from
    * those ≤ 9·|cols| rows and broadcast back. Output ≤ 9·|cols| rows.
    * Digits with zero observations are absent (both engines agree).
    */
  def benford(df: DataFrame, cols: Seq[String]): DataFrame = {
    val stackArgs = cols.map(c => s"'$c', cast($c as double)").mkString(", ")
    val expPpm = array(Seq(301029L, 176091L, 124938L, 96910L, 79181L,
      66946L, 57991L, 51152L, 45757L).map(lit): _*)
    val digits = df
      .selectExpr(s"stack(${cols.size}, $stackArgs) as (col_name, v)")
      .filter(col("v").isNotNull)
      .withColumn("iv", expr("cast(floor(abs(v) * 100) as bigint)"))
      .filter(col("iv") > 0L)
      .withColumn("digit",
        expr("cast(substring(cast(iv as string), 1, 1) as bigint)"))
    val counts = digits.groupBy("col_name", "digit")
      .agg(count(lit(1)).as("n"))
    val totals = counts.groupBy("col_name").agg(sum(col("n")).as("n_total"))
    counts.join(broadcast(totals), Seq("col_name"))
      .withColumn("obs_ppm", expr("(n * 1000000L) div n_total"))
      .withColumn("exp_ppm", element_at(expPpm, col("digit").cast("int")))
      .select(col("col_name"), col("digit"), col("n"), col("n_total"),
        col("obs_ppm"), col("exp_ppm"),
        abs(col("obs_ppm") - col("exp_ppm")).as("dev_ppm"))
  }

  /** Population Stability Index between a reference and a current
    * sample of one categorical column — the standard model-monitoring
    * drift statistic next to [[tokenDrift]]'s KL: per category,
    * psi-term = (p_cur − p_ref)·ln(p_cur/p_ref), accumulated in the
    * repo's integer micro-nat convention with Laplace-smoothed counts
    * (add-one on BOTH sides, so a category present in only one sample
    * contributes a finite, engine-exact term instead of ±∞).
    * Emits the per-category audit rows (cur/ref counts, smoothed ppm
    * shares, the signed micro term) — the single-row fold is the
    * caller's trivial sum, and per-category rows are what an
    * investigation actually reads. Two partial aggs + one join over
    * the category-cardinality tables; no windows.
    */
  def psi(cur: DataFrame, ref: DataFrame, catCol: String): DataFrame = {
    def counts(df: DataFrame, n: String) =
      df.groupBy(col(catCol).as("category"))
        .agg(count(lit(1)).as(n))
    val joined = counts(cur, "n_cur")
      .join(counts(ref, "n_ref"), Seq("category"), "full_outer")
      .select(col("category"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"))
    val tots = joined.agg(sum("n_cur").as("tot_cur"),
      sum("n_ref").as("tot_ref"), count(lit(1)).as("k"))
    joined.crossJoin(broadcast(tots))
      .select(col("category"), col("n_cur"), col("n_ref"),
        // add-one smoothing: (n+1)/(tot+k) — exact integers into
        // one IEEE divide each
        expr("(n_cur + 1) * 1000000 DIV (tot_cur + k)").as("cur_ppm"),
        expr("(n_ref + 1) * 1000000 DIV (tot_ref + k)").as("ref_ppm"),
        round((
          (col("n_cur") + 1L).cast("double") / (col("tot_cur") + col("k")).cast("double")
            - (col("n_ref") + 1L).cast("double") / (col("tot_ref") + col("k")).cast("double"))
          * log(((col("n_cur") + 1L).cast("double") * (col("tot_ref") + col("k")).cast("double"))
            / ((col("n_ref") + 1L).cast("double") * (col("tot_cur") + col("k")).cast("double")))
          * 1e6).cast("long").as("psi_micro"))
  }

  /** Corpus novelty curve: per stream-day, total rows, FIRST-SEEN
    * keys, and the cumulative distinct-key count — the saturation
    * diagnostic a growing training corpus watches (new-key rate
    * decaying toward zero = the source is exhausted; a spike = a new
    * population arrived). First-seen is one (key → min day) partial
    * aggregation; the cumulative fold runs over the day-cardinality
    * table (bounded by the feed horizon — whitelisted tiny relation).
    */
  def noveltyCurve(df: DataFrame, keyCol: String, dayCol: Column)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rows = df.select(col(keyCol).as("__k"), dayCol.as("day"))
    val perDay = rows.groupBy("day").agg(count(lit(1)).as("n_rows"))
    val firstSeen = rows.groupBy("__k").agg(min("day").as("day"))
      .groupBy("day").agg(count(lit(1)).as("n_new"))
    perDay.join(firstSeen, Seq("day"), "left")
      .withColumn("n_new", coalesce(col("n_new"), lit(0L)))
      .withColumn("cum_distinct", sum("n_new").over(Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("day"), col("n_rows"), col("n_new"), col("cum_distinct"))
  }

  /** Mutual information between two categorical columns, in the
    * repo's count-weighted micro-nat convention (the `tokenDrift`
    * integer doctrine): per joint cell, q = round(ln(c_ab·n /
    * (c_a·c_b))·10⁶) as BIGINT, and mi_micro = Σ c_ab·q; the two
    * marginal entropies accumulate the same way, so nmi_ppm =
    * round(mi / min(H_a, H_b) · 10⁶) is a one-op double over exact
    * longs. The leakage/relevance detector for metadata columns
    * (e.g. does `source` predict `lang`?): NMI near 10⁶ means one
    * column is a function of the other.
    *
    * Shape at scale: one (a, b) partial aggregation over the input;
    * marginals are aggs of the |A|·|B| cell table; both joins back
    * onto cells are broadcasts of marginal tables. No windows.
    */
  def mutualInfo(df: DataFrame, colA: String, colB: String): DataFrame = {
    val cells = df.groupBy(col(colA).as("a"), col(colB).as("b"))
      .agg(count(lit(1)).as("c_ab"))
    val ca = cells.groupBy("a").agg(sum("c_ab").as("c_a"))
    val cb = cells.groupBy("b").agg(sum("c_ab").as("c_b"))
    val n = cells.agg(sum("c_ab").as("n"))
    val mi = cells
      .join(broadcast(ca), Seq("a")).join(broadcast(cb), Seq("b"))
      .crossJoin(broadcast(n))
      .select(col("c_ab"),
        round(log(col("c_ab").cast("double") * col("n").cast("double")
          / (col("c_a").cast("double") * col("c_b").cast("double"))) * 1e6)
          .cast("long").as("q"))
      .agg(sum(col("c_ab") * col("q")).as("mi_micro"))
    def entropy(marg: DataFrame, c: String) = marg.crossJoin(broadcast(n))
      .select(col(c),
        round(log(col("n").cast("double") / col(c).cast("double")) * 1e6)
          .cast("long").as("q"))
      .agg(sum(col(c) * col("q")))
    val ha = entropy(ca, "c_a").toDF("h_a_micro")
    val hb = entropy(cb, "c_b").toDF("h_b_micro")
    n.crossJoin(broadcast(mi)).crossJoin(broadcast(ha))
      .crossJoin(broadcast(hb))
      .select(lit(colA).as("col_a"), lit(colB).as("col_b"), col("n"),
        col("mi_micro"), col("h_a_micro"), col("h_b_micro"),
        when(least(col("h_a_micro"), col("h_b_micro")) === 0L, lit(null))
          .otherwise(round(col("mi_micro").cast("double")
            / least(col("h_a_micro"), col("h_b_micro")).cast("double") * 1e6))
          .cast("long").as("nmi_ppm"))
  }
}
