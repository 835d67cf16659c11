package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.util.Hashing

/** Deterministic sampling for training-data curation — the data-mixing
  * step that weights strata (languages, sources, quality bands)
  * differently.
  *
  * Hash-threshold Bernoulli instead of `df.sample`: the keep decision
  * is a pure function of (salt, id), so it is reproducible across
  * runs, engines (DuckDB oracle replays it bit-for-bit), partitionings
  * and cluster sizes — none of which hold for RNG-based sampling. One
  * narrow filter, no shuffle; at 100 TB it fuses into the scan.
  */
object Sampling {

  private val BUCKETS = 10000L

  /** keep ⇔ hash(salt:id) mod 10000 < rate·10000 */
  def keepExpr(idCol: Column, rate: Double, salt: String): Column =
    pmod(Hashing.portableHash64(concat(lit(salt + ":"), idCol.cast("string"))),
      lit(BUCKETS)) < lit((rate * BUCKETS).toLong)

  /** Uniform deterministic sample. */
  def uniform(df: DataFrame, idCol: String, rate: Double,
              salt: String = "graft"): DataFrame =
    df.filter(keepExpr(col(idCol), rate, salt))

  /** Per-stratum rates (data mixing). Strata absent from `rates` use
    * `defaultRate`.
    */
  def stratified(df: DataFrame, stratumCol: String, idCol: String,
                 rates: Map[String, Double], defaultRate: Double,
                 salt: String = "graft"): DataFrame = {
    val rateCol = rates.foldLeft(lit(defaultRate)) { case (acc, (stratum, r)) =>
      when(col(stratumCol) === stratum, lit(r)).otherwise(acc)
    }
    df.filter(
      pmod(Hashing.portableHash64(concat(lit(salt + ":"), col(idCol).cast("string"))),
        lit(BUCKETS)) < (rateCol * BUCKETS).cast("long"))
  }

  /** Mixture sampling to a per-stratum TOKEN budget — the actual
    * data-mixing primitive: "at most B_s tokens of stratum s", with
    * the sampling rate derived from the corpus itself
    * (rate_s = min(1, B_s / total_tokens_s)) rather than hand-tuned.
    *
    * Two phases, both scale-flat: ONE partial-aggregatable groupBy
    * computes per-stratum token totals (|strata| rows), which broadcast
    * back onto the scan; the keep decision is then the same
    * deterministic hash threshold as [[stratified]] — reproducible
    * across runs/engines/partitionings, and the big side never
    * shuffles. The realized token count concentrates tightly around
    * the budget (Bernoulli over docs); pipelines wanting an exact cut
    * sort-and-prefix within the ~B_s-token sample, which is then tiny.
    *
    * `tokensCol` is any per-row weight expression (whitespace tokens,
    * BPE counts, chars).
    */
  def tokenBudget(df: DataFrame, stratumCol: String, idCol: String,
                  tokensCol: Column, budgets: Map[String, Long],
                  defaultBudget: Long, salt: String = "graft"): DataFrame = {
    val weighted = df.withColumn("__nt", tokensCol.cast("long"))
    val budgetCol = budgets.foldLeft(lit(defaultBudget)) { case (acc, (s, b)) =>
      when(col(stratumCol) === s, lit(b)).otherwise(acc)
    }
    val rates = weighted.groupBy(col(stratumCol))
      .agg(sum(col("__nt")).as("__tot"))
      .select(col(stratumCol),
        least(lit(1.0), budgetCol.cast("double") / col("__tot").cast("double"))
          .as("__rate"))
    weighted.join(broadcast(rates), Seq(stratumCol))
      .filter(
        pmod(Hashing.portableHash64(concat(lit(salt + ":"), col(idCol).cast("string"))),
          lit(BUCKETS)) < (col("__rate") * BUCKETS).cast("long"))
      .drop("__rate", "__tot")
      .withColumnRenamed("__nt", "n_tokens")
  }
}
