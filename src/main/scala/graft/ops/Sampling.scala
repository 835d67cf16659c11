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
}
