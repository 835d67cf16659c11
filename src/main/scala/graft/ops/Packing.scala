package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.util.Hashing

/** Sequence packing for training-data prep: group whole documents into
  * fixed-token-budget packs (context windows), the step between corpus
  * cleaning and tokenized-shard writing in an LLM pipeline.
  *
  * Exact greedy bin packing is inherently sequential; the scalable
  * formulation is SHARDED FIRST-FIT-WITH-OVERFLOW: documents are
  * hash-sharded, ordered deterministically within their shard, and a
  * running token total assigns each doc to the pack its first token
  * falls in (`pack = floor(prefix_sum / budget)`). Docs never split;
  * a doc straddling a boundary overflows the pack its start falls in,
  * so packs exceed `budget` by at most one doc's tokens — the standard
  * approximation shape. Deterministic across runs, engines, and
  * partitionings (hash shard + total order), unlike greedy packers
  * with RNG or arrival-order state.
  *
  * Scale: one shuffle on the shard key, one per-shard sort (the same
  * shape as any windowed cumulative aggregate); `nShards` sizes shards
  * to executors — at 100 TB raise it so a shard's documents fit a
  * task's sort buffer. No driver state, no collect.
  */
object Packing {

  /** Assign each document a (shard, pack_id) under `budget` tokens per
    * pack. `tokensCol` is the per-doc token count; ordering within a
    * shard is by `idCol` (must be unique — it makes the prefix sum,
    * and so the whole layout, total-order deterministic).
    */
  def packSequences(df: DataFrame, idCol: String, tokensCol: String,
                    budget: Long, nShards: Int,
                    carry: Seq[String] = Nil): DataFrame = {
    require(budget > 0 && nShards > 0, s"budget=$budget nShards=$nShards")
    val shard = pmod(Hashing.portableHash64(col(idCol).cast("string")),
      lit(nShards.toLong)).cast("int")
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol).asc)
    // `carry` rides through the one shard exchange (full-row pipelines
    // keep text + metadata without a corpus-sized assignment rejoin)
    df.select(col(idCol) +: col(tokensCol).cast("long").as("n_tokens")
        +: shard.as("shard") +: carry.map(col): _*)
      .withColumn("__start",
        coalesce(sum(col("n_tokens")).over(
          w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("pack_id",
        // integer div, not a Double quotient: prefix sums of a large
        // shard can pass 2^53, where Double rounding would misplace
        // boundary docs (__start is non-negative, so div == floor)
        expr(s"__start div ${budget}L"))
      .drop("__start")
  }
}
