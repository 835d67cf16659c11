package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode

/** Automated plan-shape guards: the scale properties PERF.md documents
  * (pushdown, pruning, broadcast, partial aggregation, native
  * expressions) asserted on the real driver-contract queries so a
  * refactor can't silently regress them.
  */
class PlanAuditSpec extends SparkSpec {

  private def formatted(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  private def q(name: String): DataFrame = {
    // other suites may have cached the shared tables; a cached input
    // plans as InMemoryRelation and hides the parquet scan under audit
    spark.catalog.clearCache()
    SparkEntry.queries(name)(spark, sfDir)
  }

  test("q3_join_agg: filters reach parquet, dims broadcast, aggregation is partial") {
    val plan = formatted(q("q3_join_agg"))
    assert(plan.contains("PushedFilters") && plan.contains("l_shipdate"),
      "lineitem date filter must push into the scan")
    assert(plan.contains("BroadcastHashJoin"), "dimension joins must broadcast")
    assert(plan.contains("partial_sum"), "aggregation must combine map-side")
  }

  test("cdc_incremental_pull: single pushed-down scan, no shuffle") {
    val plan = formatted(q("cdc_incremental_pull"))
    assert(plan.contains("GreaterThan(event_id"),
      "watermark predicate must push into the scan")
    assert(!plan.contains("Exchange"), "incremental pull must not shuffle")
  }

  test("cdc_range_hash_fast: key-only scan with partial aggregation") {
    val plan = formatted(q("cdc_range_hash_fast"))
    assert(plan.contains("ReadSchema: struct<o_orderkey:bigint>"),
      "range hash must read ONLY the key column")
    assert(plan.contains("partial_sum"), "bucket hashes must combine map-side")
  }

  test("dedup_embedding and ann_topk: native graft_dot in the plan") {
    assert(formatted(q("dedup_embedding")).contains("graft_dot"),
      "pair scan must use the codegen'd dot product")
    assert(formatted(q("ann_topk")).contains("graft_dot"))
  }

  test("q5_multijoin: no sort-merge join at dimension scale") {
    val plan = formatted(q("q5_multijoin"))
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"),
      "all q5 joins are dim joins and must broadcast")
  }
}
