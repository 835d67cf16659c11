package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  *
  * `queries` maps operator name → (session, sfDir) → result DataFrame;
  * `oracleSql` maps the same names to DuckDB-equivalent SQL over the
  * same parquet tables. Names absent from `oracleSql` get a rows-only
  * check (nondeterministic-across-engines or non-SQL-expressible ops).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.Analytics.q1Agg(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Analytics.queries ++ graft.queries.CdcQueries.queries ++
      graft.queries.PipelineQueries.queries

  def oracleSql: Map[String, String] =
    graft.queries.Analytics.oracles ++ graft.queries.CdcQueries.oracles ++
      graft.queries.PipelineQueries.oracles
}
