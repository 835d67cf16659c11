package graft

/** Build-time enforcement of [[OutputContract]]: every gated query's
  * output schema must be hash-stable across Spark and DuckDB (BIGINT /
  * STRING / whitelisted-double only; no wide decimals). Catches the
  * r8 interpolated-double and r9 decimal(38,0) failure family before a
  * driver round burns on it. Schema resolution is plan-only, so this
  * sweeps all queries without executing any.
  */
class OutputContractSpec extends SparkSpec {

  test("every gated query satisfies the output-type contract") {
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        OutputContract.violations(name, fn(spark, sfDir).schema)
    }
    assert(bad.isEmpty, "\n" + bad.mkString("\n"))
  }

  test("whitelist entries stay live (no stale documented exceptions)") {
    val liveDoubles = SparkEntry.queries.toSeq.flatMap { case (name, fn) =>
      fn(spark, sfDir).schema.fields.collect {
        case f if f.dataType == org.apache.spark.sql.types.DoubleType ||
          f.dataType == org.apache.spark.sql.types.FloatType =>
          (name, f.name)
      }
    }.toSet
    val stale = OutputContract.doubleWhitelist -- liveDoubles
    assert(stale.isEmpty,
      s"whitelisted double columns no longer emitted: $stale")
  }
}
