package graft

import graft.queries.Analytics

class AnalyticsSpec extends SparkSpec {

  test("every analytics query runs and returns rows on sf0.001") {
    Analytics.queries.foreach { case (name, fn) =>
      val df = fn(spark, sfDir)
      assert(df.count() > 0, s"$name returned no rows")
    }
  }

  test("every analytics query has an oracle with matching column names") {
    assert(Analytics.oracles.keySet == Analytics.queries.keySet)
  }

  test("q1_agg aggregates are grouped uniquely by (returnflag, linestatus)") {
    val df = Analytics.q1Agg(spark, sfDir)
    assert(df.count() == df.select("l_returnflag", "l_linestatus").distinct().count())
  }

  test("q_topk_window keeps at most 3 rows per priority") {
    val df = Analytics.qTopkWindow(spark, sfDir)
    val max = df.groupBy("o_orderpriority").count()
      .agg(org.apache.spark.sql.functions.max("count")).head().getLong(0)
    assert(max <= 3)
  }

  test("sessionize assigns monotone session ids starting at 1 per user") {
    import org.apache.spark.sql.functions._
    val df = Analytics.qEventsSessionize(spark, sfDir)
    val firsts = df.groupBy("user_id").agg(min("session_seq").as("m"))
    assert(firsts.filter(col("m") =!= 1).count() == 0)
  }

  test("entry flagship query returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
