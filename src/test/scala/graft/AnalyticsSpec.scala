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

  test("approx_count_distinct tracks the exact distinct count within 5%") {
    // q_distinct_agg is gated exact; this pins the documented
    // unbounded-cardinality swap (HLL sketch) to a usable error bound
    import org.apache.spark.sql.functions._
    val rows = graft.util.Tables.events(spark, sfDir)
      .groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("exact"),
        approx_count_distinct(col("user_id")).as("approx"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (e, a) = (r.getLong(1).toDouble, r.getLong(2).toDouble)
      assert(math.abs(a - e) / e < 0.05, s"${r.getString(0)}: exact=$e approx=$a")
    }
  }

  test("approx_percentile brackets the exact grouped median (t-digest swap)") {
    // q_percentiles is gated exact (bounded group count buffers fine);
    // this pins the mergeable-sketch swap documented for unbounded
    // cardinality to a tight bracket on real data
    import org.apache.spark.sql.functions._
    val rows = graft.util.Tables.orders(spark, sfDir)
      .groupBy("o_orderpriority")
      .agg(expr("percentile(o_totalprice, 0.5)").as("exact"),
        expr("approx_percentile(o_totalprice, 0.5, 1000)").as("approx"),
        expr("percentile(o_totalprice, 0.45)").as("lo"),
        expr("percentile(o_totalprice, 0.55)").as("hi"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, lo, hi) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(a >= lo && a <= hi,
        s"${r.getString(0)}: approx median $a outside [p45=$lo, p55=$hi]")
    }
  }

  test("q_topk_window keeps at most 3 rows per priority") {
    val df = Analytics.qTopkWindow(spark, sfDir)
    val max = df.groupBy("o_orderpriority").count()
      .agg(org.apache.spark.sql.functions.max("count")).head().getLong(0)
    assert(max <= 3)
  }

  test("as-of join picks the latest right row at-or-before each left timestamp") {
    import spark.implicits._
    val left = Seq((1L, 100L, "a"), (1L, 200L, "b"), (2L, 50L, "c"))
      .toDF("k", "ts", "tag")
    val right = Seq(
      (1L, 100L, 10L, 1.0),  // equal ts: matches left (1,100) — ≤ semantics
      (1L, 100L, 11L, 2.0),  // same ts, larger id: deterministic winner
      (1L, 150L, 12L, 3.0),  // latest before left (1,200)
      (2L, 60L, 13L, 4.0))   // AFTER left (2,50): must not match
      .toDF("k", "ts", "pid", "pval")
    val out = graft.ops.AsOfJoin
      .asOf(left, right, Seq("k"), "ts", Seq("pid", "pval"), Seq("pid"))
      .orderBy("k", "ts")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        Option(r.get(3)), Option(r.get(4))))
    assert(out.toSeq == Seq(
      (1L, 100L, "a", Some(11L), Some(2.0)),
      (1L, 200L, "b", Some(12L), Some(3.0)),
      (2L, 50L, "c", None, None)))
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

  test("nearestJoin: closer side wins, exact ties prefer backward, sentinels without rights") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val ev = Seq(
      (1L, 100L, "purchase", "2024-01-01 10:00:00"),
      (1L, 10L, "click", "2024-01-01 10:30:00"),  // back 30 m vs fwd 10 m
      (1L, 101L, "purchase", "2024-01-01 10:40:00"),
      (1L, 11L, "click", "2024-01-01 10:05:00"),  // back 5 m vs fwd 35 m
      (2L, 200L, "purchase", "2024-01-01 09:00:00"),
      (2L, 20L, "click", "2024-01-01 09:10:00"),  // exact 10 m tie both ways
      (2L, 201L, "purchase", "2024-01-01 09:20:00"),
      (3L, 250L, "purchase", "2024-01-01 08:00:00"),
      (3L, 30L, "click", "2024-01-01 08:00:00"),  // same instant
      (4L, 40L, "click", "2024-01-01 07:00:00"),  // no purchase at all
      (1L, 900L, "error", "2024-01-01 10:31:00")  // other types ignored
    ).toDF("user_id", "event_id", "event_type", "s")
      .select($"user_id", $"event_id", $"event_type",
        $"s".cast("timestamp").as("ts"))
    def run(d: org.apache.spark.sql.DataFrame) =
      graft.ops.TimeSeries.nearestJoin(d, "user_id", "ts", "event_type",
          "event_id", "click", "purchase")
        .select("left_id", "has_nearest", "nearest_id", "delta_ms")
        .as[(Long, Int, Long, Long)].collect().toSet
    val got = run(ev)
    assert(got == Set(
      (10L, 1, 101L, -600000L),  // forward is closer
      (11L, 1, 100L, 300000L),   // backward is closer
      (20L, 1, 200L, 600000L),   // exact tie -> backward (as-of convention)
      (30L, 1, 250L, 0L),        // same instant counts, delta 0
      (40L, 0, -1L, -1L)))       // no right: sentinels
    assert(run(ev.repartition(5)) == got)
  }

  test("mergeIntervals: overlaps merge, touching intervals merge, gaps split, exact coverage") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val iv = Seq(
      (1L, 0L, 10L), (1L, 5L, 20L),   // overlap -> one island [0,20)
      (1L, 20L, 30L),                 // touches at 20 -> still island 1
      (1L, 40L, 50L),                 // gap -> island 2
      (2L, 0L, 5L), (2L, 0L, 5L),    // duplicate intervals, one island
      (3L, 7L, 8L)
    ).toDF("user_id", "s", "e")
    def run(d: org.apache.spark.sql.DataFrame) =
      graft.ops.TimeSeries.mergeIntervals(d, "user_id", "s", "e")
        .select("user_id", "island_idx", "island_start", "island_end", "n_intervals")
        .as[(Long, Long, Long, Long, Long)].collect().toSet
    val got = run(iv)
    assert(got == Set(
      (1L, 1L, 0L, 30L, 3L),
      (1L, 2L, 40L, 50L, 1L),
      (2L, 1L, 0L, 5L, 2L),
      (3L, 1L, 7L, 8L, 1L)))
    assert(run(iv.repartition(5)) == got, "islands owe nothing to layout")
    // a fully-contained interval extends nothing and splits nothing
    val contained = run(Seq((9L, 0L, 100L), (9L, 10L, 20L), (9L, 150L, 160L))
      .toDF("user_id", "s", "e"))
    assert(contained == Set((9L, 1L, 0L, 100L, 2L), (9L, 2L, 150L, 160L, 1L)))
  }

  test("lastTouch: window bounds, same-instant ties, sentinel for unattributed") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val ev = Seq(
      (1L, 10L, "click", "2024-01-01 09:00:00"),
      (1L, 11L, "click", "2024-01-01 09:00:00"),  // same-ts tie -> max id
      (1L, 12L, "purchase", "2024-01-01 10:00:00"),
      (1L, 13L, "purchase", "2024-01-01 16:30:00"), // 7.5 h after: outside 6 h
      (2L, 20L, "purchase", "2024-01-01 08:00:00"), // no touch before
      (2L, 21L, "click", "2024-01-01 08:30:00"),
      (3L, 30L, "click", "2024-01-01 12:00:00"),
      (3L, 31L, "purchase", "2024-01-01 12:00:00"), // touch AT conv ts: age 0
      (1L, 14L, "error", "2024-01-01 09:30:00")     // other types ignored
    ).toDF("user_id", "event_id", "event_type", "s")
      .select($"user_id", $"event_id", $"event_type",
        $"s".cast("timestamp").as("ts"))
    def run(d: org.apache.spark.sql.DataFrame) =
      graft.ops.TimeSeries.lastTouch(d, "user_id", "ts", "event_type",
          "event_id", "click", "purchase", lookbackSeconds = 6L * 3600L)
        .select("conversion_id", "has_touch", "touch_id", "touch_age_ms")
        .as[(Long, Int, Long, Long)].collect().toSet
    val got = run(ev)
    assert(got == Set(
      (12L, 1, 11L, 3600000L),  // tie resolved to the higher click id
      (13L, 0, -1L, -1L),       // stale touch: outside the window
      (20L, 0, -1L, -1L),       // later touch can't attribute backwards
      (31L, 1, 30L, 0L)))       // same-instant touch attributes, age 0
    assert(run(ev.repartition(5)) == got, "attribution owes nothing to layout")
  }

  test("gapFill: absolute grid, LOCF across gaps, null before first value, bucket counts") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def mk(rows: Seq[(Long, String, Double)]) =
      rows.toDF("user_id", "s", "value")
        .select($"user_id", $"s".cast("timestamp").as("ts"), $"value")
    val got = graft.ops.TimeSeries.gapFill(
        mk(Seq(
          (1L, "2024-01-01 00:30:00", 10.0),
          (1L, "2024-01-01 02:15:00", 20.0),
          (2L, "2024-01-01 05:59:59", 7.0))),
        "user_id", "ts", "value", stepSeconds = 3600L)
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toInstant.toString,
        Option(r.get(2)).map(_.asInstanceOf[Double]), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    assert(got.toSeq == Seq(
      // grid instant 00:00 precedes the 00:30 event: honest NULL fill,
      // but the bucket still counts its one event
      (1L, "2024-01-01T00:00:00Z", None, 1L),
      (1L, "2024-01-01T01:00:00Z", Some(10.0), 0L),
      (1L, "2024-01-01T02:00:00Z", Some(10.0), 1L),
      (2L, "2024-01-01T05:00:00Z", None, 1L)))
    // an observation exactly AT the grid instant is visible to it
    val atBoundary = graft.ops.TimeSeries.gapFill(
        mk(Seq((3L, "2024-01-01 04:00:00", 5.0),
               (3L, "2024-01-01 05:00:00", 6.0))),
        "user_id", "ts", "value", stepSeconds = 3600L)
      .collect().map(r => (r.getTimestamp(1).toInstant.toString,
        r.get(2).asInstanceOf[Double])).sortBy(_._1)
    assert(atBoundary.toSeq == Seq(
      ("2024-01-01T04:00:00Z", 5.0), ("2024-01-01T05:00:00Z", 6.0)))
    // equal-ts duplicates resolve deterministically (max value last)
    // and the layout owes nothing to partitioning
    val dup = mk(Seq((4L, "2024-01-01 06:00:00", 1.0),
                     (4L, "2024-01-01 06:00:00", 9.0)))
    Seq(dup, dup.repartition(4)).foreach { d =>
      val r = graft.ops.TimeSeries.gapFill(d, "user_id", "ts", "value", 3600L)
        .collect().map(r => (r.get(2).asInstanceOf[Double], r.getLong(3)))
      assert(r.toSeq == Seq((9.0, 2L)))
    }
  }

  test("time-series ops drop null-timestamp rows: no LOCF seeding, no phantom matches") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // a null-ts observation sorts FIRST in Spark ascending order — if
    // admitted, its value would seed LOCF before the key's first real
    // event (and DuckDB, nulls-last, would disagree). Round-9 contract:
    // unplaceable rows are dropped everywhere on the time axis.
    val obs = Seq(
      (1L, Some("2024-01-01 01:00:00"), 5.0),
      (1L, None, 99.0),                    // must not seed LOCF
      (2L, None, 42.0)                     // a key with ONLY null ts vanishes
    ).toDF("user_id", "s", "value")
      .select($"user_id", $"s".cast("timestamp").as("ts"), $"value")
    val gf = graft.ops.TimeSeries.gapFill(obs, "user_id", "ts", "value", 3600L)
      .collect().map(r => (r.getLong(0), Option(r.get(2)), r.getLong(3)))
    assert(gf.toSeq == Seq((1L, Some(5.0), 1L)))

    val ev = Seq(
      (1L, 10L, "click", Some("2024-01-01 10:00:00")),
      (1L, 100L, "purchase", None),        // unplaceable right: never matches
      (1L, 11L, "click", None),            // unplaceable left: no output row
      (2L, 20L, "purchase", None),
      (2L, 21L, "click", Some("2024-01-01 09:00:00"))
    ).toDF("user_id", "event_id", "event_type", "s")
      .select($"user_id", $"event_id", $"event_type",
        $"s".cast("timestamp").as("ts"))
    val nj = graft.ops.TimeSeries.nearestJoin(ev, "user_id", "ts",
        "event_type", "event_id", "click", "purchase")
      .select("left_id", "has_nearest", "nearest_id", "delta_ms")
      .as[(Long, Int, Long, Long)].collect().toSet
    assert(nj == Set((10L, 0, -1L, -1L), (21L, 0, -1L, -1L)))

    val lt = graft.ops.TimeSeries.lastTouch(ev, "user_id", "ts",
        "event_type", "event_id", "click", "purchase", 6L * 3600L)
      .select("conversion_id", "has_touch", "touch_id", "touch_age_ms")
      .as[(Long, Int, Long, Long)].collect().toSet
    assert(lt.isEmpty) // the only conversions are null-ts: dropped
  }

  test("robustScale: exact quartile scaling, truncated signed division, zero-IQR exclusion") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // group a: cents 0..8 -> q1=2, med=4, q3=6, iqr=4
    // group b: constant -> iqr 0, excluded entirely
    val df = ((0 to 8).map(i => ("a", i.toLong, i / 100.0)) ++
      (20 to 24).map(i => ("b", i.toLong, 7.77)))
      .toDF("event_type", "event_id", "value")
    def run(d: org.apache.spark.sql.DataFrame) =
      graft.ops.Profile.robustScale(d, "event_type", "event_id", "value")
        .as[(Long, String, Long)].collect().toSet
    val got = run(df)
    assert(got.forall(_._2 == "a"), "zero-IQR group must be excluded")
    val byId = got.map(t => t._1 -> t._3).toMap
    assert(byId(0L) == -1000L && byId(8L) == 1000L && byId(4L) == 0L)
    // (3-4)*1000 div 4 truncates toward zero: -250 exactly; and the
    // sub-unit case (5-4)*1000 div 4 = 250
    assert(byId(3L) == -250L && byId(5L) == 250L)
    assert(run(df.repartition(5)) == got, "scaling owes nothing to layout")
  }

  test("percent rank: exact micro units, endpoints, single-row group, deterministic ties") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val q = graft.queries.Analytics.qPercentRank(spark, sfDir)
      .select("o_orderkey", "o_orderpriority", "pr_micro")
      .as[(Long, String, Long)].collect()
    assert(q.nonEmpty)
    val byG = q.groupBy(_._2)
    byG.foreach { case (g, rows) =>
      val prs = rows.map(_._3)
      assert(prs.min == 0L && prs.max == 1000000L,
        s"group $g endpoints must be exact 0 and 1e6")
      assert(prs.forall(p => p >= 0L && p <= 1000000L))
      // unique ranks: pr values within a group are distinct iff n <= 1e6+1
      assert(prs.toSet.size == prs.length, s"group $g has duplicate ranks")
    }
  }

  test("ewma: halving weights, early-row renormalization, signed truncation, layout-independent") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val ev = Seq(
      (1L, 10L, "2024-01-01 00:00:01", 1.0),
      (1L, 11L, "2024-01-01 00:00:02", 2.0),
      (1L, 12L, "2024-01-01 00:00:03", 4.0),
      (1L, 13L, "2024-01-01 00:00:04", 8.0),
      (1L, 14L, "2024-01-01 00:00:05", 8.0),
      (2L, 20L, "2024-01-01 00:00:01", -1.0),
      (2L, 21L, "2024-01-01 00:00:02", 0.0)
    ).toDF("user_id", "event_id", "s", "value")
      .select($"user_id", $"event_id", $"s".cast("timestamp").as("ts"), $"value")
    def run(d: org.apache.spark.sql.DataFrame) =
      graft.ops.TimeSeries.ewma(d, "user_id", "ts", "value", "event_id", k = 4)
        .select("event_id", "n_window", "smoothed_milli")
        .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    val got = run(ev)
    assert(got == Seq(
      // cents: 100, 200, 400, 800, 800; weights newest-first 8,4,2,1
      (10L, 1L, 100L * 10 / 1),                               // 1000
      (11L, 2L, (200L * 8 + 100 * 4) * 10 / 12),              // 1666
      (12L, 3L, (400L * 8 + 200 * 4 + 100 * 2) * 10 / 14),    // 3000
      (13L, 4L, (800L * 8 + 400 * 4 + 200 * 2 + 100) * 10 / 15),
      (14L, 4L, (800L * 8 + 800 * 4 + 400 * 2 + 200) * 10 / 15),
      // signed numerator: Spark div truncates toward zero, so
      // (-100*8 + 0*... = -800)*10 div (8+4) = -666, not -667
      (20L, 1L, -1000L),
      (21L, 2L, (0L * 8 - 100 * 4) * 10 / 12)))
    assert(-4000L * 10 / 12 == -3333L, "sanity: Scala / matches div toward zero")
    assert(run(ev.repartition(5)) == got, "ewma owes nothing to layout")
    // null ts / null value rows drop instead of poisoning the window
    val withNulls = ev.unionByName(Seq(
      (1L, 15L, null.asInstanceOf[String], java.lang.Double.valueOf(5.0)),
      (1L, 16L, "2024-01-01 00:00:06", null.asInstanceOf[java.lang.Double])
    ).toDF("user_id", "event_id", "s", "value")
      .select($"user_id", $"event_id", $"s".cast("timestamp").as("ts"),
        $"value".cast("double")))
    assert(run(withNulls) == got)
  }

  test("seasonality: periodic pulse has zero residuals, a spike surfaces only on its own day") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 4 weeks of daily events for one key: phase 0 carries 6 events,
    // all other phases 2 — a perfect weekly pulse — plus ONE spike day
    // (week 3, phase 2) with 10 extra events
    val rows = for {
      week <- 0 until 4; phase <- 0 until 7
      n = (if (phase == 0) 6 else 2) +
        (if (week == 3 && phase == 2) 10 else 0)
      i <- 0 until n
    } yield ("t", (week * 7 + phase).toLong * 86400000L + i)
    val ev = rows.toDF("event_type", "ms")
      .select($"event_type", timestamp_millis($"ms").as("ts"))
    def run(d: org.apache.spark.sql.DataFrame) =
      graft.ops.TimeSeries.seasonality(d, "event_type", "ts")
        .select("day", "phase", "n", "expected_milli", "resid_milli")
        .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    val got = run(ev)
    assert(got.size == 28)
    // the perfectly periodic phases decompose to zero residual —
    // including the 3x phase-0 pulse the raw-count monitors would flag
    got.filterNot(r => r._2 == 2L).foreach { r =>
      assert(r._5 == 0L, s"periodic day must have zero residual: $r")
    }
    // phase 2's mean absorbs the spike: (2*3 + 12)/4 = 4.5 -> 4500
    got.filter(_._2 == 2L).foreach { r =>
      assert(r._4 == 4500L)
      if (r._1 == 23L) assert(r._5 == 12L * 1000 - 4500L, s"spike day: $r")
      else assert(r._5 == 2000L - 4500L, s"spike's phase-mates: $r")
    }
    assert(run(ev.repartition(5)) == got, "layout independence")
  }

  test("autocorr: exact stats, zero-filled gaps, weekly pulse peaks at lag 7, layout-independent") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def ev(rows: Seq[(String, Long)]) = rows.toDF("event_type", "ms")
      .select($"event_type", timestamp_millis($"ms").as("ts"))
    def run(d: org.apache.spark.sql.DataFrame, maxLag: Int) =
      graft.ops.TimeSeries.autocorr(d, "event_type", "ts", maxLag)
        .select("lag", "n_pairs", "sx", "sy", "sxy", "sxx", "syy",
          "cov_num", "varx_num", "vary_num")
        .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long, Long)]
        .collect().sortBy(_._1).toSeq
    // hand-checked exact stats on x = [1, 2, 4] (days 0,1,2; day 1
    // has 2 events, day 2 has 4)
    val tiny = ev(Seq.tabulate(1)(_ => ("t", 0L)) ++
      Seq.tabulate(2)(i => ("t", 86400000L + i)) ++
      Seq.tabulate(4)(i => ("t", 2 * 86400000L + i)))
    val got = run(tiny, 2)
    assert(got === Seq(
      (1L, 2L, 3L, 6L, 10L, 5L, 20L, 2L, 1L, 4L),
      (2L, 1L, 1L, 4L, 4L, 1L, 16L, 0L, 0L, 0L)))
    // a skipped day enters as ZERO: days 0 and 2 observed, day 1 not
    val gappy = ev(Seq(("g", 0L), ("g", 2 * 86400000L)))
    val gg = run(gappy, 2)
    assert(gg === Seq(
      (1L, 2L, 1L, 1L, 0L, 1L, 1L, -1L, 1L, 1L),
      (2L, 1L, 1L, 1L, 1L, 1L, 1L, 0L, 0L, 0L)))
    // weekly pulse over 5 weeks: normalized r peaks at lag 7
    val weekly = ev(for {
      week <- 0 until 5; phase <- 0 until 7
      n = if (phase == 0) 9 else 1
      i <- 0 until n
    } yield ("w", (week * 7 + phase).toLong * 86400000L + i))
    val wk = run(weekly, 10)
    def r(t: (Long, Long, Long, Long, Long, Long, Long, Long, Long,
              Long)): Double =
      t._8.toDouble / math.sqrt(t._9.toDouble * t._10.toDouble)
    val best = wk.maxBy(r)
    assert(best._1 === 7L, s"weekly pulse must peak at lag 7: " +
      wk.map(t => t._1 -> r(t)).mkString(", "))
    assert(r(best) > 0.9)
    assert(run(weekly.repartition(5), 10) === wk, "layout independence")
  }

  test("changepoint: planted shift localized, earliest-split ties, n<2 excluded, layout-independent") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val ev = Seq(
      // key 1: clean level shift 10.0 -> 50.0 after position 3
      (1L, 10L, "2024-01-01 00:00:01", 10.0),
      (1L, 11L, "2024-01-01 00:00:02", 10.0),
      (1L, 12L, "2024-01-01 00:00:03", 10.0),
      (1L, 13L, "2024-01-01 00:00:04", 50.0),
      (1L, 14L, "2024-01-01 00:00:05", 50.0),
      // key 2: symmetric spike — D_1 = D_2 = 1000, tie goes EARLIEST
      (2L, 20L, "2024-01-01 00:00:01", 0.0),
      (2L, 21L, "2024-01-01 00:00:02", 10.0),
      (2L, 22L, "2024-01-01 00:00:03", 0.0),
      // key 3: single event — no split exists
      (3L, 30L, "2024-01-01 00:00:01", 7.0)
    ).toDF("user_id", "event_id", "s", "value")
      .select($"user_id", $"event_id", $"s".cast("timestamp").as("ts"), $"value")
    def run(d: org.apache.spark.sql.DataFrame) =
      graft.ops.TimeSeries.changepoint(d, "user_id", "ts", "value", "event_id")
        .select("user_id", "n_events", "cp_pos", "cp_event_id",
          "cusum_score", "mean_before_milli", "mean_after_milli")
        .as[(Long, Long, Long, Long, Long, Long, Long)]
        .collect().sortBy(_._1).toSeq
    val got = run(ev)
    assert(got == Seq(
      // cents 1000,1000,1000,5000,5000: T=13000, D_3=|5*3000-3*13000|=24000
      (1L, 5L, 3L, 12L, 24000L, 10000L, 50000L),
      // cents 0,1000,0: D_1=|3*0-1000|=1000 = D_2=|3*1000-2000| -> pos 1
      (2L, 3L, 1L, 20L, 1000L, 0L, 5000L)))
    assert(run(ev.repartition(7)) == got, "changepoint owes nothing to layout")
    // null ts / null value rows drop, not poison
    val withNulls = ev.unionByName(Seq(
      (1L, 15L, null.asInstanceOf[String], java.lang.Double.valueOf(99.0)),
      (2L, 23L, "2024-01-01 00:00:09", null.asInstanceOf[java.lang.Double])
    ).toDF("user_id", "event_id", "s", "value")
      .select($"user_id", $"event_id", $"s".cast("timestamp").as("ts"),
        $"value".cast("double")))
    assert(run(withNulls) == got)
  }

  test("transitionMatrix: per-key sequences, tie-break order, floor ppm, layout-independent") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // user 1: A,B,A,B (by ms, event_id breaks the ms tie at 2)
    // user 2: A,A
    val ev = Seq(
      (1L, 10L, 0L, "A"), (1L, 11L, 1L, "B"),
      (1L, 12L, 2L, "A"), (1L, 13L, 2L, "B"), // same ms: event_id orders
      (2L, 20L, 0L, "A"), (2L, 21L, 1L, "A"))
      .toDF("user_id", "event_id", "ts_ms", "event_type")
    def run(d: org.apache.spark.sql.DataFrame) =
      graft.ops.Stats.transitionMatrix(d, "user_id",
          Seq($"ts_ms".asc, $"event_id".asc), "event_type")
        .as[(String, String, Long, Long)].collect().sorted.toSeq
    val got = run(ev)
    assert(got === Seq(
      ("A", "A", 1L, 333333L), // user 2
      ("A", "B", 2L, 666666L), // floor(2e6/3)
      ("B", "A", 1L, 1000000L)))
    assert(run(ev.repartition(5)) === got, "transitions owe nothing to layout")
    // swapping the event_id tie-break flips the 12/13-ms pair: A,B,B,A
    val swapped = ev.withColumn("event_id",
      when($"event_id" === 12L, 13L).when($"event_id" === 13L, 12L)
        .otherwise($"event_id"))
    val got2 = run(swapped)
    assert(got2.exists(t => t._1 == "B" && t._2 == "B"),
      "tie-break must be part of the ordering contract")
  }

  test("weightedQuantiles: exact lower quantile, duplicate collapse, all-BIGINT thresholds") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // g: value 1.0 w=2, 2.0 w=3 (as 1+2 duplicates), 3.0 w=5 -> tot 10
    val df = Seq(("g", 1.0, 2L), ("g", 2.0, 1L), ("g", 2.0, 2L), ("g", 3.0, 5L),
      ("h", 7.5, 4L)).toDF("grp", "price", "qty")
    def run(d: org.apache.spark.sql.DataFrame, qs: Seq[Long]) =
      graft.ops.Stats.weightedQuantiles(d, "grp", "price", col("qty"), qs)
        .as[(String, Long, Double, Long)].collect().sorted.toSeq
    val got = run(df, Seq(100000L, 250000L, 500000L, 1000000L))
    assert(got === Seq(
      ("g", 100000L, 1.0, 10L),  // cum 2e6 >= 1e5*10
      ("g", 250000L, 2.0, 10L),  // cum 2e6 <  2.5e6; cum 5e6 >= 2.5e6
      ("g", 500000L, 2.0, 10L),  // cum 5e6 >= 5e6 (boundary hits exactly)
      ("g", 1000000L, 3.0, 10L),
      ("h", 100000L, 7.5, 4L), ("h", 250000L, 7.5, 4L),
      ("h", 500000L, 7.5, 4L), ("h", 1000000L, 7.5, 4L)))
    assert(run(df.repartition(4), Seq(100000L, 250000L, 500000L, 1000000L)) === got)
  }

  test("theilSen: outlier day cannot drag the median slope, lower-median rank exact") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // y = 2x on days 0..2, then an outlier spike at day 3.
    // slopes: [2e6, 2e6, 2e6, 33333333, 49500000, 96000000]
    // lower median (rank (6+1) DIV 2 = 3) = 2e6 — OLS would be ~24e6.
    val pts = Seq(("g", 0L, 0L), ("g", 1L, 2L), ("g", 2L, 4L),
      ("g", 3L, 100L)).toDF("k", "x", "y")
    val got = graft.ops.Stats.theilSen(pts, "k", col("x"), col("y"))
      .as[(String, Long, Long)].collect().toSeq
    assert(got === Seq(("g", 6L, 2000000L)))
    assert(graft.ops.Stats.theilSen(pts.repartition(4), "k",
        col("x"), col("y"))
      .as[(String, Long, Long)].collect().toSeq === got)
  }

  test("sessionPaths: gap splits sessions, first-k truncation, tie-break order") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val ev = Seq(
      (1L, 10L, 0L, "A"), (1L, 11L, 1L, "B"),
      (1L, 12L, 2L, "C"), (1L, 13L, 3L, "D"),      // one session, k=3 cuts D
      (2L, 20L, 0L, "A"), (2L, 21L, 2000000L, "B")) // 33 min gap: two sessions
      .toDF("user_id", "event_id", "ts_ms", "event_type")
    val got = graft.ops.Stats.sessionPaths(ev, "user_id", col("ts_ms"),
        col("event_id"), "event_type", gapMs = 1800000L, k = 3)
      .as[(String, Long)].collect().sortBy(_._1).toSeq
    assert(got === Seq(("A", 1L), ("A>B>C", 1L), ("B", 1L)))
  }

  test("basketAffinity: session-distinct presence, integer lift, attract/repel signs") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // u1 one session {A,B,A}->{A,B}; u2 {A,C}; u3 {B}. 3 sessions.
    // n_a=2 n_b=2 n_c=1. (A,B): 1*3e6/(2*2)=750000 (repel);
    // (A,C): 1*3e6/(2*1)=1500000 (attract).
    val ev = Seq(
      (1L, 10L, 0L, "A"), (1L, 11L, 1L, "B"), (1L, 12L, 2L, "A"),
      (2L, 20L, 0L, "A"), (2L, 21L, 1L, "C"),
      (3L, 30L, 0L, "B"))
      .toDF("user_id", "event_id", "ts_ms", "event_type")
    val got = graft.ops.Stats.basketAffinity(ev, "user_id", col("ts_ms"),
        col("event_id"), "event_type", gapMs = 1800000L)
      .as[(String, String, Long, Long, Long, Long)]
      .collect().sortBy(t => (t._2, t._1)).toSeq
    assert(got === Seq(
      ("A", "B", 1L, 2L, 2L, 750000L),
      ("A", "C", 1L, 2L, 1L, 1500000L)))
    // a 31-minute gap splits u1's session: {A,B} and {A} ->
    // n_a becomes 3 over 4 sessions; (A,B) lift 1*4e6/(3*2)=666666
    val split = ev.withColumn("ts_ms",
      when($"event_id" === 12L, lit(2000000L)).otherwise($"ts_ms"))
    val got2 = graft.ops.Stats.basketAffinity(split, "user_id",
        col("ts_ms"), col("event_id"), "event_type", gapMs = 1800000L)
      .as[(String, String, Long, Long, Long, Long)]
      .collect().sortBy(t => (t._2, t._1)).toSeq
    assert(got2.find(t => t._1 == "A" && t._2 == "B").get._6 === 666666L)
  }

  test("cohortLtv: cohort anchoring, per-age actives, cumulative value") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // two users join in week of 2024-01-01 (Mon), one in week+1;
    // u1 spends in weeks 0 and 1, u2 only week 0, u3 in ITS week 0
    val ev = Seq(
      (1L, "2024-01-01 10:00:00", 100L), (1L, "2024-01-09 10:00:00", 50L),
      (2L, "2024-01-02 10:00:00", 30L),
      (3L, "2024-01-08 10:00:00", 70L))
      .toDF("user_id", "s", "cents")
      .select($"user_id", $"s".cast("timestamp").as("ts"), $"cents")
    val got = graft.ops.Stats.cohortLtv(ev, "user_id", "ts", "cents")
      .select(date_format($"cohort_week", "yyyy-MM-dd").as("cw"),
        $"week_k", $"n_active", $"value_cents", $"cum_value_cents")
      .as[(String, Long, Long, Long, Long)].collect().sortBy(t => (t._1, t._2)).toSeq
    assert(got === Seq(
      ("2024-01-01", 0L, 2L, 130L, 130L),  // u1+u2 week 0
      ("2024-01-01", 1L, 1L, 50L, 180L),   // u1 returns; cum 130+50
      ("2024-01-08", 0L, 1L, 70L, 70L)))   // u3's own cohort
  }

  test("abTest: Welch z from exact sums, degenerate cohorts NULL, diff always present") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq(
      ("g", 0L, 10L), ("g", 2L, 20L),              // cohort A (even)
      ("g", 1L, 20L), ("g", 3L, 30L), ("g", 5L, 40L), // cohort B (odd)
      ("tiny", 0L, 5L), ("tiny", 1L, 9L),          // n=1 per side -> z NULL
      ("flat", 0L, 7L), ("flat", 2L, 7L),          // zero variance both
      ("flat", 1L, 7L), ("flat", 3L, 7L))
      .toDF("grp", "uid", "y")
    val got = graft.ops.Stats.abTest(df, "grp", col("uid") % 2 === 1,
        col("y"))
      .as[(String, Long, Long, Long, Option[Long])]
      .collect().sortBy(_._1).toSeq
    // hand stats: A mean 15 (var-num 100), B mean 30 (var-num 600)
    val z = (30.0 - 15.0) / math.sqrt(
      100.0 / (2.0 * 2.0 * 1.0) + 600.0 / (3.0 * 3.0 * 2.0))
    assert(got === Seq(
      ("flat", 2L, 2L, 0L, None),
      ("g", 2L, 3L, 15000000L, Some(math.round(z * 1e6))),
      ("tiny", 1L, 1L, 4000000L, None)))
  }

  test("linReg: perfect line exact micro units, constant-x and constant-y emit NULL") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // y = 2x + 1 exactly; plus a constant-y group and a constant-x group
    val df = Seq(
      ("line", 1L, 3L), ("line", 2L, 5L), ("line", 3L, 7L), ("line", 4L, 9L),
      ("flaty", 1L, 4L), ("flaty", 2L, 4L), ("flaty", 3L, 4L),
      ("flatx", 5L, 1L), ("flatx", 5L, 9L))
      .toDF("grp", "x", "y")
    val got = graft.ops.Stats.linReg(df, "grp", col("x"), col("y"))
      .as[(String, Long, Option[Long], Option[Long], Option[Long])]
      .collect().sortBy(_._1).toSeq
    assert(got === Seq(
      ("flatx", 2L, None, None, None),
      // slope 0, intercept 4, r2 = 0/0 -> NULL (deny = 0)
      ("flaty", 3L, Some(0L), Some(4000000L), None),
      ("line", 4L, Some(2000000L), Some(1000000L), Some(1000000L))))
  }

  test("kaplanMeier: hand-checked risk sets, censoring, quantized hazards, poisoned tail") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import java.sql.Timestamp
    def d(day: Int) = Timestamp.valueOf(
      java.time.LocalDate.of(2024, 1, 1).plusDays(day).atStartOfDay())
    // horizon = H's last order (day 200); A churned (105-day gap),
    // B/H active inside 60 days of horizon -> censored; C churned day 0
    val orders = Seq(
      ("A", d(0)), ("A", d(95)),
      ("B", d(10)), ("B", d(190)),
      ("C", d(0)),
      ("H", d(50)), ("H", d(200))).toDF("id", "ts")
    val got = graft.ops.Stats.kaplanMeier(orders, "id", col("ts"),
        periodDays = 30, churnGapDays = 60)
      .orderBy("t")
      .as[(Long, Long, Long, Long, Option[Long], Option[Long])]
      .collect().toSeq
    // t:    A=95//30=3 ev, B=180//30=6 cens, C=0 ev, H=150//30=5 cens
    // risk: t0:4  t3:3  t5:2  t6:1
    // haz:  ln(3/4)e6=-287682, ln(2/3)e6=-405465, ln(2/2)=0, ln(1/1)=0
    assert(got == Seq(
      (0L, 4L, 1L, 0L, Some(-287682L), Some(-287682L)),
      (3L, 3L, 1L, 0L, Some(-405465L), Some(-693147L)),
      (5L, 2L, 0L, 1L, Some(0L), Some(-693147L)),
      (6L, 1L, 0L, 1L, Some(0L), Some(-693147L))), got.toString)
    // heavy same-period mortality: 2 events + 1 censored in one period
    // -> one -ln(3) hazard step. (A risk set can never die out ENTIRELY
    // under this censoring rule — the horizon-defining subject has gap
    // 0 and is always censored, so n_risk > n_events at every t; the
    // ln(0)->NULL poison path is a defensive guard, exercised here
    // only for its arithmetic neighborhood.)
    val heavy = Seq(("X", d(0)), ("Y", d(0)), ("Z", d(200)))
      .toDF("id", "ts")
    val dead = graft.ops.Stats.kaplanMeier(heavy, "id", col("ts"),
        periodDays = 30, churnGapDays = 60)
      .orderBy("t")
      .as[(Long, Long, Long, Long, Option[Long], Option[Long])]
      .collect().toSeq
    // X,Y: life 0, gap 200 -> events; Z single order at day 200:
    // life 0, gap 0 -> censored. t0: n_risk 3, d 2, c 1,
    // haz = round(ln(1/3)*1e6) = -1098612
    assert(dead == Seq((0L, 3L, 2L, 1L, Some(-1098612L), Some(-1098612L))),
      dead.toString)
    // layout independence
    val re = graft.ops.Stats.kaplanMeier(orders.repartition(4), "id",
        col("ts"), 30, 60)
      .orderBy("t")
      .as[(Long, Long, Long, Long, Option[Long], Option[Long])]
      .collect().toSeq
    assert(re == got)
  }

  test("timeToConvert: hand-checked rates, pre-signup purchases ignored, null-q cohorts survive") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import java.sql.Timestamp
    def t(day: Int, min: Int) = Timestamp.valueOf(
      java.time.LocalDate.of(2024, 1, 1).plusDays(day) // 2024-01-01 is a Monday
        .atStartOfDay.plusMinutes(min))
    val ev = Seq(
      ("u1", "signup", t(0, 600)), ("u1", "purchase", t(0, 630)),   // 30 min
      ("u2", "signup", t(0, 0)), ("u2", "purchase", t(2, 0)),       // 2880 min
      ("u2", "purchase", t(-1, 0)),                                  // pre-signup: ignored
      ("u3", "signup", t(1, 0)),                                     // never converts
      ("u4", "purchase", t(0, 0)),                                   // no signup: excluded
      ("u5", "signup", t(14, 0)), ("u5", "purchase", t(14, 90)),    // 90 min, week 3
      ("u6", "signup", t(28, 0))                                     // lone unconverted cohort
    ).toDF("user_id", "event_type", "ts")
    val got = graft.ops.Stats.timeToConvert(ev, "user_id", col("ts"),
        col("event_type"), "signup", "purchase", Seq(500000L, 900000L))
      .select(col("cohort_week").cast("string"), col("n_signups"),
        col("n_converted"), col("convert_ppm"), col("q_ppm"),
        col("latency_min"))
      .as[(String, Long, Long, Long, Option[Long], Option[Long])]
      .collect().toSet
    val w1 = "2024-01-01 00:00:00"; val w3 = "2024-01-15 00:00:00"
    val w5 = "2024-01-29 00:00:00"
    assert(got == Set(
      // cohort w1: u1,u2,u3 -> 2/3 convert; p50 over {30,2880}=30, p90=2880
      (w1, 3L, 2L, 666666L, Some(500000L), Some(30L)),
      (w1, 3L, 2L, 666666L, Some(900000L), Some(2880L)),
      (w3, 1L, 1L, 1000000L, Some(500000L), Some(90L)),
      (w3, 1L, 1L, 1000000L, Some(900000L), Some(90L)),
      // zero-conversion cohort keeps its row, quantiles NULL
      (w5, 1L, 0L, 0L, None, None)), got.toString)
    // layout independence
    val re = graft.ops.Stats.timeToConvert(ev.repartition(5), "user_id",
        col("ts"), col("event_type"), "signup", "purchase",
        Seq(500000L, 900000L))
      .select(col("cohort_week").cast("string"), col("n_signups"),
        col("n_converted"), col("convert_ppm"), col("q_ppm"),
        col("latency_min"))
      .as[(String, Long, Long, Long, Option[Long], Option[Long])]
      .collect().toSet
    assert(re == got)
  }

  test("pruneSim: exact tile arithmetic on a uniform grid - range layouts vs Z-tiles") {
    import spark.implicits._
    // full uniform coverage of the 10-bit x 10-bit domain (stride 8):
    // every simulated file is non-empty and the geometry is exact
    val grid = (for { a <- 0 until 1024 by 8; b <- 0 until 1024 by 8 }
      yield (a.toLong, b.toLong)).toDF("x", "y")
    val got = graft.ops.ZOrder.pruneSim(grid, "x", "y",
        bitsPer = 10, nFiles = 64, nPreds = 16)
      .select("layout", "dim", "pred_id", "n_files", "n_scanned", "prune_ppm")
      .as[(String, String, Long, Long, Long, Long)].collect()
    assert(got.length == 3 * 2 * 16)
    got.foreach { case (layout, dim, pid, nf, ns, ppm) =>
      assert(nf == 64L, s"$layout: uniform grid must fill all 64 files")
      (layout, dim) match {
        // own-column range layout: file width 16, predicate width 64
        // -> exactly 4 files scanned
        case ("range_x", "x") | ("range_y", "y") =>
          assert(ns == 4L && ppm == 937500L, s"$layout/$dim/$pid: $ns")
        // other-column predicates read EVERYTHING under a single-
        // column layout - the reason multi-dim tables want Z
        case ("range_x", "y") | ("range_y", "x") =>
          assert(ns == 64L && ppm == 0L, s"$layout/$dim/$pid: $ns")
        // Z layout: 64 files = 8x8 grid of 128x128 Morton tiles; a
        // width-64 predicate on EITHER dim lives in one tile strip
        // -> 8 files, the O(sqrt) trade both ways
        case ("zorder", _) =>
          assert(ns == 8L && ppm == 875000L, s"zorder/$dim/$pid: $ns")
        case other => fail(s"unexpected layout/dim $other")
      }
    }
    // layout independence of the simulation itself
    val re = graft.ops.ZOrder.pruneSim(grid.repartition(7), "x", "y",
        10, 64, 16)
      .select("layout", "dim", "pred_id", "n_files", "n_scanned", "prune_ppm")
      .as[(String, String, Long, Long, Long, Long)].collect().toSet
    assert(re == got.toSet)
  }
}
