package graft

import org.apache.spark.sql.functions._

import graft.ops.Sketch
import graft.util.Hashing

/** KMV bottom-k sketches: exactness of the sketch itself against a
  * driver-side reference, equality of the salted two-stage k-min with
  * the direct window, estimator accuracy on a known cardinality,
  * partition independence, and the unsaturated-case equivalence of
  * the sketched overlap matrix with the exact self-join operator.
  */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  test("kmv sketch is exactly the k smallest distinct hashes") {
    val vals = (0 until 300).map(i => s"v$i")
    // duplicates must not change the sketch
    val df = (vals ++ vals.take(50)).toDF("v").withColumn("g", lit("x"))
    val got = Sketch.kmv(df, "g", col("v"), k = 16)
      .orderBy("pos").select("h").as[Long].collect().toSeq
    val want = vals.map(Hashing.portableHash64Const).distinct.sorted.take(16)
    assert(got == want)
  }

  test("salted two-stage k-min equals the direct per-group window") {
    val df = (0 until 2000).map(i => (s"g${i % 3}", s"v$i")).toDF("g", "v")
    val direct = df
      .select(col("g"), Hashing.portableHash64(col("v")).as("h")).distinct()
      .withColumn("pos", expr(
        "row_number() over (partition by g order by h) - 1").cast("long"))
      .filter(col("pos") < 32)
    val salted = Sketch.kmv(df, "g", col("v"), k = 32, salts = 16)
    assert(salted.exceptAll(direct).isEmpty && direct.exceptAll(salted).isEmpty)
  }

  test("distinct estimate lands within KMV error bounds at k=256") {
    val n = 5000
    val df = (0 until n).flatMap(i => Seq.fill(1 + i % 3)(s"item$i"))
      .toDF("v").withColumn("g", lit("corpus"))
    val est = Sketch.distinctCount(df, "g", col("v"), k = 256)
      .select("est_distinct").as[Long].head()
    // 1/sqrt(256) = 6.25% standard error; 4 sigma = 25%
    assert(math.abs(est - n) < n / 4, s"est $est vs true $n")
  }

  test("unsaturated sketch reports the exact distinct count") {
    val df = (0 until 40).map(i => ("g", s"v$i")).toDF("g", "v")
    val row = Sketch.distinctCount(df, "g", col("v"), k = 64)
      .select("k_eff", "est_distinct").as[(Long, Long)].head()
    assert(row == ((40L, 40L)))
  }

  test("sketch skips nulls like count(col) does") {
    val df = Seq(Some("a"), Some("b"), None, Some("a"))
      .toDF("v").withColumn("g", lit("x"))
    assert(Sketch.distinctCount(df, "g", col("v"), k = 8)
      .select("est_distinct").as[Long].head() == 2L)
  }

  test("sketch output is partition-independent") {
    val df = (0 until 500).map(i => (s"g${i % 2}", s"v$i")).toDF("g", "v")
    val a = Sketch.kmv(df.repartition(1), "g", col("v"), k = 20)
    val b = Sketch.kmv(df.repartition(13, col("v")), "g", col("v"), k = 20)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("overlap estimate recovers a planted 50% intersection") {
    // A = 0..3999, B = 2000..5999 → |A∩B| = 2000, |A∪B| = 6000
    val df = ((0 until 4000).map(i => ("a", s"item$i")) ++
      (2000 until 6000).map(i => ("b", s"item$i"))).toDF("g", "v")
    val r = Sketch.overlap(df, "g", col("v"), k = 256)
      .select("est_union", "est_shared").as[(Long, Long)].head()
    assert(math.abs(r._1 - 6000) < 1500, s"union ${r._1}")
    assert(math.abs(r._2 - 2000) < 700, s"shared ${r._2}")
  }

  implicit class Tup3Ops(rows: Array[(String, String, Long)]) {
    def toMap2: Map[(String, String), Long] =
      rows.map { case (a, b, n) => (a, b) -> n }.toMap
  }

  test("unsaturated overlap equals the exact self-join operator") {
    // 50-doc corpus: every per-source sketch holds ALL its hashes, so
    // est_shared must EQUAL dedup_source_overlap's n_shared pair for
    // pair, and pairs absent from the exact matrix must read 0
    val sketch = graft.queries.PipelineQueries
      .dedupOverlapSketchQ(spark, sfDir)
    assert(sketch.filter(col("k_eff") >= 64).isEmpty)
    val got = sketch.filter(col("est_shared") > 0)
      .select("source_a", "source_b", "est_shared")
      .as[(String, String, Long)].collect().toMap2
    val want = graft.queries.PipelineQueries
      .dedupSourceOverlapQ(spark, sfDir)
      .select("source_a", "source_b", "n_shared")
      .as[(String, String, Long)].collect().toMap2
    assert(got == want)
  }

  test("quantile sketch: deterministic sample, quantiles near exact") {
    import graft.ops.Profile
    val df = (1 to 10000).map(i => (i.toLong, i.toDouble)).toDF("id", "x")
    val out = Profile.quantileSketch(df, col("id"), Seq("x"), ratePpm = 200000L)
    val (n, p50, p90) = out.select("n_sample", "p50", "p90")
      .as[(Long, Double, Double)].head()
    // uniform hash keeps ~20%; quantiles of the sample track the
    // uniform 1..10000 population's
    assert(math.abs(n - 2000) < 300, s"sample size $n")
    assert(math.abs(p50 - 5000) < 500, s"p50 $p50")
    assert(math.abs(p90 - 9000) < 500, s"p90 $p90")
    // partition-independent and null-skipping
    val b = Profile.quantileSketch(df.repartition(7), col("id"), Seq("x"), 200000L)
    assert(b.collect().toSet == out.collect().toSet)
    val withNulls = df.withColumn("x",
      when(col("id") % 2 === 0, col("x")))
    val nn = Profile.quantileSketch(withNulls, col("id"), Seq("x"), 200000L)
      .select("n_sample").as[Long].head()
    assert(nn < n && nn > n / 3, s"nulls must be skipped, got $nn of $n")
  }

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-sketch").toString

  test("cardinality monitor: cross-trigger merge equals the batch-union sketch") {
    import graft.streaming.CardinalityStream
    val out = tmp(); val st = tmp()
    val b0 = (0 until 300).map(i => (s"s${i % 2}", s"v$i")).toDF("src", "v")
    val b1 = (150 until 450).map(i => (s"s${i % 2}", s"v$i")).toDF("src", "v")
    CardinalityStream.cardinalityBatch(spark, b0, 0L, out, st, "src", "v", k = 64)
    CardinalityStream.cardinalityBatch(spark, b1, 1L, out, st, "src", "v", k = 64)
    // state after trigger 1 IS the bottom-k sketch of the union corpus
    val got = spark.read.parquet(s"$st/batch=1")
      .select("src", "h").as[(String, Long)].collect().toSet
    val want = Sketch.kmv(b0.unionByName(b1), "src", col("v"), k = 64)
      .select("src", "h").as[(String, Long)].collect().toSet
    assert(got == want, "merged state must equal the from-scratch sketch")
    // trigger-1 report: lifetime totals and estimates over the union
    val r1 = spark.read.parquet(s"$out/batch=1")
      .select("src", "lifetime_rows", "est_distinct", "dup_ppm")
      .as[(String, Long, Long, Long)].collect()
      .map { case (s, lr, ed, dp) => s -> ((lr, ed, dp)) }.toMap
    for ((src, (lifetime, est, dupPpm)) <- r1) {
      assert(lifetime == 300L, s"$src lifetime $lifetime")
      // per-group true distinct = 225 (union of 0..299 and 150..449 halves)
      assert(math.abs(est - 225) < 80, s"$src est $est")
      // dup_ppm is DERIVED from the estimate by exact integer
      // arithmetic — assert the derivation (true fraction = 250000
      // ppm is covered by the est band above; a fixed dup_ppm band
      // would just re-tune itself to the estimator's noise)
      assert(dupPpm == math.max(0L, 1000000L - est * 1000000L / 300L),
        s"$src dup_ppm $dupPpm for est $est")
    }
  }

  test("cardinality monitor hll mode: cross-trigger max-merge equals the batch profiler; replay + dup alert") {
    import graft.streaming.CardinalityStream
    val out = tmp(); val st = tmp()
    val b0 = (0 until 300).map(i => (s"s${i % 2}", s"v$i")).toDF("src", "v")
    val b1 = (150 until 450).map(i => (s"s${i % 2}", s"v$i")).toDF("src", "v")
    CardinalityStream.hllBatch(spark, b0, 0L, out, st, "src", "v", p = 10)
    CardinalityStream.hllBatch(spark, b1, 1L, out, st, "src", "v", p = 10)
    // the max-merged register state yields the SAME estimate the
    // batch profiler computes from the union corpus (shared
    // Profile.hllRegisters/hllEstimateCol arithmetic — algebraic
    // mergeability, not a tolerance)
    val r1 = spark.read.parquet(s"$out/batch=1")
      .select("src", "lifetime_rows", "n_regs", "est_distinct", "dup_ppm")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(t => t._1 -> t).toMap
    Seq("s0", "s1").foreach { s =>
      val batchEst = graft.ops.Profile.hllDistinct(
          b0.unionByName(b1).filter(col("src") === s), Seq("v"), p = 10)
        .select("hll_est").as[Long].head()
      assert(r1(s)._4 == batchEst,
        s"$s: stream merge ${r1(s)._4} != batch profiler $batchEst")
      assert(r1(s)._2 == 300L)
      assert(r1(s)._5 == math.max(0L, 1000000L - r1(s)._4 * 1000000L / 300L),
        "dup_ppm derives from the estimate by exact integer arithmetic")
      // 225 true distinct per group at p=10 (~3.2% sigma): sane band
      assert(math.abs(r1(s)._4 - 225L) < 40L, s"$s est ${r1(s)._4}")
    }
    // at-least-once replay rewrites identical bytes
    val report1 = spark.read.parquet(s"$out/batch=1").collect().toSet
    val state1 = spark.read.parquet(s"$st/batch=1").collect().toSet
    CardinalityStream.hllBatch(spark, b1, 1L, out, st, "src", "v", p = 10)
    assert(spark.read.parquet(s"$out/batch=1").collect().toSet == report1)
    assert(spark.read.parquet(s"$st/batch=1").collect().toSet == state1)
    // a replayed dump DOUBLES dup_ppm's denominator while the
    // estimate stays put — unlike KMV, linear counting is near-exact
    // but not exact (200 values into 1024 registers collide ~19
    // times; the deterministic md5 layout lands on 199), so the
    // alert contract is: fresh reads ~0, a full replay reads ~½
    val out2 = tmp(); val st2 = tmp()
    val fresh = (0 until 200).map(i => ("crawl", s"doc$i")).toDF("src", "v")
    CardinalityStream.hllBatch(spark, fresh, 0L, out2, st2, "src", "v")
    CardinalityStream.hllBatch(spark, fresh, 1L, out2, st2, "src", "v")
    def dup(b: Long) = spark.read.parquet(s"$out2/batch=$b")
      .select("est_distinct", "dup_ppm").as[(Long, Long)].head()
    assert(dup(0) == ((199L, 5000L)), s"fresh trigger ${dup(0)}")
    assert(dup(1) == ((199L, 502500L)), s"replayed trigger ${dup(1)}")
    // state bounded: register rows per group never exceed 2^p
    val maxRegs = spark.read.parquet(s"$st/batch=1")
      .groupBy("src").count().agg(max("count")).as[Long].head()
    assert(maxRegs <= 1024L, s"register rows must stay bounded, got $maxRegs")
  }

  test("cardinality monitor: a replayed dump trips dup_ppm") {
    import graft.streaming.CardinalityStream
    val out = tmp(); val st = tmp()
    // 200 distinct values under k=256: the sketch stays unsaturated,
    // so the estimate is EXACT and the assertions are equalities
    val fresh = (0 until 200).map(i => ("crawl", s"doc$i")).toDF("src", "v")
    CardinalityStream.cardinalityBatch(spark, fresh, 0L, out, st, "src", "v")
    CardinalityStream.cardinalityBatch(spark, fresh, 1L, out, st, "src", "v")
    def dup(b: Long) = spark.read.parquet(s"$out/batch=$b")
      .select("dup_ppm").as[Long].head()
    assert(dup(0) == 0L, s"fresh trigger dup_ppm ${dup(0)}")
    assert(dup(1) == 500000L, s"replayed trigger dup_ppm ${dup(1)}")
  }

  test("cardinality monitor: at-least-once replay rewrites identical bytes") {
    import graft.streaming.CardinalityStream
    val out = tmp(); val st = tmp()
    val b0 = (0 until 100).map(i => (s"s${i % 3}", s"v$i")).toDF("src", "v")
    val b1 = (50 until 200).map(i => (s"s${i % 3}", s"v$i")).toDF("src", "v")
    CardinalityStream.cardinalityBatch(spark, b0, 0L, out, st, "src", "v", k = 32)
    CardinalityStream.cardinalityBatch(spark, b1, 1L, out, st, "src", "v", k = 32)
    val report0 = spark.read.parquet(s"$out/batch=0").collect().toSet
    val state0 = spark.read.parquet(s"$st/batch=0").collect().toSet
    // replay batch 0 AFTER batch 1 committed: must see only state < 0
    CardinalityStream.cardinalityBatch(spark, b0, 0L, out, st, "src", "v", k = 32)
    assert(spark.read.parquet(s"$out/batch=0").collect().toSet == report0)
    assert(spark.read.parquet(s"$st/batch=0").collect().toSet == state0)
  }

  test("cardinality monitor: NULL group keys form one monitored group") {
    import graft.streaming.CardinalityStream
    val out = tmp(); val st = tmp()
    val b0 = ((0 until 20).map(i => (Option.empty[String], s"v$i")) ++
      (0 until 10).map(i => (Some("s"), s"v$i"))).toDF("src", "v")
    CardinalityStream.cardinalityBatch(spark, b0, 0L, out, st, "src", "v", k = 16)
    CardinalityStream.cardinalityBatch(spark, b0, 1L, out, st, "src", "v", k = 16)
    val r1 = spark.read.parquet(s"$out/batch=1")
      .filter(col("src").isNull)
      .select("batch_rows", "lifetime_rows").as[(Long, Long)].collect()
    assert(r1.toSeq == Seq((20L, 40L)),
      s"null group must accumulate across triggers: ${r1.toSeq}")
    // and exactly one null-group state row set, capped at k
    assert(spark.read.parquet(s"$st/batch=1")
      .filter(col("src").isNull).count() <= 16L)
  }

  test("cardinality monitor: a feed gone null ALERTS instead of going silent") {
    import graft.streaming.CardinalityStream
    val out = tmp(); val st = tmp()
    val healthy = (0 until 100).map(i => ("crawl", Some(s"doc$i")))
      .toDF("src", "v")
    val broken = (0 until 100).map(_ => ("crawl", Option.empty[String]))
      .toDF("src", "v")
    CardinalityStream.cardinalityBatch(spark, healthy, 0L, out, st, "src", "v")
    CardinalityStream.cardinalityBatch(spark, broken, 1L, out, st, "src", "v")
    val r1 = spark.read.parquet(s"$out/batch=1")
      .select("batch_rows", "batch_distinct", "lifetime_rows", "est_distinct",
        "dup_ppm")
      .as[(Long, Long, Long, Long, Long)].collect()
    // the all-null trigger still reports: full row volume, zero new
    // distincts, lifetime advancing, dup_ppm rising to exactly half
    assert(r1.toSeq == Seq((100L, 0L, 200L, 100L, 500000L)), r1.toSeq.toString)
    // and an all-null FIRST sight of a group keeps its lifetime count
    val out2 = tmp(); val st2 = tmp()
    CardinalityStream.cardinalityBatch(spark, broken, 0L, out2, st2, "src", "v")
    CardinalityStream.cardinalityBatch(spark, broken, 1L, out2, st2, "src", "v")
    val r2 = spark.read.parquet(s"$out2/batch=1")
      .select("lifetime_rows", "est_distinct", "dup_ppm")
      .as[(Long, Long, Long)].collect()
    assert(r2.toSeq == Seq((200L, 0L, 1000000L)), r2.toSeq.toString)
  }

  test("cardinality stream end-to-end over a file feed") {
    import graft.streaming.CardinalityStream
    val feed = tmp(); val out = tmp(); val st = tmp(); val ckpt = tmp()
    (0 until 200).map(i => (s"s${i % 2}", s"v$i")).toDF("src", "v")
      .coalesce(1).write.mode("append").parquet(feed)
    val q = CardinalityStream.cardinalityStream(spark, feed, out, st, ckpt,
      "src", "v", k = 64)
    try {
      q.processAllAvailable()
      (100 until 300).map(i => (s"s${i % 2}", s"v$i")).toDF("src", "v")
        .coalesce(1).write.mode("append").parquet(feed)
      q.processAllAvailable()
    } finally q.stop()
    val reports = spark.read.option("basePath", out).parquet(out)
    assert(reports.count() == 4L, "2 groups x 2 triggers")
    val last = reports.filter(col("batch") === 1)
      .select("lifetime_rows").as[Long].collect()
    assert(last.toSeq == Seq(200L, 200L))
  }

  test("topk stream end-to-end over a file feed") {
    import graft.streaming.TopKStream
    val feed = tmp(); val out = tmp(); val st = tmp(); val ckpt = tmp()
    (0 until 200).map(i => (s"s${i % 2}", s"i${i % 6}")).toDF("src", "it")
      .coalesce(1).write.mode("append").parquet(feed)
    val q = TopKStream.topkStream(spark, feed, out, st, ckpt,
      "src", "it", k = 16)
    try {
      q.processAllAvailable()
      (0 until 100).map(i => (s"s${i % 2}", s"i${i % 3}")).toDF("src", "it")
        .coalesce(1).write.mode("append").parquet(feed)
      q.processAllAvailable()
    } finally q.stop()
    val reports = spark.read.option("basePath", out).parquet(out)
    val got = reports.filter(col("batch") === 1)
      .select("src", "item", "est_min").as[(String, String, Long)]
      .collect().map { case (s, i, c) => (s, i) -> c }.toMap
    val want = ((0 until 200).map(i => (s"s${i % 2}", s"i${i % 6}")) ++
      (0 until 100).map(i => (s"s${i % 2}", s"i${i % 3}")))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(got == want, "unsaturated stream counts must be exact lifetime counts")
    assert(got.size == want.size && got.nonEmpty)
  }

  /** Exact lower weighted quantile over (value, count) pairs — the
    * driver-side reference for the quantile monitor's selection rule.
    */
  private def lowerQuantile(vals: Seq[(Double, Long)], p: Int): Double = {
    val sorted = vals.sortBy(_._1)
    val tot = sorted.map(_._2).sum
    var cum = 0L
    sorted.find { case (_, c) => cum += c; cum * 100 >= p * tot }
      .map(_._1).getOrElse(sorted.last._1)
  }

  test("quantile monitor: unsaturated quantiles are EXACT over the whole history") {
    import graft.streaming.QuantileStream
    val out = tmp(); val st = tmp()
    // two triggers, 40 distinct values total under k=256: the sample
    // holds the complete weighted histogram, quantiles are equalities
    val b0 = (0 until 300).map(i => ("api", (i % 20).toDouble)).toDF("src", "ms")
    val b1 = (0 until 300).map(i => ("api", (i % 40).toDouble)).toDF("src", "ms")
    QuantileStream.quantileBatch(spark, b0, 0L, out, st, "src", "ms")
    QuantileStream.quantileBatch(spark, b1, 1L, out, st, "src", "ms")
    val union = ((0 until 300).map(i => (i % 20).toDouble) ++
      (0 until 300).map(i => (i % 40).toDouble))
      .groupBy(identity).map { case (v, o) => (v, o.size.toLong) }.toSeq
    val r = spark.read.parquet(s"$out/batch=1")
      .select("batch_rows", "rows_seen", "k_eff", "sampled_rows", "p50", "p90", "p99")
      .as[(Long, Long, Long, Long, Double, Double, Double)].head()
    assert(r == ((300L, 600L, 40L, 600L,
      lowerQuantile(union, 50), lowerQuantile(union, 90), lowerQuantile(union, 99))),
      r.toString)
  }

  test("quantile monitor: surviving sample counts are exact lifetime counts; merge equals from-scratch") {
    import graft.streaming.QuantileStream
    val out = tmp(); val st = tmp()
    // k=4 over 30 distinct values: saturated — membership monotonicity
    // must keep every SURVIVOR's count equal to its true total
    val b0 = (0 until 60).map(i => ("g", (i % 30).toDouble)).toDF("src", "ms")
    val b1 = (0 until 90).map(i => ("g", (i % 30).toDouble)).toDF("src", "ms")
    QuantileStream.quantileBatch(spark, b0, 0L, out, st, "src", "ms", k = 4)
    QuantileStream.quantileBatch(spark, b1, 1L, out, st, "src", "ms", k = 4)
    val got = spark.read.parquet(s"$st/batch=1")
      .select("v", "cnt").as[(Double, Long)].collect().toMap
    val trueCounts = ((0 until 60) ++ (0 until 90)).map(i => (i % 30).toDouble)
      .groupBy(identity).map { case (v, o) => (v, o.size.toLong) }
    assert(got.size == 4)
    for ((v, c) <- got) assert(c == trueCounts(v), s"value $v: cnt $c vs ${trueCounts(v)}")
    // and the merged state equals one-shot ingestion of the union
    val out2 = tmp(); val st2 = tmp()
    QuantileStream.quantileBatch(spark, b0.unionByName(b1), 0L, out2, st2,
      "src", "ms", k = 4)
    val oneShot = spark.read.parquet(s"$st2/batch=0")
      .select("v", "h", "cnt").collect().toSet
    val merged = spark.read.parquet(s"$st/batch=1")
      .select("v", "h", "cnt").collect().toSet
    assert(merged == oneShot, "merge must equal the from-scratch sample")
  }

  test("quantile monitor: at-least-once replay rewrites identical bytes") {
    import graft.streaming.QuantileStream
    val out = tmp(); val st = tmp()
    val b0 = (0 until 100).map(i => (s"s${i % 3}", (i % 17).toDouble)).toDF("src", "ms")
    val b1 = (50 until 200).map(i => (s"s${i % 3}", (i % 23).toDouble)).toDF("src", "ms")
    QuantileStream.quantileBatch(spark, b0, 0L, out, st, "src", "ms", k = 8)
    QuantileStream.quantileBatch(spark, b1, 1L, out, st, "src", "ms", k = 8)
    val report0 = spark.read.parquet(s"$out/batch=0").collect().toSet
    val state0 = spark.read.parquet(s"$st/batch=0").collect().toSet
    QuantileStream.quantileBatch(spark, b0, 0L, out, st, "src", "ms", k = 8)
    assert(spark.read.parquet(s"$out/batch=0").collect().toSet == report0)
    assert(spark.read.parquet(s"$st/batch=0").collect().toSet == state0)
  }

  test("quantile monitor: null values advance volume but not the sample") {
    import graft.streaming.QuantileStream
    val out = tmp(); val st = tmp()
    val healthy = (0 until 100).map(i => ("api", Some((i % 10).toDouble))).toDF("src", "ms")
    val broken = (0 until 100).map(_ => ("api", Option.empty[Double])).toDF("src", "ms")
    QuantileStream.quantileBatch(spark, healthy, 0L, out, st, "src", "ms")
    QuantileStream.quantileBatch(spark, broken, 1L, out, st, "src", "ms")
    val r = spark.read.parquet(s"$out/batch=1")
      .select("batch_rows", "rows_seen", "sampled_rows")
      .as[(Long, Long, Long)].head()
    // volume keeps counting; the sample freezes — the visible gap IS the alert
    assert(r == ((100L, 200L, 100L)), r.toString)
    // an all-null FIRST sight still persists the group's lifetime count
    val out2 = tmp(); val st2 = tmp()
    QuantileStream.quantileBatch(spark, broken, 0L, out2, st2, "src", "ms")
    val r2 = spark.read.parquet(s"$out2/batch=0")
      .select("rows_seen", "k_eff").as[(Long, Long)].head()
    assert(r2 == ((100L, 0L)), r2.toString)
  }

  test("quantile monitor: a tail shift moves p99 at the trigger it arrives") {
    import graft.streaming.QuantileStream
    val out = tmp(); val st = tmp()
    // healthy latency ~ 1..100; the degraded trigger adds a 5% tail at 10x
    val healthy = (1 to 1000).map(i => ("api", (i % 100 + 1).toDouble)).toDF("src", "ms")
    val degraded = ((1 to 950).map(i => ("api", (i % 100 + 1).toDouble)) ++
      (1 to 50).map(i => ("api", 1000.0 + i))).toDF("src", "ms")
    QuantileStream.quantileBatch(spark, healthy, 0L, out, st, "src", "ms", k = 512)
    QuantileStream.quantileBatch(spark, degraded, 1L, out, st, "src", "ms", k = 512)
    def q(b: Long) = spark.read.parquet(s"$out/batch=$b")
      .select("p50", "p99").as[(Double, Double)].head()
    val (p50h, p99h) = q(0)
    val (p50d, p99d) = q(1)
    // the median barely moves (the tail is 2.5% of lifetime mass)…
    assert(math.abs(p50d - p50h) <= 2.0,
      s"the median must stay put on a tail-only shift: $p50h -> $p50d")
    // …while p99 jumps clear into the injected tail — the signal a
    // mean/sigma monitor would smear across the whole distribution
    assert(p99h <= 100.0 && p99d > 1000.0,
      s"p99 must jump into the injected tail: $p99h -> $p99d")
  }

  test("kll quantile monitor: rank-error bound holds far past sample saturation, state stays bounded") {
    import graft.streaming.QuantileStream
    val out = tmp(); val st = tmp()
    // 3 triggers x 20k ALL-DISTINCT values (60k lifetime distincts):
    // the sample mode is saturated 200x over at k=256 and its
    // exactness spec cannot apply — this is the FLIPPED claim: the
    // KLL mode's rank error stays inside the proven envelope while
    // retained state stays ~3k items, at any distinct count
    val triggers = (0 until 3).map(t =>
      (0 until 20000).map(i => ("api", (t * 20000 + i).toDouble)))
    var history = Vector.empty[Double]
    for ((vals, t) <- triggers.zipWithIndex) {
      QuantileStream.kllBatch(spark, vals.toDF("src", "ms"), t.toLong,
        out, st, "src", "ms", k = 256)
      history = history ++ vals.map(_._2)
      val sorted = history.sorted
      val n = sorted.size.toLong
      val tol = n * 25000L / 1000000L // the gate bound, 2.5% of n
      val r = spark.read.parquet(s"$out/batch=$t")
        .select("rows_seen", "k_eff", "sampled_rows", "p50", "p90", "p99")
        .as[(Long, Long, Long, Double, Double, Double)].head()
      assert(r._1 == n && r._3 == n,
        s"trigger $t: lifetime counters must be exact, got $r")
      assert(r._2 <= 3 * 256 + 64,
        s"trigger $t: retained ${r._2} exceeds the capacity envelope")
      for ((p, q) <- Seq(50L -> r._4, 90L -> r._5, 99L -> r._6)) {
        val target = (p * n + 99) / 100
        val lt = sorted.count(_ < q).toLong
        val le = sorted.count(_ <= q).toLong
        assert(lt + 1 <= target + tol && le >= target - tol,
          s"trigger $t p$p: estimate $q rank span ($lt,$le] misses " +
            s"target $target ± $tol over $n rows")
      }
    }
  }

  test("kll quantile monitor: at-least-once replay rewrites identical bytes") {
    import graft.streaming.QuantileStream
    val out = tmp(); val st = tmp()
    val b0 = (0 until 5000).map(i => (s"s${i % 3}", (i * 37 % 4000).toDouble)).toDF("src", "ms")
    val b1 = (0 until 5000).map(i => (s"s${i % 3}", (i * 53 % 6000).toDouble)).toDF("src", "ms")
    QuantileStream.kllBatch(spark, b0, 0L, out, st, "src", "ms", k = 128)
    QuantileStream.kllBatch(spark, b1, 1L, out, st, "src", "ms", k = 128)
    val report0 = spark.read.parquet(s"$out/batch=0").collect().toSet
    val state0 = spark.read.parquet(s"$st/batch=0").collect().toSet
    // replay batch 0: exclude-own-writes reads the same (absent) prior,
    // the sorted fold + deterministic coins rebuild the same sketch
    QuantileStream.kllBatch(spark, b0, 0L, out, st, "src", "ms", k = 128)
    assert(spark.read.parquet(s"$out/batch=0").collect().toSet == report0)
    assert(spark.read.parquet(s"$st/batch=0").collect().toSet == state0)
  }

  test("kll quantile monitor: changing k on an existing state dir fails loudly") {
    import graft.streaming.QuantileStream
    val out = tmp(); val st = tmp()
    val b0 = (0 until 2000).map(i => ("api", (i % 500).toDouble)).toDF("src", "ms")
    QuantileStream.kllBatch(spark, b0, 0L, out, st, "src", "ms", k = 128)
    // level capacities depend on k: rebuilding the stored ladder under
    // a different k would silently void the error bound, so the state
    // row persists k and a mismatched run must fail with the stored
    // and requested values named — never reinterpret
    val ex = intercept[org.apache.spark.SparkException](
      QuantileStream.kllBatch(spark, b0, 1L, out, st, "src", "ms", k = 64))
    val msg = ex.getMessage +
      Iterator.iterate(ex.getCause)(c => Option(c).map(_.getCause).orNull)
        .takeWhile(_ != null).take(5).map(_.getMessage).mkString(" ")
    assert(msg.contains("k=128") && msg.contains("k=64"),
      s"mismatch must name stored and requested k: $msg")
    // the same k keeps working after the failed attempt
    QuantileStream.kllBatch(spark, b0, 1L, out, st, "src", "ms", k = 128)
    assert(spark.read.parquet(s"$out/batch=1").count() == 1L)
  }

  test("kll quantile monitor: a pre-k state dir (no k column) decodes under the run's k") {
    import graft.streaming.QuantileStream
    val out = tmp(); val st = tmp()
    val b0 = (0 until 2000).map(i => ("api", (i % 500).toDouble)).toDF("src", "ms")
    QuantileStream.kllBatch(spark, b0, 0L, out, st, "src", "ms", k = 128)
    // simulate a state dir written before k was persisted: rewrite the
    // version without its k column (those ladders were built under the
    // k the caller passed each trigger — adopting the run's k IS the
    // stored k, so the migration must decode, not crash)
    val legacy = spark.read.parquet(s"$st/batch=0").drop("k")
      .collect()
    val legacyDf = spark.createDataFrame(
      spark.sparkContext.parallelize(legacy.toIndexedSeq),
      spark.read.parquet(s"$st/batch=0").drop("k").schema)
    graft.util.Fs.delete(spark, s"$st/batch=0")
    legacyDf.write.parquet(s"$st/batch=0")
    QuantileStream.kllBatch(spark, b0, 1L, out, st, "src", "ms", k = 128)
    assert(spark.read.parquet(s"$out/batch=1").count() == 1L)
    // the migrated state persists k going forward, and a later run
    // under a DIFFERENT k still fails loudly on the stored value
    assert(spark.read.parquet(s"$st/batch=1").columns.contains("k"))
    val ex = intercept[org.apache.spark.SparkException](
      QuantileStream.kllBatch(spark, b0, 2L, out, st, "src", "ms", k = 64))
    val msg = ex.getMessage +
      Iterator.iterate(ex.getCause)(c => Option(c).map(_.getCause).orNull)
        .takeWhile(_ != null).take(5).map(_.getMessage).mkString(" ")
    assert(msg.contains("k=128") && msg.contains("k=64"), msg)
  }

  test("kll quantile monitor: null values advance volume but not the sketch") {
    import graft.streaming.QuantileStream
    val out = tmp(); val st = tmp()
    val healthy = (0 until 100).map(i => ("api", Some((i % 10).toDouble))).toDF("src", "ms")
    val broken = (0 until 100).map(_ => ("api", Option.empty[Double])).toDF("src", "ms")
    QuantileStream.kllBatch(spark, healthy, 0L, out, st, "src", "ms")
    QuantileStream.kllBatch(spark, broken, 1L, out, st, "src", "ms")
    val r = spark.read.parquet(s"$out/batch=1")
      .select("batch_rows", "rows_seen", "sampled_rows")
      .as[(Long, Long, Long)].head()
    assert(r == ((100L, 200L, 100L)), r.toString)
    // an all-null FIRST sight still persists the group's lifetime count
    val out2 = tmp(); val st2 = tmp()
    QuantileStream.kllBatch(spark, broken, 0L, out2, st2, "src", "ms")
    val r2 = spark.read.parquet(s"$out2/batch=0")
      .select("rows_seen", "k_eff").as[(Long, Long)].head()
    assert(r2 == ((100L, 0L)), r2.toString)
  }

  test("kll quantile stream end-to-end over a file feed") {
    import graft.streaming.QuantileStream
    val feed = tmp(); val out = tmp(); val st = tmp(); val ckpt = tmp()
    (0 until 400).map(i => (s"s${i % 2}", (i % 200).toDouble)).toDF("src", "ms")
      .coalesce(1).write.mode("append").parquet(feed)
    val q = QuantileStream.quantileStream(spark, feed, out, st, ckpt,
      "src", "ms", k = 64, mode = "kll")
    try {
      q.processAllAvailable()
      (0 until 400).map(i => (s"s${i % 2}", (i % 300).toDouble)).toDF("src", "ms")
        .coalesce(1).write.mode("append").parquet(feed)
      q.processAllAvailable()
    } finally q.stop()
    val reports = spark.read.option("basePath", out).parquet(out)
    assert(reports.count() == 4L, "2 groups x 2 triggers")
    assert(reports.filter(col("batch") === 1)
      .select("rows_seen").as[Long].collect().toSeq == Seq(400L, 400L))
    intercept[IllegalArgumentException](
      QuantileStream.quantileStream(spark, feed, out, st, ckpt,
        "src", "ms", mode = "bogus"))
  }

  test("quantile stream end-to-end over a file feed") {
    import graft.streaming.QuantileStream
    val feed = tmp(); val out = tmp(); val st = tmp(); val ckpt = tmp()
    (0 until 200).map(i => (s"s${i % 2}", (i % 50).toDouble)).toDF("src", "ms")
      .coalesce(1).write.mode("append").parquet(feed)
    val q = QuantileStream.quantileStream(spark, feed, out, st, ckpt,
      "src", "ms", k = 64)
    try {
      q.processAllAvailable()
      (0 until 200).map(i => (s"s${i % 2}", (i % 80).toDouble)).toDF("src", "ms")
        .coalesce(1).write.mode("append").parquet(feed)
      q.processAllAvailable()
    } finally q.stop()
    val reports = spark.read.option("basePath", out).parquet(out)
    assert(reports.count() == 4L, "2 groups x 2 triggers")
    assert(reports.filter(col("batch") === 1)
      .select("rows_seen").as[Long].collect().toSeq == Seq(200L, 200L))
  }

  test("topk monitor: exact below k, MG bounds above, heavy item never lost") {
    import graft.streaming.TopKStream
    // exact mode: <= k distinct items per group -> counters EXACT
    val out = tmp(); val st = tmp()
    val b0 = (0 until 300).map(i => (s"s${i % 2}", s"i${i % 5}")).toDF("src", "it")
    val b1 = (0 until 200).map(i => (s"s${i % 2}", s"i${i % 4}")).toDF("src", "it")
    TopKStream.topkBatch(spark, b0, 0L, out, st, "src", "it", k = 8)
    TopKStream.topkBatch(spark, b1, 1L, out, st, "src", "it", k = 8)
    val got = spark.read.parquet(s"$out/batch=1")
      .select("src", "item", "est_min", "decremented", "lifetime_rows", "hh_ppm")
      .as[(String, String, Long, Long, Long, Long)].collect()
    val want = b0.unionByName(b1).groupBy("src", "it").count()
      .as[(String, String, Long)].collect()
      .map { case (s, i, c) => (s, i) -> c }.toMap
    assert(got.nonEmpty)
    got.foreach { case (s, i, est, dec, lr, ppm) =>
      assert(dec == 0L, s"unsaturated summary must not decrement ($s,$i)")
      assert(est == want((s, i)), s"($s,$i) est $est vs ${want((s, i))}")
      assert(lr == 250L)
      assert(ppm == est * 1000000L / lr)
    }
    // saturating tail: planted heavy item + per-batch-unique tail
    // under k=8 -> the heavy item survives every trigger with
    // est_min <= true <= est_min + decremented
    val out2 = tmp(); val st2 = tmp()
    def tail(b: Int) = (0 until 120).map(i => ("g", s"t$b-$i"))
    def heavy(n: Int) = (0 until n).map(_ => ("g", "HOT"))
    for (b <- 0 until 3)
      TopKStream.topkBatch(spark, (heavy(80) ++ tail(b)).toDF("src", "it"),
        b.toLong, out2, st2, "src", "it", k = 8)
    val rep = spark.read.parquet(s"$out2/batch=2")
      .select("item", "est_min", "decremented", "rank")
      .as[(String, Long, Long, Long)].collect()
    val hot = rep.find(_._1 == "HOT")
    assert(hot.isDefined, "240/600-frequency item must survive k=8 MG")
    val (_, est, dec, rank) = hot.get
    assert(rank == 1L)
    assert(est <= 240L && 240L <= est + dec,
      s"MG bound violated: est $est dec $dec true 240")
  }

  test("topk monitor: at-least-once replay rewrites identical bytes; state bounded and pruned") {
    import graft.streaming.TopKStream
    val out = tmp(); val st = tmp()
    val batches = (0 until 6).map(b =>
      (0 until 100).map(i => (s"s${i % 2}", s"i$b-${i % 30}")).toDF("src", "it"))
    batches.zipWithIndex.foreach { case (b, i) =>
      TopKStream.topkBatch(spark, b, i.toLong, out, st, "src", "it", k = 16)
    }
    // replay the LAST batch (the only one streaming redelivers) after
    // its own state committed: exclude-own-writes must reproduce it
    val report5 = spark.read.parquet(s"$out/batch=5").collect().toSet
    val state5 = spark.read.parquet(s"$st/batch=5").collect().toSet
    TopKStream.topkBatch(spark, batches(5), 5L, out, st, "src", "it", k = 16)
    assert(spark.read.parquet(s"$out/batch=5").collect().toSet == report5)
    assert(spark.read.parquet(s"$st/batch=5").collect().toSet == state5)
    // state: <= k counter rows per group per version; versions pruned
    val perGroup = spark.read.parquet(s"$st/batch=5")
      .filter(col("item").isNotNull)
      .groupBy("src").count().as[(String, Long)].collect()
    perGroup.foreach { case (g, n) => assert(n <= 16L, s"$g has $n counters") }
    val dirs = new java.io.File(st).list().count(_.startsWith("batch="))
    assert(dirs <= 4, s"state versions must prune to KEEP_VERSIONS, got $dirs")
  }

  test("topk monitor: NULL group forms one group; null items advance volume only") {
    import graft.streaming.TopKStream
    val out = tmp(); val st = tmp()
    val b = ((0 until 20).map(_ => (Option.empty[String], Option("x"))) ++
      (0 until 10).map(_ => (Some("s"), Option("y"))) ++
      (0 until 5).map(_ => (Some("s"), Option.empty[String])))
      .toDF("src", "it")
    TopKStream.topkBatch(spark, b, 0L, out, st, "src", "it", k = 4)
    TopKStream.topkBatch(spark, b, 1L, out, st, "src", "it", k = 4)
    val r1 = spark.read.parquet(s"$out/batch=1")
    assert(r1.filter(col("src").isNull)
      .select("item", "est_min", "lifetime_rows")
      .as[(String, Long, Long)].collect().toSeq == Seq(("x", 40L, 40L)))
    // null item rows counted in lifetime volume, never as counters
    assert(r1.filter(col("src") === "s")
      .select("item", "est_min", "lifetime_rows")
      .as[(String, Long, Long)].collect().toSeq == Seq(("y", 20L, 30L)))
  }

  test("profile_sketch exercises both estimator branches at sf0.001") {
    val rows = graft.queries.PipelineQueries.profileSketchQ(spark, sfDir)
      .select("col_name", "k_eff", "est_distinct")
      .as[(String, Long, Long)].collect()
      .map { case (c, kEff, est) => c -> (kEff, est) }.toMap
    // 50 docs: lang/source under k=64 (exact), doc_id has 50 distinct
    val exact = graft.queries.PipelineQueries.profileTableQ(spark, sfDir)
      .select("col_name", "n_distinct").as[(String, Long)].collect().toMap
    for ((c, (kEff, est)) <- rows if kEff < 64)
      assert(est == exact(c), s"unsaturated $c: est $est vs ${exact(c)}")
  }

  test("equi-depth histogram: near-equal bin mass, heavy ties land whole in one bin") {
    import org.apache.spark.sql.functions.col
    // 80 distinct uniform values -> 4 bins of exactly 20 rows
    val uni = (0 until 80).map(i => i.toDouble).toDF("v")
    val gotU = graft.ops.Profile.equiDepthHistogram(uni, Seq("v"), bins = 4)
      .select("bin", "n_rows", "lo_cents", "hi_cents")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(gotU.map(_._2) == Seq(20L, 20L, 20L, 20L), s"uniform: $gotU")
    assert(gotU.map(_._1) == Seq(0L, 1L, 2L, 3L))
    assert(gotU.head._3 == 0L && gotU.last._4 == 7900L, "edges in cents")
    // 90 copies of one value + 10 singletons: the tie block stays
    // whole in bin 0 (first-rank rule), the tail fills the last bin
    val skew = (Seq.fill(90)(1.0) ++ (0 until 10).map(i => 100.0 + i)).toDF("v")
    val gotS = graft.ops.Profile.equiDepthHistogram(skew, Seq("v"), bins = 4)
      .select("bin", "n_rows").as[(Long, Long)].collect().toMap
    assert(gotS(0L) == 90L, s"tie block must land whole in bin 0: $gotS")
    assert(gotS(3L) == 10L, "the distinct tail fills its rank bin")
    assert(gotS.values.sum == 100L)
    // layout independence
    val again = graft.ops.Profile.equiDepthHistogram(
        skew.repartition(5), Seq("v"), bins = 4)
      .select("bin", "n_rows").as[(Long, Long)].collect().toMap
    assert(again == gotS)
  }

  test("column entropy: constant zero, uniform ln(k), skew below uniform, nulls on their own axis") {
    val df = (0 until 120).map { i =>
      (i.toLong,                                   // unique
        "const",                                   // constant
        s"u${i % 4}",                              // uniform 4
        if (i < 117) "big" else s"rare$i",         // heavy skew, 4 distinct
        if (i % 3 == 0) null else "x")             // nulls
    }.toDF("id", "c", "u", "s", "nl")
    val got = graft.ops.Profile.columnEntropy(df,
        Seq("id", "c", "u", "s", "nl"))
      .select("col_name", "n", "n_distinct", "n_null", "ent_micro")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(t => t._1 -> t).toMap
    assert(got("c") == (("c", 120L, 1L, 0L, 0L)), "constant column")
    // uniform over 4 values, 4 | 120: exactly round(ln(4)*1e6)
    assert(got("u") == (("u", 120L, 4L, 0L, 1386294L)), s"uniform: ${got("u")}")
    assert(got("id")._5 == math.round(math.log(120.0) * 1e6),
      "unique column reaches ln(n)")
    assert(got("s")._2 == 120L && got("s")._3 == 4L)
    assert(got("s")._5 < got("u")._5,
      "same distinct count, but skew must score below uniform")
    assert(got("nl") == (("nl", 80L, 1L, 40L, 0L)), s"null axis: ${got("nl")}")
    // layout independence
    val again = graft.ops.Profile.columnEntropy(df.repartition(7),
        Seq("u", "s")).select("col_name", "ent_micro")
      .as[(String, Long)].collect().toMap
    assert(again("u") == got("u")._5 && again("s") == got("s")._5)
  }

  test("benford: exact digit histogram, zero/null skipped, negatives folded, uniform flagged over geometric") {
    import org.apache.spark.sql.functions.col
    val rows = Seq(Some(1.0), Some(2.0), Some(3.0), Some(19.0), Some(0.0),
      None, Some(-25.5)).toDF("v")
    val got = graft.ops.Profile.benford(rows, Seq("v"))
      .select("digit", "n", "n_total", "obs_ppm", "exp_ppm", "dev_ppm")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(t => t._1 -> t).toMap
    // cents: 100, 200, 300, 1900, 2550 -> digits 1,2,3,1,2 over n=5
    assert(got.keySet == Set(1L, 2L, 3L))
    assert(got(1L) == ((1L, 2L, 5L, 400000L, 301029L, 98971L)))
    assert(got(2L) == ((2L, 2L, 5L, 400000L, 176091L, 223909L)))
    assert(got(3L) == ((3L, 1L, 5L, 200000L, 124938L, 75062L)))
    // detector direction: a geometric (scale-free) column must score a
    // smaller total deviation than a bounded uniform one
    val geo = (0 until 200).map(i => math.pow(1.1, i)).toDF("g")
    val uni = (0 until 200).map(i => 10.0 + i * 0.4).toDF("u")
    def totalDev(df: org.apache.spark.sql.DataFrame, c: String) =
      graft.ops.Profile.benford(df, Seq(c))
        .agg(org.apache.spark.sql.functions.sum("dev_ppm"))
        .as[Long].head()
    val (devG, devU) = (totalDev(geo, "g"), totalDev(uni, "u"))
    assert(devG * 2 < devU,
      s"geometric ($devG ppm) must sit far under uniform ($devU ppm)")
    // layout independence
    val again = graft.ops.Profile.benford(rows.repartition(3), Seq("v"))
      .select("digit", "n").as[(Long, Long)].collect().toMap
    assert(again == got.view.mapValues(_._2).toMap)
  }
}
