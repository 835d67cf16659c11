package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.cdc._
import graft.util.Tables

/** Config-file loading (reference config.go LoadConfig semantics) and
  * the Replicate CLI loop driven from a file.
  */
class ConfigSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(): String = Files.createTempDirectory("graft-cfg").toString

  /** The reference's own sslr.json example, translated: postgres URLs
    * become store dirs, catalog pkeys become the `keys` section.
    */
  private def exampleJson(src: String, tgt: String): String =
    s"""{
       |  "/* Connection URLS ": "*/",
       |  "source": "$src",
       |  "target": "$tgt",
       |  "tables": ["events"],
       |  "filteredTables": {
       |    "orders": {
       |      "wheres": ["o_orderkey > 0", "AND o_custkey >= 0"],
       |      "uses": ["events"]
       |    }
       |  },
       |  "keys": {
       |    "events": {"primaryKeys": ["event_id"]},
       |    "orders": {"primaryKeys": ["o_orderkey"], "versionColumn": "o_orderkey"}
       |  },
       |  "updateChunkSize": 10000,
       |  "deleteChunkSize": 50000,
       |  "copyChunks": 8,
       |  "minDeleteChunkSize": 250,
       |  "throttlePercentage": 75,
       |  "fullCopyThreshold": 0.5,
       |  "syncUpdates": true,
       |  "syncDeletes": true,
       |  "resyncOnSchemaChange": false,
       |  "stateTable": "__sslr_state"
       |}""".stripMargin

  test("config: loads the translated reference example with defaults and wheres join") {
    val cfg = ConfigLoader.loadString(exampleJson("/src", "/tgt"))
    assert(cfg.source == "/src" && cfg.target == "/tgt")
    assert(cfg.replication.updateChunkSize == 10000)
    assert(cfg.replication.deleteChunkSize == 50000L)
    assert(cfg.replication.copyChunks == 8)
    assert(cfg.replication.fullCopyThreshold == 0.5)
    assert(cfg.replication.syncUpdates && cfg.replication.syncDeletes)
    assert(!cfg.replication.resyncOnSchemaChange)
    assert(cfg.throttlePercentage == 75.0)
    assert(cfg.minDeleteChunkSize == 250L)
    assert(cfg.stateTable == "__sslr_state")
    assert(cfg.waitBetweenJobsMs == 5000L) // default
    val names = cfg.replication.tables.map(_.name)
    assert(names == Seq("events", "orders"))
    val orders = cfg.replication.tables.find(_.name == "orders").get
    // wheres [] lines join into ONE clause (reference config.go:139-145)
    assert(orders.where.contains("o_orderkey > 0 AND o_custkey >= 0"))
    assert(orders.uses == Seq("events"))
    val events = cfg.replication.tables.find(_.name == "events").get
    assert(events.primaryKeys == Seq("event_id"))
    assert(events.versionColumn == "event_id") // defaults to first pk
    assert(events.where.isEmpty)
  }

  test("config: unknown fields, where+wheres conflict, bad uses all rejected") {
    def bad(json: String, fragment: String): Unit = {
      val e = intercept[IllegalArgumentException](ConfigLoader.loadString(json))
      assert(e.getMessage.contains(fragment), s"got: ${e.getMessage}")
    }
    bad("""{"source":"a","target":"b","tables":[],"bogus":1}""", "bogus")
    bad("""{"source":"a","target":"b",
          |"filteredTables":{"t":{"where":"x","typo":1}},
          |"keys":{"t":{"primaryKeys":["id"]}}}""".stripMargin, "typo")
    bad("""{"source":"a","target":"b",
          |"filteredTables":{"t":{"where":"x > 0","wheres":["y > 0"]}},
          |"keys":{"t":{"primaryKeys":["id"]}}}""".stripMargin,
      "cannot set both 'where' and 'wheres'")
    bad("""{"source":"a","target":"b",
          |"filteredTables":{"t":{"where":"x","uses":["nope"]}},
          |"keys":{"t":{"primaryKeys":["id"]}}}""".stripMargin, "unknown table")
    bad("""{"source":"a","target":"b","tables":["t"]}""", "missing \"keys\"")
    bad("""{"target":"b","tables":[]}""", "missing 'source'")
  }

  test("config: comment-hack keys are ignored (reference sslr.json style)") {
    val cfg = ConfigLoader.loadString(
      """{
        |  "/* this is a comment ": "*/",
        |  "source": "s", "target": "t",
        |  "tables": ["x"],
        |  "keys": {"/* key section ": "*/", "x": {"primaryKeys": ["id"]}},
        |  "filteredTables": {"/* filters ": "*/"}
        |}""".stripMargin)
    assert(cfg.replication.tables.map(_.name) == Seq("x"),
      "comment keys must be ignored at every nesting level")
  }

  test("config: a table configured twice is rejected") {
    val e = intercept[IllegalArgumentException](ConfigLoader.loadString(
      """{"source":"s","target":"t","tables":["x"],
        |"filteredTables":{"x":{"where":"id > 0"}},
        |"keys":{"x":{"primaryKeys":["id"]}}}""".stripMargin))
    assert(e.getMessage.contains("more than once"))
  }

  test("replicate CLI loop: bounded continuous run from a config file converges") {
    val srcDir = tmpDir(); val tgtDir = tmpDir()
    val events = Tables.events(spark, sfDir).cache()
    val orders = Tables.orders(spark, sfDir).cache()
    events.write.mode("overwrite").parquet(s"$srcDir/events.parquet")
    orders.write.mode("overwrite").parquet(s"$srcDir/orders.parquet")

    val cfgFile = Paths.get(tmpDir(), "sslr.json")
    Files.writeString(cfgFile, exampleJson(srcDir, tgtDir))
    val cfg = ConfigLoader.load(cfgFile.toString)
      .copy(waitBetweenJobsMs = 0L)

    val cycles = Replicate.run(spark, cfg, continuous = true, maxCycles = 2)
    assert(cycles == 2)
    val tgtEvents = spark.read.parquet(s"$tgtDir/events.parquet")
    assert(tgtEvents.count() == events.count())
    val tgtOrders = spark.read.parquet(s"$tgtDir/orders.parquet")
    assert(tgtOrders.count() == orders.filter(expr("o_orderkey > 0 AND o_custkey >= 0")).count())
  }

  test("replicate CLI: stop flag ends the continuous loop after the current cycle") {
    val srcDir = tmpDir(); val tgtDir = tmpDir()
    Tables.events(spark, sfDir).write.mode("overwrite").parquet(s"$srcDir/events.parquet")
    val cfg = ConfigLoader.loadString(
      s"""{"source":"$srcDir","target":"$tgtDir","tables":["events"],
         |"keys":{"events":{"primaryKeys":["event_id"]}},
         |"waitBetweenJobs": 0}""".stripMargin)
    // stop fires as soon as the target exists — i.e. right after cycle 1
    // completes; the loop must finish that cycle and exit, not die mid-run
    val n = Replicate.run(spark, cfg, continuous = true, maxCycles = 100,
      stop = () => graft.util.Fs.existsNonEmpty(spark, s"$tgtDir/events.parquet"))
    assert(n == 1, s"expected exactly one cycle before the stop flag, got $n")
    assert(spark.read.parquet(s"$tgtDir/events.parquet").count() ==
      Tables.events(spark, sfDir).count())
  }

  test("throttle formula matches the reference's utilization-budget arithmetic") {
    // throttle_enabled.go: wait = 2 * (utilization - total*level) when over budget
    assert(Replicate.throttleWaitMs(800L, 1000L, 75.0) == 100L) // 2*(800-750)
    assert(Replicate.throttleWaitMs(700L, 1000L, 75.0) == 0L)   // under budget
    assert(Replicate.throttleWaitMs(999L, 1000L, 100.0) == 0L)  // 100% = no throttle
    assert(Replicate.throttleWaitMs(999L, 1000L, 150.0) == 0L)  // clamped to 100
    assert(Replicate.throttleWaitMs(500L, 1000L, 0.5) == 980L)  // clamped up to 1%: 2*(500-10)
  }

  test("config: targetBuckets routes the sink to a bucketed layout") {
    val srcDir = tmpDir(); val tgtDir = tmpDir()
    Tables.events(spark, sfDir).write.mode("overwrite").parquet(s"$srcDir/events.parquet")
    val cfg = ConfigLoader.loadString(
      s"""{"source":"$srcDir","target":"$tgtDir","tables":["events"],
         |"keys":{"events":{"primaryKeys":["event_id"]}},
         |"targetBuckets": 8}""".stripMargin)
    val n = Replicate.run(spark, cfg, continuous = false)
    assert(n == 1)
    val files = new java.io.File(s"$tgtDir/events.parquet").list()
    assert(files.exists(_.startsWith("graft_bucket=")), files.mkString(","))
  }

  test("pipeline runner: entropy_filter gates per-char entropy and streams per-row") {
    import org.apache.spark.sql.functions._
    val docs = graft.util.Tables.documents(spark, sfDir)
      // a degenerate one-symbol doc the min-entropy gate MUST drop,
      // and an empty doc the positive floor must also drop
      .unionByName(Seq((999001L, "aaaa aaaa aaaa", "en", "synth", 14L),
        (999002L, "", "en", "synth", 0L))
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val inDir = tmpDir() + "/docs.parquet"
    val outDir = tmpDir() + "/ent"
    docs.write.mode("overwrite").parquet(inDir)
    Pipeline.run(spark,
      s"""{"input": "$inDir", "output": "$outDir",
         |"stages": [{"op": "entropy_filter", "minMicroNatsPerChar": 1500000}]}""".stripMargin)
    val ent = graft.ops.TextAnalysis.entropy(docs, "text", "doc_id")
    val want = ent.filter($"n_chars" > 0 &&
        $"ent_micro" >= lit(1500000L) * $"n_chars" &&
        $"ent_micro" <= lit(4000000L) * $"n_chars")
      .select("doc_id").as[Long].collect().toSet
    val got = spark.read.parquet(outDir).select("doc_id").as[Long].collect().toSet
    assert(got == want)
    assert(!got.contains(999001L) && !got.contains(999002L),
      "one-symbol and empty docs must fail a positive entropy floor")
    assert(got.nonEmpty, "real docs must clear the floor")
    // per-row semantics: the streaming pipeline accepts the stage
    val feedDir = tmpDir(); val sOut = tmpDir(); val ckpt = tmpDir()
    docs.coalesce(1).write.mode("append").parquet(feedDir)
    val q = Pipeline.stream(spark,
      s"""{"input": "$feedDir", "output": "$sOut",
         |"stages": [{"op": "entropy_filter", "minMicroNatsPerChar": 1500000}]}""".stripMargin,
      ckpt)
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.read.option("basePath", sOut).parquet(sOut)
      .select("doc_id").as[Long].collect().toSet
    assert(streamed == want, "streamed per-row gate must equal the batch gate")
  }

  test("pipeline runner: readability_filter and code_filter gate per-row and stream") {
    import org.apache.spark.sql.functions._
    val docs = graft.util.Tables.documents(spark, sfDir)
      // one planted code doc the drop-mode filter MUST remove
      .unionByName(Seq((999003L,
        "def f(x):\n    return (x * 2);\n    var y = {1};\n    const z = [2];",
        "en", "synth", 60L))
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val inDir = tmpDir() + "/docs.parquet"
    docs.write.mode("overwrite").parquet(inDir)
    // chain both: grade band keeps mid-grade prose, code drops
    val outDir = tmpDir() + "/rc"
    val stages = """[{"op": "code_filter", "mode": "drop"},
      |{"op": "readability_filter", "minWords": 10,
      | "maxGradeMilli": 30000}]""".stripMargin
    Pipeline.run(spark,
      s"""{"input": "$inDir", "output": "$outDir", "stages": $stages""".stripMargin + "}")
    val notCode = graft.ops.TextAnalysis.codeDetect(docs, "text", "doc_id")
      .filter($"is_code" === 0).select("doc_id")
    val want = graft.ops.TextAnalysis.readability(
        docs.join(notCode, Seq("doc_id"), "left_semi"), "text", "doc_id")
      .filter($"n_words" >= 10 && $"fk_grade_milli" <= 30000)
      .select("doc_id").as[Long].collect().toSet
    val got = spark.read.parquet(outDir).select("doc_id").as[Long].collect().toSet
    assert(got == want && got.nonEmpty && !got.contains(999003L))
    // both are per-row pure: the streaming pipeline accepts the chain
    val feedDir = tmpDir(); val sOut = tmpDir(); val ckpt = tmpDir()
    docs.coalesce(1).write.mode("append").parquet(feedDir)
    val q = Pipeline.stream(spark,
      s"""{"input": "$feedDir", "output": "$sOut", "stages": $stages""".stripMargin + "}",
      ckpt)
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.read.option("basePath", sOut).parquet(sOut)
      .select("doc_id").as[Long].collect().toSet
    assert(streamed == want, "streamed per-row gates must equal the batch gates")
  }

  test("pipeline runner: coverage_filter gates by probe coverage; probe-file stages stream per-row") {
    import org.apache.spark.sql.functions._
    val docs = graft.util.Tables.documents(spark, sfDir)
    val probeDir = tmpDir() + "/probe.parquet"
    docs.filter($"doc_id" % 100 === 0).select("text")
      .write.mode("overwrite").parquet(probeDir)
    val inDir = tmpDir() + "/in.parquet"
    docs.write.mode("overwrite").parquet(inDir)
    val outDir = tmpDir() + "/cov"
    Pipeline.run(spark,
      s"""{"input": "$inDir", "output": "$outDir",
         |"stages": [{"op": "coverage_filter", "probePath": "$probeDir",
         |            "n": 3, "maxCovPpm": 600000}]}""".stripMargin)
    // hand-composed truth via the op on the same sentinel union
    val probe = spark.read.parquet(probeDir)
      .select(lit(-1L).as("doc_id"), col("text"))
    val combined = docs.select("doc_id", "text").withColumn("__p", lit(false))
      .unionByName(probe.withColumn("__p", lit(true)))
    val want = graft.ops.TextAnalysis.ngramCoverage(combined, "text", "doc_id",
        col("__p"), n = 3, flagPpm = 600000L)
      .filter($"flagged" === 0).select("doc_id").as[Long].collect().toSet
    val got = spark.read.parquet(outDir).select("doc_id").as[Long].collect().toSet
    assert(got == want)
    val probeIds = docs.filter($"doc_id" % 100 === 0)
      .select("doc_id").as[Long].collect().toSet
    assert(got.intersect(probeIds).isEmpty,
      "probe-identical docs sit at coverage 10^6 and must drop")
    assert(got.nonEmpty, "clean docs must survive the coverage gate")
    // both probe-file stages are pure per-doc functions (probe grams
    // derive from the FILE, never the batch): streaming accepts them
    // and equals the batch chain
    val feedDir = tmpDir(); val sOut = tmpDir(); val ckpt = tmpDir()
    docs.coalesce(1).write.mode("append").parquet(feedDir)
    val q = Pipeline.stream(spark,
      s"""{"input": "$feedDir", "output": "$sOut",
         |"stages": [
         |  {"op": "coverage_filter", "probePath": "$probeDir", "n": 3, "maxCovPpm": 600000},
         |  {"op": "decontaminate", "probePath": "$probeDir", "minShared": 5}]}"""
        .stripMargin, ckpt)
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.read.option("basePath", sOut).parquet(sOut)
      .select("doc_id").as[Long].collect().toSet
    val deconDropped = graft.ops.TextAnalysis.contamination(combined, "text",
        "doc_id", col("__p"), n = 3, minShared = 5)
      .filter($"contaminated" === 1).select("doc_id").as[Long].collect().toSet
    assert(streamed == (want -- deconDropped),
      "streamed probe-file gates must equal the composed batch chain")
  }

  test("pipeline runner: conformal_filter keeps >= 1-alpha of held-out positives, degenerates loudly") {
    import org.apache.spark.sql.functions._
    val docs = graft.util.Tables.documents(spark, "/root/testdata/sf0.01")
    val inDir = tmpDir() + "/in.parquet"
    docs.write.mode("overwrite").parquet(inDir)
    // labels for a THIRD of the corpus (the small labeled subset a
    // real deployment buys): y = the quality_lr fixture target
    val isPos = expr("doc_id % 3 = 0") && array_contains(
      split(graft.ops.TextAnalysis.normalize(col("text")), " "), "join")
    val labelsDir = tmpDir() + "/labels.parquet"
    docs.filter($"doc_id" % 3 < 2)
      .select($"doc_id", isPos.cast("int").as("y"))
      .write.mode("overwrite").parquet(labelsDir)
    val outDir = tmpDir() + "/conf"
    Pipeline.run(spark,
      s"""{"input": "$inDir", "output": "$outDir",
         |"stages": [{"op": "conformal_filter", "labels": "$labelsDir",
         |            "alphaPpm": 200000, "m": 256}]}""".stripMargin)
    val kept = spark.read.parquet(outDir)
      .select("doc_id").as[Long].collect().toSet
    assert(kept.nonEmpty && kept.size < docs.count(),
      s"the filter must bite: kept ${kept.size}")
    // coverage: labeled positives OUTSIDE training+calibration never
    // existed here (all labeled rows are used), so measure on the
    // calibration-held-out positives — the exchangeable proxy the
    // guarantee is calibrated on; alpha=20% bounds the drop rate
    val calPos = docs.filter($"doc_id" % 3 < 2).filter(isPos)
      .filter(pmod(graft.util.Hashing.portableHash64(
        concat(lit("conf:"), $"doc_id".cast("string"))), lit(5L)) === 0L)
      .select("doc_id").as[Long].collect().toSet
    assert(calPos.nonEmpty, "fixture must have calibration positives")
    val covered = calPos.count(kept.contains).toDouble / calPos.size
    assert(covered >= 0.75,
      s"conformal coverage on calibration positives: $covered")
    // UNLABELED positives (never trained on, never calibrated): the
    // guarantee's real audience — fresh exchangeable positives
    val freshPos = docs.filter($"doc_id" % 3 === 2).filter(
      array_contains(split(graft.ops.TextAnalysis.normalize(col("text")),
        " "), "join")).select("doc_id").as[Long].collect().toSet
    if (freshPos.size >= 10) {
      val freshCov = freshPos.count(kept.contains).toDouble / freshPos.size
      assert(freshCov >= 0.6,
        s"fresh-positive coverage collapsed: $freshCov over ${freshPos.size}")
    }
    // degenerate: a labels file with almost no positives keeps all
    val tinyDir = tmpDir() + "/tiny.parquet"
    docs.limit(8).select($"doc_id", lit(0).cast("int").as("y"))
      .write.mode("overwrite").parquet(tinyDir)
    val outDir2 = tmpDir() + "/conf2"
    Pipeline.run(spark,
      s"""{"input": "$inDir", "output": "$outDir2",
         |"stages": [{"op": "conformal_filter", "labels": "$tinyDir"}]}""".stripMargin)
    assert(spark.read.parquet(outDir2).count() == docs.count(),
      "an under-populated calibration set must keep everything")
  }

  test("conformal coverage watched end-to-end: stage output feeds the rate e-process over a file feed") {
    import org.apache.spark.sql.functions._
    import graft.streaming.EValueStream
    // the pipeline_conformal_corpus deployment readout wired LIVE:
    // the REAL conformal_filter stage filters the corpus, the held-out
    // positive pool's pass/drop bits stream through a parquet file
    // feed, and rateBatch watches the measured coverage at p0 = the
    // pool's own rate — healthy feed never alarms, a broken filter
    // (a third of the passes start getting dropped) alarms
    val docs = graft.util.Tables.documents(spark, "/root/testdata/sf0.01")
    val isPos = expr("doc_id % 3 = 0") && array_contains(
      split(graft.ops.TextAnalysis.normalize(col("text")), " "), "join")
    val labelsDir = tmpDir() + "/labels.parquet"
    docs.filter($"doc_id" % 7 < 3)
      .select($"doc_id", isPos.cast("int").as("y"))
      .write.mode("overwrite").parquet(labelsDir)
    val node = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(s"""{"labels":"$labelsDir","alphaPpm":200000,"m":256}""")
    val kept = Pipeline.applyStage(docs, "conformal_filter", node,
      "text", "doc_id").select("doc_id").as[Long].collect().toSet
    val cal = pmod(graft.util.Hashing.portableHash64(
      concat(lit("conf:"), $"doc_id".cast("string"))), lit(5L)) === 0L
    val pool = docs.filter($"doc_id" % 7 < 3).filter(isPos).filter(!cal)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(pool.size >= 20, s"fixture needs a real eval pool: ${pool.size}")
    val passSet = pool.filter(kept.contains).toSet
    val p0 = passSet.size.toLong * 1000000L / pool.size
    assert(p0 >= 1L && p0 <= 999999L, s"degenerate pool rate $p0")
    // file feed: each batch is 4 full cycles of the pool, so every
    // healthy batch's rate EQUALS the reference — then the broken
    // phase drops every third passing doc
    val feed = tmpDir(); val out = tmpDir(); val st = tmpDir()
    val ckpt = tmpDir()
    def writeBatch(broken: Boolean): Unit =
      (0 until 4).flatMap(_ => pool).map { id =>
        val ok0 = if (passSet.contains(id)) 1 else 0
        val ok = if (broken && ok0 == 1 && id % 3 == 0) 0 else ok0
        ("filterA", ok)
      }.toDF("k", "ok").coalesce(1).write.mode("append").parquet(feed)
    writeBatch(broken = false)
    val q = spark.readStream
      .schema(spark.read.parquet(feed).schema)
      .option("maxFilesPerTrigger", 1).parquet(feed)
      .writeStream.option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("1 second"))
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        EValueStream.rateBatch(spark, b, id, out, st, "k", "ok",
          p0Ppm = p0, alphaPpm = 50000L, minTrials = 100L)
      }.start()
    try {
      (0 until 14).foreach { _ => writeBatch(broken = false); q.processAllAvailable() }
      val healthy = spark.read.option("basePath", out).parquet(out)
        .filter(col("alarm") === 1).count()
      assert(healthy == 0L, s"healthy coverage feed alarmed $healthy times")
      (0 until 25).foreach { _ => writeBatch(broken = true); q.processAllAvailable() }
    } finally q.stop()
    val alarms = spark.read.option("basePath", out).parquet(out)
      .filter(col("alarm") === 1).count()
    assert(alarms >= 1L, "a broken filter's coverage collapse must alarm")
  }

  test("pipeline runner: bpe_tokens annotates real token counts; jsonl input requires a schema") {
    import org.apache.spark.sql.functions._
    val docs = graft.util.Tables.documents(spark, sfDir)
    val inDir = tmpDir() + "/docs.parquet"
    val mergesDir = tmpDir() + "/merges.parquet"
    val outDir = tmpDir() + "/annot"
    docs.write.mode("overwrite").parquet(inDir)
    val trained = graft.ops.Bpe.train(docs, "text", iters = 10)
    trained.write.mode("overwrite").parquet(mergesDir)
    Pipeline.run(spark,
      s"""{"input": "$inDir", "output": "$outDir",
         |"stages": [{"op": "bpe_tokens", "merges": "$mergesDir"}]}""".stripMargin)
    val got = spark.read.parquet(outDir)
      .select("doc_id", "bpe_tokens").as[(Long, Long)].collect().toMap
    val want = docs.select($"doc_id",
        graft.ops.Bpe.tokenCountCol($"text",
          graft.ops.Bpe.collectMerges(trained)).as("t"))
      .as[(Long, Long)].collect().toMap
    assert(got == want && got.nonEmpty)
    assert(got.values.exists(_ > 0))
    // streaming-safe: per-row annotation from a fixed merges file
    val feedDir = tmpDir(); val sOut = tmpDir(); val ckpt = tmpDir()
    docs.coalesce(1).write.mode("append").parquet(feedDir)
    val q = Pipeline.stream(spark,
      s"""{"input": "$feedDir", "output": "$sOut",
         |"stages": [{"op": "bpe_tokens", "merges": "$mergesDir"}]}""".stripMargin,
      ckpt)
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.read.option("basePath", sOut).parquet(sOut)
      .select("doc_id", "bpe_tokens").as[(Long, Long)].collect().toMap
    assert(streamed == want, "streamed annotation must equal the batch run")
    // jsonl ingestion: explicit DDL schema, same curation chain
    val jsonDir = tmpDir() + "/dump"
    docs.select("doc_id", "text", "source").coalesce(1)
      .write.mode("overwrite").json(jsonDir)
    val jOut = tmpDir() + "/fromjson"
    val (jin, _) = Pipeline.run(spark,
      s"""{"input": "$jsonDir", "inputFormat": "jsonl",
         |"schema": "doc_id BIGINT, text STRING, source STRING",
         |"output": "$jOut",
         |"stages": [{"op": "bpe_tokens", "merges": "$mergesDir"}]}""".stripMargin)
    assert(jin == docs.count())
    val gotJ = spark.read.parquet(jOut)
      .select("doc_id", "bpe_tokens").as[(Long, Long)].collect().toMap
    assert(gotJ == want, "jsonl input must feed the identical chain")
    intercept[IllegalArgumentException] {
      Pipeline.run(spark, s"""{"input": "$jsonDir", "inputFormat": "jsonl",
        |"output": "$jOut", "stages": []}""".stripMargin)
    }
    // temperature_mixture stage ≡ hand-composed; corpus-global, so
    // streaming refuses it by name
    val tOut = tmpDir() + "/temp"
    Pipeline.run(spark,
      s"""{"input": "$inDir", "output": "$tOut",
         |"stages": [{"op": "temperature_mixture", "stratum": "source",
         |"temperature": 2.0, "budget": 2000}]}""".stripMargin)
    val wantT = graft.ops.Sampling.temperatureMixture(docs, "source", "doc_id",
        size(split(graft.ops.TextAnalysis.normalize($"text"), " ")), 2.0, 2000L)
      .select("doc_id").as[Long].collect().toSet
    assert(spark.read.parquet(tOut).select("doc_id").as[Long]
      .collect().toSet == wantT && wantT.nonEmpty)
    val eT = intercept[IllegalArgumentException] {
      Pipeline.stream(spark,
        s"""{"input": "${tmpDir()}", "output": "${tmpDir()}",
           |"schemaDdl": "doc_id long, text string, source string",
           |"stages": [{"op": "temperature_mixture", "stratum": "source",
           |"budget": 2000}]}""".stripMargin, tmpDir())
    }
    assert(eT.getMessage.contains("temperature_mixture") &&
      eT.getMessage.contains("corpus-global"))
  }

  test("pipeline runner: wordpiece_tokens annotates from a trained vocab and streams") {
    val docs = graft.util.Tables.documents(spark, sfDir)
    val inDir = tmpDir() + "/docs.parquet"
    val vocabDir = tmpDir() + "/wp_vocab.parquet"
    val outDir = tmpDir() + "/wp_annot"
    docs.write.mode("overwrite").parquet(inDir)
    graft.ops.WordPiece.trainVocab(docs, "text", k = 32, vocabDir)
    Pipeline.run(spark,
      s"""{"input": "$inDir", "output": "$outDir",
         |"stages": [{"op": "wordpiece_tokens", "vocab": "$vocabDir"}]}""".stripMargin)
    val got = spark.read.parquet(outDir)
      .select("doc_id", "wordpiece_tokens").as[(Long, Long)].collect().toMap
    // hand-compose: sum of per-word piece counts under the same vocab
    val words = graft.ops.Bpe.wordFreq(docs, "text")
    val vocab = graft.ops.WordPiece.vocab(words, 32)
    val perWord = graft.ops.WordPiece.encodeWords(words, vocab)
      .select("word", "n_pieces").as[(String, Long)].collect().toMap
    val want = docs.select($"doc_id",
        split(graft.ops.TextAnalysis.normalize($"text"), " ").as("ws"))
      .as[(Long, Seq[String])].collect()
      .map { case (id, ws) =>
        id -> ws.filter(_.nonEmpty).map(perWord).sum
      }.toMap
    assert(got == want && got.values.exists(_ > 0))
    // streaming-safe: fixed vocab file => per-row function
    val feedDir = tmpDir(); val sOut = tmpDir(); val ckpt = tmpDir()
    docs.coalesce(1).write.mode("append").parquet(feedDir)
    val q = Pipeline.stream(spark,
      s"""{"input": "$feedDir", "output": "$sOut",
         |"stages": [{"op": "wordpiece_tokens", "vocab": "$vocabDir"}]}""".stripMargin,
      ckpt)
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.read.option("basePath", sOut).parquet(sOut)
      .select("doc_id", "wordpiece_tokens").as[(Long, Long)].collect().toMap
    assert(streamed == want, "streamed annotation must equal the batch run")
  }

  test("pipeline runner: dedup_winnow stage drops passage-embedding copies; streaming refuses") {
    import org.apache.spark.sql.functions._
    val docs = graft.util.Tables.documents(spark, sfDir)
    // copies EMBED the original text behind a fresh intro — exact/bag
    // hashes differ, but the winnowed passage fingerprints match
    val withCopies = docs.unionByName(docs.filter($"doc_id" % 10 === 0)
      .withColumn("doc_id", $"doc_id" + 5000L)
      .withColumn("text", concat(lit("totally new intro paragraph "), $"text")))
    val inDir = tmpDir() + "/docs.parquet"
    val outDir = tmpDir() + "/wd"
    withCopies.write.mode("overwrite").parquet(inDir)
    Pipeline.run(spark,
      s"""{"input": "$inDir", "output": "$outDir",
         |"stages": [{"op": "dedup_winnow", "minShared": 5, "maxDf": 100}]}""".stripMargin)
    val got = spark.read.parquet(outDir).select("doc_id").as[Long].collect().toSet
    // hand-compose the identical stage
    val pairs = graft.ops.TextAnalysis.winnowPairs(withCopies, "text", "doc_id",
      k = 8, w = 4, minShared = 5, maxDf = 100)
    val losers = graft.ops.Dedup.connectedComponents(pairs.select("id_a", "id_b"))
      .filter($"id" =!= $"cluster").select($"id".as("doc_id"))
    val want = withCopies.join(losers, Seq("doc_id"), "left_anti")
      .select("doc_id").as[Long].collect().toSet
    assert(got == want)
    assert(got.forall(_ < 5000L), "every passage-embedding copy must drop")
    assert(got.nonEmpty)
    // corpus-global: the streaming pipeline refuses, naming the reason
    val e = intercept[IllegalArgumentException] {
      Pipeline.stream(spark,
        s"""{"input": "${tmpDir()}", "output": "${tmpDir()}",
           |"schemaDdl": "doc_id long, text string",
           |"stages": [{"op": "dedup_winnow"}]}""".stripMargin, tmpDir())
    }
    assert(e.getMessage.contains("dedup_winnow") &&
      e.getMessage.contains("corpus-global"))
  }

  test("pipeline runner: ppl_bucket routes terciles, keeps buckets, streaming refuses") {
    import org.apache.spark.sql.functions._
    val docs = graft.util.Tables.documents(spark, sfDir)
    val inDir = tmpDir() + "/docs.parquet"
    docs.write.mode("overwrite").parquet(inDir)

    // annotate-only: every doc survives, buckets partition the corpus
    val outAll = tmpDir() + "/ppl_all"
    Pipeline.run(spark,
      s"""{"input": "$inDir", "output": "$outAll",
         |"stages": [{"op": "ppl_bucket"}]}""".stripMargin)
    val all = spark.read.parquet(outAll)
    assert(all.count() == docs.count())
    val byBucket = all.groupBy("ppl_bucket").count()
      .as[(String, Long)].collect().toMap
    assert(Set("head", "middle", "tail").subsetOf(byBucket.keySet))
    // exact terciles: head holds at least a third of the scored docs
    val scored = byBucket.filterNot(_._1 == "unscored").values.sum
    assert(byBucket("head") >= scored / 3)

    // keep filter: only the named buckets survive
    val outHm = tmpDir() + "/ppl_hm"
    Pipeline.run(spark,
      s"""{"input": "$inDir", "output": "$outHm",
         |"stages": [{"op": "ppl_bucket", "keep": "head,middle"}]}""".stripMargin)
    val kept = spark.read.parquet(outHm)
    assert(kept.select("ppl_bucket").distinct().as[String].collect().toSet
      == Set("head", "middle"))
    assert(kept.count() == byBucket("head") + byBucket("middle"))

    // corpus-global (two passes): the streaming pipeline refuses
    val e = intercept[IllegalArgumentException] {
      Pipeline.stream(spark,
        s"""{"input": "${tmpDir()}", "output": "${tmpDir()}",
           |"schemaDdl": "doc_id long, text string",
           |"stages": [{"op": "ppl_bucket"}]}""".stripMargin, tmpDir())
    }
    assert(e.getMessage.contains("ppl_bucket"))
  }

  test("pipeline runner: config stages equal the hand-composed chain; bad configs fail loudly") {
    import org.apache.spark.sql.functions._
    val docs = graft.util.Tables.documents(spark, sfDir)
    val inDir = tmpDir() + "/docs.parquet"
    val outDir = tmpDir() + "/clean"
    docs.write.mode("overwrite").parquet(inDir)
    val (rin, rout) = Pipeline.run(spark,
      s"""{"input": "$inDir", "output": "$outDir",
         |"stages": [
         |  {"op": "gopher_filter"},
         |  {"op": "dedup_exact"},
         |  {"op": "group_cap", "group": "source", "k": 5},
         |  {"op": "shard", "numShards": 4}]}""".stripMargin)
    assert(rin == docs.count())
    // hand-compose the identical chain
    val g = docs.join(graft.ops.TextAnalysis.gopherFilter(docs, "text", "doc_id")
        .filter($"gopher_mask" === 0L).select("doc_id"), Seq("doc_id"), "left_semi")
    val d = g.join(graft.ops.Dedup.exact(g, "text", "doc_id")
        .select($"keeper_id".as("doc_id")), Seq("doc_id"), "left_semi")
    val c = graft.ops.Sampling.groupCap(d, "source", "doc_id", 5)
    val want = c.select("doc_id").as[Long].collect().toSet
    val out = spark.read.parquet(outDir)
    assert(out.select("doc_id").as[Long].collect().toSet == want)
    assert(rout == want.size.toLong)
    // shard partitioning reached the writer
    assert(new java.io.File(outDir).list().exists(_.startsWith("shard=")))
    assert(out.columns.contains("pos"), "shard addressing columns survive")
    // rewrite + filter + decontaminate stages compose too: span dedup
    // rewrites text in place, lang_filter keeps declared languages,
    // decontaminate drops docs overlapping a probe file
    val probeDir = tmpDir() + "/probe.parquet"
    docs.filter($"doc_id" % 100 === 0).select("text")
      .write.mode("overwrite").parquet(probeDir)
    val out2Dir = tmpDir() + "/clean2"
    val (_, rout2) = Pipeline.run(spark,
      s"""{"input": "$inDir", "output": "$out2Dir",
         |"stages": [
         |  {"op": "dedup_spans", "k": 8},
         |  {"op": "lang_filter", "keep": ["en", "de"]},
         |  {"op": "decontaminate", "probePath": "$probeDir", "minShared": 5},
         |  {"op": "weighted_cap", "group": "source", "k": 8}],
         |"reports": {"profile": true, "driftStratum": "source", "zipf": true,
         |             "freqCols": "lang,source", "freqK": 3}}"""
        .stripMargin)
    val out2 = spark.read.parquet(out2Dir)
    assert(rout2 > 0 && rout2 < docs.count())
    assert(out2.columns.contains("text") && out2.columns.contains("source"))
    assert(out2.groupBy("source").count().filter($"count" > 8).count() == 0,
      "weighted_cap must bound every source at k")
    // health reports land next to the output, computed on the CLEANED corpus
    val prof = spark.read.parquet(s"$out2Dir.reports/profile")
    assert(prof.count() == out2.columns.length,
      "one profile row per output column")
    assert(prof.filter($"col_name" === "doc_id").head().getLong(3) == rout2,
      "profile distinct count describes the cleaned corpus, not the input")
    val drift = spark.read.parquet(s"$out2Dir.reports/drift")
    assert(drift.count() > 0 && drift.columns.contains("kl_micro"))
    val zipf = spark.read.parquet(s"$out2Dir.reports/zipf")
    assert(zipf.count() == 1 && zipf.columns.contains("zipf_slope"))
    val freq = spark.read.parquet(s"$out2Dir.reports/freq")
    assert(freq.select("col_name").distinct().as[String].collect().toSet
      == Set("lang", "source"))
    assert(freq.groupBy("col_name").count().filter($"count" > 3).count() == 0,
      "freq report is capped at freqK per column")
    // every probe doc's exact self-match is gone (self-overlap ≥ 5 trigrams)
    val probeIds = docs.filter($"doc_id" % 100 === 0)
      .select("doc_id").as[Long].collect().toSet
    val kept2 = out2.select("doc_id").as[Long].collect().toSet
    assert(kept2.intersect(probeIds).isEmpty,
      "docs identical to probe rows must be decontaminated away")
    // the training-prep tail — near-dup removal, token-window
    // chunking, budgeted packing — as config stages ≡ hand-composed
    val packDir = tmpDir() + "/packed"
    val (_, routP) = Pipeline.run(spark,
      s"""{"input": "$inDir", "output": "$packDir",
         |"stages": [
         |  {"op": "dedup_minhash", "threshold": 0.7},
         |  {"op": "chunk", "size": 64, "overlap": 16},
         |  {"op": "pack", "budget": 256, "nShards": 4}]}""".stripMargin)
    val nd = graft.ops.Dedup.dedupedCorpus(docs, "text", "doc_id")
    val carryC = nd.columns.filterNot(c => c == "doc_id" || c == "text").toSeq
    val ch = graft.ops.TextAnalysis.chunk(nd, "text", "doc_id", 64, 16, carryC)
      .withColumn("chunk_key", concat($"doc_id".cast("string"), lit("#"),
        $"chunk_id".cast("string")))
      .withColumnRenamed("chunk", "text")
    val carryP = ch.columns.filterNot(c => c == "chunk_key" || c == "n_tokens").toSeq
    val wantPack = graft.ops.Packing.packSequences(
      ch.withColumn("n_tokens", $"n_tokens".cast("long")),
      "chunk_key", "n_tokens", 256L, 4, carryP)
    def rows(d: org.apache.spark.sql.DataFrame): Set[String] =
      d.select(d.columns.sorted.map(c => col(c).cast("string")): _*)
        .collect().map(_.toString).toSet
    val outP = spark.read.parquet(packDir)
    // the sf0.001 corpus is degenerately self-similar, so near-dup
    // removal keeps few docs — assert ≥ 1 chunk per surviving doc,
    // not a fraction of the raw corpus
    assert(routP == outP.count() && routP >= nd.count() && routP > 0)
    assert(rows(outP) == rows(wantPack),
      "config chain must equal the hand-composed dedup_minhash→chunk→pack")
    assert(new java.io.File(packDir).list().exists(_.startsWith("shard=")),
      "pack's shard column must reach the partitioned writer")
    intercept[IllegalArgumentException] {
      Pipeline.run(spark, s"""{"input": "$inDir", "output": "$packDir",
        |"stages": [{"op": "pack"}, {"op": "sample"}]}""".stripMargin)
    }
    // token_budget denominated in REAL BPE tokens: train a merge
    // table, point the stage at it, and the admitted set must equal
    // the hand-composed budget run priced by Bpe.tokenCountCol
    val mergesDir = tmpDir() + "/merges.parquet"
    val trained = graft.ops.Bpe.train(docs, "text", iters = 12)
    trained.write.mode("overwrite").parquet(mergesDir)
    val bpeDir = tmpDir() + "/bpe_budget"
    val (_, routB) = Pipeline.run(spark,
      s"""{"input": "$inDir", "output": "$bpeDir",
         |"stages": [
         |  {"op": "token_budget", "stratum": "source", "budget": 500,
         |   "tokenizer": "bpe", "merges": "$mergesDir"}]}""".stripMargin)
    val wantB = graft.ops.Sampling.tokenBudget(docs, "source", "doc_id",
        graft.ops.Bpe.tokenCountCol($"text",
          graft.ops.Bpe.collectMerges(trained)),
        budgets = Map.empty, defaultBudget = 500L, salt = "graft")
      .select("doc_id").as[Long].collect().toSet
    assert(spark.read.parquet(bpeDir).select("doc_id").as[Long]
      .collect().toSet == wantB)
    assert(routB == wantB.size.toLong && routB > 0)
    // BPE admission differs from whitespace admission on this corpus
    // (merged tokens price docs cheaper) — the knob must matter
    val wsDir = tmpDir() + "/ws_budget"
    val (_, routW) = Pipeline.run(spark,
      s"""{"input": "$inDir", "output": "$wsDir",
         |"stages": [
         |  {"op": "token_budget", "stratum": "source", "budget": 500}]}"""
        .stripMargin)
    assert(routW != routB,
      s"bpe pricing must change admission (ws $routW vs bpe $routB)")
    intercept[IllegalArgumentException] {
      Pipeline.run(spark, s"""{"input": "$inDir", "output": "$bpeDir",
        |"stages": [{"op": "token_budget", "stratum": "source",
        |"budget": 500, "tokenizer": "wordpiece"}]}""".stripMargin)
    }
    intercept[IllegalArgumentException] {
      Pipeline.run(spark, s"""{"input": "$inDir", "output": "$packDir",
        |"stages": [{"op": "chunk"}, {"op": "gopher_filter"}]}""".stripMargin)
    }
    // a custom STRING idCol flows through every id-coupled stage
    // (quality_band's band output, decontaminate's sentinel probe id,
    // weighted_cap's hash key), and an empty doc cannot zero the A-ES
    // weight
    val docsCustom = docs
      .select(concat(lit("d"), $"doc_id").as("id"), $"text", $"lang", $"source")
      .unionByName(Seq(("dEMPTY", "", "xx", "empty-src"))
        .toDF("id", "text", "lang", "source"))
    val inCDir = tmpDir() + "/docs_custom.parquet"
    val outCDir = tmpDir() + "/clean_custom"
    docsCustom.write.mode("overwrite").parquet(inCDir)
    val (rinC, routC) = Pipeline.run(spark,
      s"""{"input": "$inCDir", "output": "$outCDir", "idCol": "id",
         |"stages": [
         |  {"op": "decontaminate", "probePath": "$probeDir", "minShared": 5},
         |  {"op": "weighted_cap", "group": "source", "k": 8},
         |  {"op": "quality_band", "stratum": "lang"}]}""".stripMargin)
    assert(rinC == docsCustom.count() && routC > 0)
    val outC = spark.read.parquet(outCDir)
    assert(outC.schema("id").dataType ==
      org.apache.spark.sql.types.StringType, "custom id keeps its type")
    assert(outC.groupBy("source").count().filter($"count" > 8).count() == 0)
    assert(outC.select("id").as[String].collect().toSet
      .intersect(probeIds.map("d" + _)).isEmpty,
      "decontamination applies under a custom id column too")
    // failure modes: unknown op, shard not last, missing required field
    intercept[IllegalArgumentException] {
      Pipeline.run(spark, s"""{"input": "$inDir", "output": "$outDir",
        |"stages": [{"op": "dedup_exactt"}]}""".stripMargin)
    }
    intercept[IllegalArgumentException] {
      Pipeline.run(spark, s"""{"input": "$inDir", "output": "$outDir",
        |"stages": [{"op": "shard"}, {"op": "dedup_exact"}]}""".stripMargin)
    }
    intercept[IllegalArgumentException] {
      Pipeline.run(spark, s"""{"input": "$inDir", "output": "$outDir",
        |"stages": [{"op": "quality_band"}]}""".stripMargin)
    }
  }

  test("pipeline curriculum stage: banded training order rides along, must be last") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sfDir)
    val inDir = tmpDir() + "/docs_curr.parquet"
    val outDir = tmpDir() + "/curr_out"
    docs.write.mode("overwrite").parquet(inDir)
    val (rin, rout) = Pipeline.run(spark,
      s"""{"input": "$inDir", "output": "$outDir",
         |"stages": [
         |  {"op": "dedup_exact"},
         |  {"op": "curriculum", "salt": "epoch1"}]}""".stripMargin)
    assert(rin == docs.count() && rout > 0)
    val out = spark.read.parquet(outDir)
    // the stage output equals the operator run on the post-dedup corpus
    val direct = graft.ops.Sampling.curriculum(
        out.select("doc_id", "text"), "text", "doc_id", salt = "epoch1")
      .select("doc_id", "band", "pos")
      .as[(Long, Long, Long)].collect().toSet
    assert(out.select("doc_id", "band", "pos")
      .as[(Long, Long, Long)].collect().toSet == direct)
    // positions are dense per band over the FINAL corpus
    out.groupBy("band").agg(count(lit(1)).as("n"), max($"pos").as("mx"))
      .collect().foreach(r =>
        assert(r.getLong(2) == r.getLong(1) - 1, s"band ${r.get(0)} not dense"))
    // curriculum mid-chain is rejected: later filters would punch
    // holes in the training order
    intercept[IllegalArgumentException] {
      Pipeline.run(spark, s"""{"input": "$inDir", "output": "$outDir",
        |"stages": [{"op": "curriculum"}, {"op": "dedup_exact"}]}""".stripMargin)
    }
  }

  test("pipeline split stage: per-row assignment rides along, matches splitAssign, streaming-safe") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sfDir)
    val inDir = tmpDir() + "/docs_split.parquet"
    val outDir = tmpDir() + "/split_out"
    docs.write.mode("overwrite").parquet(inDir)
    val (rin, rout) = Pipeline.run(spark,
      s"""{"input": "$inDir", "output": "$outDir",
         |"stages": [{"op": "split", "valPm": 200, "testPm": 50,
         |            "salt": "v1"}]}""".stripMargin)
    assert(rin == docs.count() && rout == rin, "split annotates, never filters")
    val out = spark.read.parquet(outDir)
    val direct = docs.select($"doc_id",
        graft.ops.Sampling.splitAssign($"doc_id", 200L, 50L, "v1").as("split"))
      .as[(Long, String)].collect().toSet
    assert(out.select("doc_id", "split").as[(Long, String)].collect().toSet
      == direct)
    assert(out.select("split").distinct().count() == 3)
    // per-row purity => the stage is accepted in streaming configs
    assert(Pipeline.streamableOp("split"),
      "split must be streamable: a doc's split never depends on the batch")
  }

  test("pipeline unigram_tokens stage: real Viterbi token counts ride along") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sfDir).limit(100)
    val inDir = tmpDir() + "/docs_ut.parquet"
    val vocabDir = tmpDir() + "/uvocab.parquet"
    val outDir = tmpDir() + "/ut_out"
    docs.write.mode("overwrite").parquet(inDir)
    graft.ops.Unigram.train(docs, "text", maxPieceLen = 6,
      vocabSize = 128, iters = 1).write.mode("overwrite").parquet(vocabDir)
    val (rin, rout) = Pipeline.run(spark,
      s"""{"input": "$inDir", "output": "$outDir",
         |"stages": [{"op": "unigram_tokens", "vocab": "$vocabDir"}]}""".stripMargin)
    assert(rin == 100 && rout == 100, "annotation never filters")
    val out = spark.read.parquet(outDir)
    val direct = graft.ops.Unigram.annotateTokens(
        docs.select("doc_id", "text"), "text", "unigram_tokens", vocabDir)
      .select("doc_id", "unigram_tokens")
      .as[(Long, Long)].collect().toMap
    val got = out.select("doc_id", "unigram_tokens")
      .as[(Long, Long)].collect().toMap
    assert(got == direct)
    // pieces beat characters: the learned vocab compresses real text
    val chars = docs.select(sum(length(regexp_replace($"text", " ", ""))))
      .as[Long].head()
    assert(got.values.sum < chars, "token count must undercut char count")
    assert(got.values.forall(_ > 0))
    assert(Pipeline.streamableOp("unigram_tokens"))
  }

  test("pipeline reorder: selective-cheap filters move first, results identical, fences hold") {
    import org.apache.spark.sql.functions._
    val docs = graft.util.Tables.documents(spark, sfDir)
    val inDir = tmpDir() + "/docs.parquet"
    docs.write.mode("overwrite").parquet(inDir)
    def opsOf(json: String): Seq[String] = {
      val st = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(json).get("stages")
      (0 until st.size()).map(st.get(_).get("op").asText())
    }
    // a 1%-keep sample (cost 1, drops ~99%) listed AFTER the gopher
    // battery (cost 5, drops less): the reorderer must flip them
    val cfg1 =
      s"""{"input": "$inDir", "output": "ignored",
         |"stages": [{"op": "gopher_filter"},
         |           {"op": "sample", "rate": 0.01, "salt": "e0"}]}""".stripMargin
    // probe the whole corpus so tiny-sample selectivities are exact
    val re1 = Pipeline.reorder(spark, cfg1, sampleRatePpm = 1000000L)
    assert(opsOf(re1) == Seq("sample", "gopher_filter"),
      s"the 99%-drop cost-1 sample must run first: ${opsOf(re1)}")
    // result equality: the reordered plan admits the same rows
    val a = Pipeline.assemble(spark, cfg1).select("doc_id").as[Long].collect().toSet
    val b = Pipeline.assemble(spark, re1).select("doc_id").as[Long].collect().toSet
    assert(a == b, "reorder changed the surviving set")
    // stage params ride with their stage (the sample keeps its rate/salt)
    assert(re1.contains("\"rate\":0.01") && re1.contains("e0"), re1)
    // fences: a rewrite (scrub) between two filter runs is never
    // crossed — each run permutes only within itself
    val cfg2 =
      s"""{"input": "$inDir", "output": "ignored",
         |"stages": [{"op": "gopher_filter"},
         |           {"op": "sample", "rate": 0.01, "salt": "e0"},
         |           {"op": "scrub"},
         |           {"op": "entropy_filter"}]}""".stripMargin
    val re2 = Pipeline.reorder(spark, cfg2, sampleRatePpm = 1000000L)
    assert(opsOf(re2) == Seq("sample", "gopher_filter", "scrub", "entropy_filter"),
      s"fence crossed: ${opsOf(re2)}")
    val a2 = Pipeline.assemble(spark, cfg2).select("doc_id").as[Long].collect().toSet
    val b2 = Pipeline.assemble(spark, re2).select("doc_id").as[Long].collect().toSet
    assert(a2 == b2)
    // determinism: same config + data -> same order, twice
    assert(Pipeline.reorder(spark, cfg2, 1000000L) == re2)
    // single-filter runs and empty samples keep the original order
    val cfg3 =
      s"""{"input": "$inDir", "output": "ignored",
         |"stages": [{"op": "gopher_filter"}, {"op": "scrub"}]}""".stripMargin
    assert(opsOf(Pipeline.reorder(spark, cfg3)) == Seq("gopher_filter", "scrub"))
  }

  test("pipeline reorder: measured cost demotes an expensive filter at equal drop rate; static table is the fallback") {
    import org.apache.spark.sql.functions._
    val docs = graft.util.Tables.documents(spark, sfDir)
    val inDir = tmpDir() + "/docs-cost.parquet"
    docs.write.mode("overwrite").parquet(inDir)
    def tagsOf(json: String): Seq[String] = {
      val st = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(json).get("stages")
      (0 until st.size()).map(st.get(_).get("tag").asText())
    }
    // two IDENTICAL hash samples (same rate, same salt — the exact
    // same predicate, so drop rates tie exactly; the 'tag' field is
    // inert and only labels the nodes): identical static cost too, so
    // only measured cost can separate them
    val cfg =
      s"""{"input": "$inDir", "output": "ignored",
         |"stages": [{"op": "sample", "rate": 0.5, "salt": "s", "tag": "slow"},
         |           {"op": "sample", "rate": 0.5, "salt": "s", "tag": "fast"}]}""".stripMargin
    // probes run in original config order, so a stateful fake clock
    // can make the FIRST-listed filter deliberately 16x expensive:
    // equal drop / 16x cost must demote it behind the cheap twin,
    // overriding both the static tie (1 == 1) and the original order
    def clockProbe(slowFirst: Boolean): (String, () => Long) => (Long, Long) = {
      var call = 0
      (op, count) => {
        // the per-run scan-floor baseline probe reports zero cost here
        // so the filter timings below are used as-is after subtraction
        if (op == "__baseline") (count(), 0L)
        else {
          call += 1
          val ns = if ((call == 1) == slowFirst) 16000000L else 1000000L
          (count(), ns)
        }
      }
    }
    val re = Pipeline.reorder(spark, cfg, sampleRatePpm = 1000000L,
      probe = clockProbe(slowFirst = true))
    assert(tagsOf(re) == Seq("fast", "slow"),
      s"equal-drop 16x-cost filter must be demoted: ${tagsOf(re)}")
    // same stages, cheap one first: measurement agrees with the
    // listing and nothing moves
    assert(tagsOf(Pipeline.reorder(spark, cfg, 1000000L,
      clockProbe(slowFirst = false))) == Seq("slow", "fast"))
    // scan-dominated probes: raw times 101 vs 116 ms differ by only
    // 15% — the same power-of-2 bucket, so pre-subtraction the costs
    // compressed and the static tie kept original order. Subtracting
    // the 100 ms baseline isolates 1 vs 16 ms of filter work: the 16x
    // bucket demotes the expensive twin.
    def floorClock(slowFirst: Boolean): (String, () => Long) => (Long, Long) = {
      var call = 0
      (op, count) => {
        if (op == "__baseline") (count(), 100000000L)
        else {
          call += 1
          val ns = if ((call == 1) == slowFirst) 116000000L else 101000000L
          (count(), ns)
        }
      }
    }
    assert(tagsOf(Pipeline.reorder(spark, cfg, 1000000L,
      floorClock(slowFirst = true))) == Seq("fast", "slow"),
      "baseline subtraction must un-compress scan-dominated costs")
    // sub-floor timings are jitter, not evidence: fall back to the
    // static table, whose exact tie keeps the original order
    val subFloor: (String, () => Long) => (Long, Long) =
      (_, count) => (count(), 100L)
    assert(tagsOf(Pipeline.reorder(spark, cfg, 1000000L, subFloor))
      == Seq("slow", "fast"))
    // real timing end-to-end on strongly separated selectivities
    // (99% vs 10% drop: a >=8x score gap that no plausible timing
    // bucket can flip): the selective filter moves first and a
    // re-reorder of the reordered config is byte-identical
    val cfgReal =
      s"""{"input": "$inDir", "output": "ignored",
         |"stages": [{"op": "sample", "rate": 0.9, "salt": "m", "tag": "mild"},
         |           {"op": "sample", "rate": 0.01, "salt": "x", "tag": "sharp"}]}""".stripMargin
    val reReal = Pipeline.reorder(spark, cfgReal, sampleRatePpm = 1000000L)
    assert(tagsOf(reReal) == Seq("sharp", "mild"), tagsOf(reReal).toString)
    assert(Pipeline.reorder(spark, reReal, 1000000L) == reReal,
      "re-reorder of a reordered config must be byte-identical")
  }

  test("pipeline runner: embed stage annotates Arrow-stub vectors, carries columns, streams") {
    import org.apache.spark.sql.functions._
    val docs = graft.util.Tables.documents(spark, sfDir)
    val inDir = tmpDir() + "/docs.parquet"
    val outDir = tmpDir() + "/emb"
    docs.write.mode("overwrite").parquet(inDir)
    Pipeline.run(spark,
      s"""{"input": "$inDir", "output": "$outDir",
         |"stages": [{"op": "group_cap", "group": "source", "k": 3},
         |           {"op": "embed", "dim": 4, "maxBatchRows": 64}]}""".stripMargin)
    val got = spark.read.parquet(outDir)
    // carry columns survive the id rejoin; the vector is dim-configured
    assert(Set("doc_id", "text", "lang", "source", "n_chars", "embedding")
      .subsetOf(got.columns.toSet), got.columns.mkString(","))
    val vecs = got.select("doc_id", "embedding")
      .as[(Long, Array[Float])].collect().toMap
    // equals the hand chain: groupCap then the seam op directly
    val capped = graft.ops.Sampling.groupCap(docs, "source", "doc_id", 3)
    val want = graft.ops.ArrowEmbed.embedStage(capped, "text", "doc_id",
        new graft.ops.ArrowEmbed.HashStubEmbedder(4), maxBatchRows = 64)
      .as[(Long, Array[Float])].collect().toMap
    assert(vecs.size == want.size && vecs.keySet == want.keySet)
    vecs.foreach { case (id, v) => assert(v.toSeq == want(id).toSeq, s"doc $id") }
    // per-row pure: the streaming pipeline accepts the stage and
    // rewrites identical vectors
    val feedDir = tmpDir(); val sOut = tmpDir(); val ckpt = tmpDir()
    docs.limit(50).coalesce(1).write.mode("append").parquet(feedDir)
    val q = Pipeline.stream(spark,
      s"""{"input": "$feedDir", "output": "$sOut",
         |"stages": [{"op": "embed", "dim": 4}]}""".stripMargin, ckpt)
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.read.option("basePath", sOut).parquet(sOut)
      .select("doc_id", "embedding").as[(Long, Array[Float])].collect().toMap
    val full = graft.ops.ArrowEmbed.embedStage(docs.limit(50), "text",
        "doc_id", new graft.ops.ArrowEmbed.HashStubEmbedder(4))
      .as[(Long, Array[Float])].collect().toMap
    assert(streamed.size == 50)
    streamed.foreach { case (id, v) =>
      assert(v.toSeq == full(id).toSeq, s"streamed doc $id") }
  }

  test("pipeline runner: c4_filter + ocr_filter stages equal the hand chain; jsonl output round-trips") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    // the C4-gate corpus with OCR damage on every 7th doc, as input
    val corpus = graft.queries.PipelineQueries
      .c4CorpusOf(graft.util.Tables.documents(spark, sfDir),
        keep = Seq("lang"))
      .select(col("doc_id"), col("lang"),
        when(col("doc_id") % 7 === 0, translate(col("text"), "oe", "03"))
          .otherwise(col("text")).as("text"))
    val inDir = tmpDir() + "/c4in.parquet"
    val outDir = tmpDir() + "/c4out"
    corpus.write.mode("overwrite").parquet(inDir)
    Pipeline.run(spark,
      s"""{"input": "$inDir", "output": "$outDir", "outputFormat": "jsonl",
         |"stages": [{"op": "c4_filter"}, {"op": "ocr_filter"}]}""".stripMargin)
    val want = graft.ops.TextAnalysis.ocrFilter(
        graft.ops.TextAnalysis.c4Clean(corpus, "text", "doc_id", 5, 3),
        "text", 100000L)
      .select(col("doc_id"), md5(col("text")).as("h"))
      .as[(Long, String)].collect().toSet
    assert(want.nonEmpty, "the chain must keep some pages")
    // read back through the JSONL boundary: the sink escaped every
    // synthesized newline, the reader restores them bit-for-bit
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("lang", StringType), StructField("text", StringType)))
    val got = graft.sources.Jsonl.read(spark, s"$outDir/*.jsonl.gz", schema)
      .select(col("doc_id"), md5(col("text")).as("h"))
      .as[(Long, String)].collect().toSet
    assert(got === want, "config chain through jsonl == hand-composed chain")
    // every 7th doc was damaged and must be gone
    assert(got.forall(_._1 % 7 != 0), "ocr_filter must drop the damaged docs")
    // both stages are per-row: streaming accepts them
    assert(Pipeline.streamableOp("c4_filter"))
    assert(Pipeline.streamableOp("ocr_filter"))
  }
}
