package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
object Bench {
  def main(args: Array[String]): Unit = {
    // Tee stderr FIRST — before SparkSession creation — so log4j's
    // console appender resolves to the tee and every logged stack
    // (absorbed task failures, writer retries, streaming aborts) is
    // captured for the file twin's `stderr_tail`, untruncated by the
    // driver's 2000-char stdout window.
    val errTail = new TailStream(System.err, 8000)
    System.setErr(new java.io.PrintStream(errTail, true, "UTF-8"))
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Optional args = subset of query names (local iteration); the
    // driver passes none and gets the full suite.
    val selected =
      if (args.isEmpty) SparkEntry.queries
      else SparkEntry.queries.view.filterKeys(args.toSet).toMap
    // Untimed JIT/codegen warmup so the first measured query doesn't
    // absorb JVM ramp-up; exercises the hash/codegen path, the parquet
    // reader, and the broadcast+shuffle machinery. Then run in name
    // order (deterministic).
    import org.apache.spark.sql.functions.{md5 => smd5, col => scol, broadcast => sbc}
    // warmup must never kill the run — a missing table would otherwise
    // crash before the contract JSON line is emitted
    errTail.mark("[bench] begin _warmup")
    try {
      spark.range(1000000).select(smd5(scol("id").cast("string")).as("h"))
        .filter(scol("h") > "a").count()
      val warm = spark.read.parquet(s"$sfDir/region.parquet")
      warm.crossJoin(sbc(warm.limit(1).select(scol(warm.columns.head).as("__w"))))
        .groupBy(warm.columns.head).count().count()
      // The dominant pipeline (token explode → band join → verify) is
      // the one that swung 6× when the bench ran right after the test
      // suite: its first execution pays page-cache faults on
      // documents.parquet plus JIT of the explode/agg/join paths. Run
      // it once untimed so the measured run reflects plan cost.
      if (selected.contains("dedup_minhash_lsh"))
        graft.queries.PipelineQueries.dedupMinhashQ(spark, sfDir).count()
    } catch { case e: Throwable =>
      System.err.println(s"[bench] warmup failed: ${e.getMessage}")
    } finally errTail.endMark("[bench] end _warmup")
    // Reset between trials: drop whatever cached blocks a previous
    // trial left behind (warmup residue, any operator persists) and
    // collect garbage OUTSIDE the timed region — a later query must
    // not pay an earlier query's memory pressure as GC pauses inside
    // its measurement.
    def reset(): Unit = { spark.catalog.clearCache(); System.gc() }
    reset() // drop warmup garbage outside the timed region
    // Failure ledger (BenchReport.scala): `timed`'s catch records the
    // driver-side exception; the listener records EVERY failed task
    // reason tagged by class (not just ExceptionFailure — the r13
    // orphan stack proved stage-retried FetchFailed/TaskKilled/
    // executor-lost failures escape that filter) plus JobFailed ends.
    // Attribution is by job group set in `timed` — the listener bus is
    // asynchronous, so a mutable current-query global can misfile an
    // event that arrives after the main thread moved on.
    val be = new BenchErrors
    val errors = be.errors
    def recordError(name: String, e: Throwable): Unit =
      be.recordError(name, e)
    spark.sparkContext.addSparkListener(be.listener)
    def timed(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      be.currentQuery = name
      // lazy phase markers: anything logged to stderr during this query
      // — including ANALYSIS-time stacks, which have no job and so no
      // job-group attribution — lands between named begin/end lines in
      // the file twin's stderr_tail; a silent query emits neither
      errTail.mark(s"[bench] begin $name")
      spark.sparkContext.setJobGroup(name, name, interruptOnCancel = false)
      val t0 = System.nanoTime()
      // a failed query reports -1, not a misleading elapsed time
      val ok = try { fn(spark, sfDir).count(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          recordError(name, e); false }
      val dt = if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
      spark.sparkContext.clearJobGroup()
      errTail.endMark(s"[bench] end $name")
      be.currentQuery = "_between"
      dt
    }
    // Contention self-diagnosis: a fixed CPU-bound anchor (range →
    // xxhash64 → sum, no I/O, no shuffle — the same machine resources a
    // co-resident process steals) measured at start, middle (between the
    // two passes) and end. Idle, the three agree within a few percent;
    // on a contended machine the drift labels the run so a 3–6× LSH
    // reading stops needing a judge idle re-measure to adjudicate
    // (r10/r12: three rounds of phantom regressions, all environmental).
    import org.apache.spark.sql.functions.{xxhash64, sum => ssum}
    def anchorOnce(): Double = {
      reset()
      spark.sparkContext.setJobGroup("_anchor", "_anchor",
        interruptOnCancel = false)
      val t0 = System.nanoTime()
      // % 1M before summing: ANSI mode makes a raw Σ xxhash64 overflow.
      // ~0.7 s idle: long enough that scheduler jitter stays under a few
      // percent and real contention reads as a multiple, short enough
      // that the six measured runs cost ~4 s of a ~200 s bench.
      // A broken anchor must never kill the bench before the contract
      // line is emitted: publish -1 and keep going.
      try {
        spark.range(0, 2400000000L, 1, 32)
          .select(ssum(xxhash64(scol("id")) % 1000000L).as("s")).head()
        (System.nanoTime() - t0) / 1e9
      } catch { case e: Throwable => recordError("_anchor", e); -1.0 }
      finally spark.sparkContext.clearJobGroup()
    }
    // min-of-2 per point: a one-off GC pause or scheduler stall must not
    // read as machine-wide contention — sustained contention hits both.
    // One failed run of the pair falls back to the good one.
    def anchor(): Double = {
      val (a, b) = (anchorOnce(), anchorOnce())
      if (a < 0) b else if (b < 0) a else math.min(a, b)
    }
    anchorOnce(); anchorOnce() // untimed: JIT tiering needs >1 execution
    val anchorStart = anchor()
    val firstPass = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      reset()
      (name, fn, timed(name, fn))
    }
    val anchorMid = anchor()
    // Contention guard: anything slow enough to be noise-dominated
    // (GC pauses, page-cache faults from a co-resident process) gets a
    // second run from a reset state; keep the best, REPORT the spread.
    // min-of-2 measures plan cost, which is what the per-round numbers
    // are compared on — a one-off stall in run 1 shouldn't read as a
    // plan regression — and the published (min, max) makes the noise
    // visible instead of silently folded away.
    val results = firstPass.map { case (name, fn, t1) =>
      if (t1 > 1.5) {
        reset()
        val t2 = timed(name, fn)
        // a FAILED retry publishes as [t1, -1]: the -1 marks the crash
        // instead of faking a perfectly-stable [t1, t1] spread
        if (t2 >= 0) (name, math.min(t1, t2), Some(math.max(t1, t2)))
        else (name, t1, Some(-1.0))
      } else (name, t1, None)
    }
    val anchorEnd = anchor()
    val anchors = Seq(anchorStart, anchorMid, anchorEnd)
    // drift = max/min of the three anchor readings; > ~1.3 on a ~1-s
    // CPU anchor means the machine was NOT idle for part of the run.
    // A failed anchor (-1 reading) publishes drift -1: unknown, not 1.0.
    val anchorDrift =
      if (anchors.exists(_ < 0)) -1.0
      else anchors.max / math.max(anchors.min, 1e-9)
    // The driver keeps only the LAST 2000 chars of stdout: the whole
    // JSON line must fit in that window (after sbt's trailing
    // [success] line) or the head of the line is cut off and it can
    // never parse. ms precision and spread-only-when-spread keep ~50
    // queries around 1.5 kB.
    // Locale.ROOT: an f-interpolator uses the JVM default locale, and a
    // comma-decimal locale (de_DE, fr_FR) would emit invalid JSON
    def fmt(v: Double, prec: Int): String =
      if (v < 0) "-1" else {
        val s = String.format(java.util.Locale.ROOT, s"%.${prec}f", Double.box(v))
        // trailing-zero trim ("0.40"→"0.4", "1.00"→"1"): still valid
        // JSON, and at 81 queries the saved chars are the difference
        // between full per-query coverage and a slowest-N fallback
        if (s.contains('.')) s.reverse.dropWhile(_ == '0').dropWhile(_ == '.').reverse else s
      }
    val total = results.map(_._2).filter(_ >= 0).sum
    // spread entries widest-first, so truncation keeps the informative ones
    val spreads = results.collect {
      case (k, v, Some(mx)) if mx < 0 || mx > v * 1.2 => (k, v, mx)
    }.sortBy { case (_, v, mx) => if (mx < 0) Double.MaxValue else -(mx / math.max(v, 1e-9)) }
    def line(prec: Int, nSpread: Int, topQ: Int, minT: Double = 0.0,
             allErrors: Boolean = false,
             stderrTail: Option[String] = None): String = {
      // two degrade axes before slowest-N: minT drops entries under a
      // floor (a sub-50ms query cannot regress measurably while
      // STAYING sub-50ms — the moment it regresses it reappears), topQ
      // keeps only the slowest topQ. Failures (-1) always publish.
      // The omitted count is explicit — a dropped entry must read as
      // "dropped", never as "covered".
      val floored = results.filter { case (_, v, _) => v < 0 || v >= minT }
      val qsel = if (topQ >= floored.size) floored
                 else floored.sortBy(-_._2).take(topQ)
      val omitted = results.size - qsel.size
      val qs = qsel.map { case (k, v, _) => "\"" + k + "\":" + fmt(v, prec) }
        .mkString("{", ",", "}")
      val sp = spreads.take(nSpread).map { case (k, v, mx) =>
        "\"" + k + "\":[" + fmt(v, prec) + "," + fmt(mx, prec) + "]"
      }.mkString("{", ",", "}")
      val om = if (omitted > 0) s""","omitted_fast":$omitted""" else ""
      // anchors always publish — they are the contention self-label the
      // r10/r12 phantom-regression adjudications asked for; errors are
      // capped in the stdout line (full in the file twin) but a nonempty
      // map never drops entirely: a -1 without its why is unadjudicable
      def jesc(s: String): String = s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => " "
        case c => c.toString
      }
      val anc = s""","anchor_sec":[${anchors.map(fmt(_, 2)).mkString(",")}],"anchor_drift":${fmt(anchorDrift, 2)}"""
      val errCap = if (allErrors) Int.MaxValue else 4
      val msgCap = if (allErrors) 400 else 110
      val er = if (errors.isEmpty) "" else {
        val shown = errors.take(errCap).map { case (k, v) =>
          "\"" + jesc(k) + "\":\"" + jesc(v.take(msgCap)) + "\""
        }.mkString(",")
        val more = if (errors.size > errCap)
          s""","_omitted_errors":${errors.size - errCap}""" else ""
        s""","errors":{$shown$more}"""
      }
      // file twin only (never the stdout line): the untruncated stderr
      // tail, so ANY printed stack — even one from a retried-and-
      // absorbed failure the errors map can only tag by reason class —
      // is attributable from the artifact alone.
      val st = stderrTail.filter(_.nonEmpty)
        .map(t => s""","stderr_tail":"${jesc(t)}"""").getOrElse("")
      s"""{"metric":"total","value":${fmt(total, prec)},"unit":"sec","queries":$qs,"spread_min_max":$sp$om$anc$er$st,"sf":"$sfDir"}"""
    }
    // The query count grows every round; degrade verbosity (fewer
    // spread entries, coarser precision, then slowest-N-only per-query
    // coverage) until the line fits the budget instead of silently
    // outgrowing the tail window again.
    // Since run/outputStrategy := StdoutOutput the JSON line is the
    // LAST stdout content (verified: nothing follows it but \n), so
    // all but 20 of the driver's 2000 tail chars are usable.
    val MAX = 1980
    val all = results.size
    // full coverage at 1-decimal beats slowest-N at 2: the per-round
    // regression read sums per-query times with a 0.5 s noise floor,
    // so ±0.05 rounding is harmless but a missing query is a hole
    // every rung down to the last keeps the top-3 spreads: the driver
    // tail is what regression tooling reads, and a contention-swung
    // query with an empty spread_min_max reads as stable when it isn't
    // (~90 chars for 3 entries — cheaper than 3 queries' worth of
    // coverage, and the widest spreads are exactly the watch items)
    val out = Iterator((3, spreads.size, all, 0.0), (3, 6, all, 0.0),
        (3, 3, all, 0.0), (2, 3, all, 0.0), (1, 3, all, 0.0),
        // everything ≥ 50 ms + explicit omitted count beats slowest-N:
        // regression-readable coverage of every query that CAN regress
        (2, 3, all, 0.05), (1, 3, all, 0.05), (1, 3, all, 0.1),
        (2, 3, 60, 0.0), (2, 3, 40, 0.0), (2, 3, 25, 0.0),
        (1, 0, all, 0.1), (2, 0, 25, 0.0))
      .map { case (p, n, t, m) => line(p, n, t, m) }
      .find(_.length <= MAX)
      .getOrElse(line(2, 0, 25))
    // The stdout line degrades under the driver's 2000-char tail window
    // (floors, fewer spreads), so a sub-50 ms query could regress to
    // 49 ms invisibly. The file twin never degrades: full per-query ms
    // precision + every spread, written beside the repo so a round
    // close can diff/commit it. Best-effort — a read-only cwd must not
    // fail the bench contract line.
    try Files.writeString(Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_BENCH_FULL", "BENCH_FULL.json")),
      line(3, spreads.size, all, 0.0, allErrors = true,
        stderrTail = Some(errTail.tail)) + "\n")
    catch { case e: Throwable =>
      System.err.println(s"[bench] full dump failed: ${e.getMessage}") }
    println(out)
    spark.stop()
  }
}
