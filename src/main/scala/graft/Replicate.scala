package graft

import java.util.concurrent.atomic.AtomicBoolean
import org.apache.spark.sql.SparkSession
import graft.cdc._

/** Replication CLI — the runnable the reference ships as its binary
  * (reference: main.go:20-82): load a JSON config, build the job, run
  * one cycle or poll continuously (`-c`), and shut down cleanly on
  * SIGINT/SIGTERM (a shutdown hook flips the stop flag; the poll wait
  * is interruptible, so the current cycle finishes and the loop exits
  * instead of dying mid-write).
  *
  *   runMain graft.Replicate -cfg sslr.json [-c]
  *
  * Source/target strings: a `jdbc:` URL builds a [[JdbcStore]]
  * (checkpointDir required); `<format>:<dir>` (csv/json/orc/avro)
  * builds a [[FormatStore]]; anything else is a parquet directory —
  * bucketed ([[BucketedParquetStore]]) when `targetBuckets` > 0.
  */
object Replicate {

  def makeStore(spark: SparkSession, uri: String, cfg: GraftConfig,
                buckets: Int = 0): TableStore = {
    val formats = Set("csv", "json", "orc", "avro")
    val prefix = uri.takeWhile(_ != ':')
    if (uri.startsWith("jdbc:")) {
      if (cfg.checkpointDir.isEmpty)
        throw new IllegalArgumentException("jdbc stores need 'checkpointDir' in the config")
      // Postgres URLs get the dialect-aware store (quoting, xmin pull);
      // everything else speaks generic JDBC
      if (uri.startsWith("jdbc:postgresql:"))
        new PgStore(spark, uri, Map.empty, cfg.checkpointDir)
      else new JdbcStore(spark, uri, Map.empty, cfg.checkpointDir)
    } else if (formats.contains(prefix)) {
      val dir = uri.drop(prefix.length + 1)
      // text formats carry weak types; header+inferSchema makes the
      // common csv replication case work out of the box
      new FormatStore(spark, dir, prefix,
        readOptions = Map("header" -> "true", "inferSchema" -> "true"),
        writeOptions = Map("header" -> "true"))
    } else if (buckets > 0) new BucketedParquetStore(spark, uri, buckets)
    else new ParquetStore(spark, uri)
  }

  /** The reference's utilization-budget throttle
    * (throttle_enabled.go:36-50): keep sync busy-time at `level` of
    * wall time by sleeping 2× the excess. Pure — the loop wires it,
    * the spec checks the formula against the reference's arithmetic.
    */
  def throttleWaitMs(busyMs: Long, totalMs: Long, percentage: Double): Long = {
    val level = math.max(1.0, math.min(percentage, 100.0)) / 100.0
    if (level >= 1.0) 0L
    else {
      val limit = totalMs * level
      if (busyMs > limit) (2.0 * (busyMs - limit)).toLong else 0L
    }
  }

  /** Run cycles until `stop` fires, `maxCycles` is reached, or (non
    * continuous) one cycle completes. Returns cycles run.
    */
  def run(spark: SparkSession, cfg: GraftConfig, continuous: Boolean,
          maxCycles: Int = Int.MaxValue,
          stop: () => Boolean = () => false): Int = {
    val source = makeStore(spark, cfg.source, cfg)
    val sink = makeStore(spark, cfg.target, cfg, cfg.targetBuckets)
    val rep = new Replicator(spark, cfg.replication, source, sink)
    var n = 0
    var go = true
    val t0 = System.nanoTime()
    var busyMs = 0L
    while (go && n < maxCycles && !stop()) {
      val c0 = System.nanoTime()
      rep.run()
      busyMs += (System.nanoTime() - c0) / 1000000L
      n += 1
      if (!continuous) go = false
      else if (n < maxCycles) {
        // throttle (utilization budget) + poll pause, both
        // interruptible (reference: select on timer vs ctx.Done)
        val throttleMs = throttleWaitMs(busyMs,
          (System.nanoTime() - t0) / 1000000L, cfg.throttlePercentage)
        val deadline = System.nanoTime() +
          (cfg.waitBetweenJobsMs + throttleMs) * 1000000L
        while (!stop() && System.nanoTime() < deadline) Thread.sleep(50L)
      }
    }
    n
  }

  /** Offline store maintenance (the `-compact` mode): file-level
    * small-file folding over every bucketed table under `storeDir` —
    * a table is any child directory holding `graft_bucket=` partition
    * dirs (or `storeDir` itself if it is one). Returns per-table
    * (table, bucket, files_before, files_after, groups) rows.
    * Single-writer offline contract — run it in the slot the
    * replication cycle isn't using (crash windows heal on the next
    * invocation, see [[graft.cdc.Compaction.compactStore]]).
    */
  def maintain(spark: org.apache.spark.sql.SparkSession, storeDir: String,
               targetBytes: Long, smallBytes: Long)
      : Seq[(String, Int, Int, Int, Int)] = {
    import org.apache.hadoop.fs.Path
    val f = graft.util.Fs.fs(spark, storeDir)
    val root = new Path(storeDir)
    def isBucketed(p: Path): Boolean =
      f.exists(p) && f.getFileStatus(p).isDirectory &&
        f.listStatus(p).exists(_.getPath.getName
          .startsWith(s"${graft.cdc.BucketedLayout.GB}="))
    val tables =
      if (isBucketed(root)) Seq(root)
      else if (f.exists(root))
        f.listStatus(root).map(_.getPath).filter(isBucketed).toSeq
      else Seq.empty
    tables.flatMap { t =>
      graft.cdc.Compaction.compactStore(spark, t.toString,
          targetBytes, smallBytes)
        .map { case (k, before, after, grps) =>
          (t.getName, k, before, after, grps) }
    }
  }

  def main(args: Array[String]): Unit = {
    var cfgPath = "sslr.json"
    var continuous = false
    var compactDir: String = null
    var targetBytes = 128L << 20
    var smallBytes = 16L << 20
    var gcDir: String = null
    var keepDailyDays = 7
    var keepWeeklyWeeks = 4
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "-cfg" if i + 1 < args.length => cfgPath = args(i + 1); i += 2
        case "-c" => continuous = true; i += 1
        case "-compact" if i + 1 < args.length =>
          compactDir = args(i + 1); i += 2
        case "-targetBytes" if i + 1 < args.length =>
          targetBytes = args(i + 1).toLong; i += 2
        case "-smallBytes" if i + 1 < args.length =>
          smallBytes = args(i + 1).toLong; i += 2
        case "-gc" if i + 1 < args.length =>
          gcDir = args(i + 1); i += 2
        case "-keepDailyDays" if i + 1 < args.length =>
          keepDailyDays = args(i + 1).toInt; i += 2
        case "-keepWeeklyWeeks" if i + 1 < args.length =>
          keepWeeklyWeeks = args(i + 1).toInt; i += 2
        case other =>
          System.err.println("usage: graft.Replicate [-cfg <file>] [-c] " +
            "| -compact <storeDir> [-targetBytes n] [-smallBytes n] " +
            s"| -gc <snapshotDir> [-keepDailyDays n] [-keepWeeklyWeeks n]  (got $other)")
          sys.exit(1)
      }
    }
    if (gcDir != null) {
      val spark = org.apache.spark.sql.SparkSession.builder()
        .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS",
          Runtime.getRuntime.availableProcessors().toString)}]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      val (daily, weekly, dropped) =
        Retention.execute(spark, gcDir, keepDailyDays, keepWeeklyWeeks)
      println(s"[replicate] gc $gcDir: kept $daily daily + $weekly weekly" +
        s" snapshot(s), dropped $dropped")
      spark.stop()
      return
    }
    if (compactDir != null) {
      val spark = org.apache.spark.sql.SparkSession.builder()
        .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS",
          Runtime.getRuntime.availableProcessors().toString)}]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      val rows = maintain(spark, compactDir, targetBytes, smallBytes)
      rows.foreach { case (t, k, before, after, grps) =>
        println(s"[replicate] compacted $t gb=$k: $before -> $after files" +
          s" ($grps group(s))")
      }
      println(s"[replicate] maintenance done: ${rows.size} bucket(s)")
      spark.stop()
      return
    }
    val cfg =
      try ConfigLoader.load(cfgPath)
      catch { case e: Exception =>
        System.err.println(s"Failed to load config: ${e.getMessage}")
        sys.exit(1)
      }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val stopFlag = new AtomicBoolean(false)
    // the hook must JOIN the main thread after flipping the flag —
    // a hook that only sets it returns immediately and the JVM halts
    // mid-cycle (possibly mid stage-and-swap). Joining keeps the JVM
    // up until the loop observes the flag and finishes the current
    // cycle (best effort: Spark's own shutdown hooks run concurrently,
    // so an extremely long cycle can still be cut short — bounded here
    // at 10 minutes).
    val mainThread = Thread.currentThread()
    val hook = new Thread(() => {
      stopFlag.set(true)
      mainThread.join(600000L)
    })
    Runtime.getRuntime.addShutdownHook(hook)
    try {
      val cycles = run(spark, cfg, continuous, stop = () => stopFlag.get())
      println(s"[replicate] completed $cycles cycle(s)")
    } catch { case e: Exception =>
      System.err.println(s"Job failed: ${e.getMessage}")
      // deregister first: sys.exit runs hooks and would otherwise block
      // the exiting main thread on the hook's join of... itself
      Runtime.getRuntime.removeShutdownHook(hook)
      spark.stop()
      sys.exit(3)
    } finally spark.stop()
  }
}
