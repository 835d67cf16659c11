package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import java.util.concurrent.ConcurrentHashMap

/** Per-job wall-clock profiler for one or more named queries — the
  * guide §1 "measure first" tool for a session with the UI disabled:
  * runs each query exactly the way Bench times it (same session
  * settings, count() action) and prints every Spark job's duration,
  * call site, and stage shuffle totals, so a multi-phase operator
  * (store build → insert → search) can be attributed phase by phase.
  * Usage: runMain graft.Profile <queryName ...>
  */
object Profile {
  def main(args: Array[String]): Unit = {
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
    spark.sparkContext.setLogLevel("ERROR")
    val starts = new ConcurrentHashMap[Int, (Long, String)]()
    val shuffle = new java.util.concurrent.atomic.AtomicLong(0L)
    val nTasks = new java.util.concurrent.atomic.AtomicLong(0L)
    val taskMs = new java.util.concurrent.atomic.AtomicLong(0L)
    val gcMs = new java.util.concurrent.atomic.AtomicLong(0L)
    val nStages = new java.util.concurrent.atomic.AtomicLong(0L)
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val site = Option(js.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("?")
        starts.put(js.jobId, (js.time, site))
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        if (m != null) {
          shuffle.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          nTasks.addAndGet(sc.stageInfo.numTasks)
          taskMs.addAndGet(m.executorRunTime)
          gcMs.addAndGet(m.jvmGCTime)
          nStages.incrementAndGet()
        }
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(starts.remove(je.jobId)).foreach { case (t0, site) =>
          lines.add(f"[job] ${je.jobId}%4d ${(je.time - t0) / 1000.0}%7.2fs  $site")
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    // one untimed warmup of the reader/codegen path (the Bench shape)
    import org.apache.spark.sql.functions.{col => scol, md5 => smd5}
    spark.range(1000000).select(smd5(scol("id").cast("string")).as("h"))
      .filter(scol("h") > "a").count()
    args.foreach { name =>
      SparkEntry.queries.get(name) match {
        case Some(fn) =>
          spark.catalog.clearCache(); System.gc()
          lines.clear(); shuffle.set(0L)
          nTasks.set(0L); taskMs.set(0L); gcMs.set(0L); nStages.set(0L)
          println(s"\n========== $name ==========")
          val t0 = System.nanoTime()
          val n = fn(spark, sfDir).count()
          val dt = (System.nanoTime() - t0) / 1e9
          Thread.sleep(300) // let the async listener bus drain
          lines.forEach(l => println(l))
          println(f"[total] $name $dt%.2fs rows=$n shuffleWriteMB=${shuffle.get / 1e6}%.1f " +
            f"stages=${nStages.get} tasks=${nTasks.get} taskTime=${taskMs.get / 1000.0}%.1fs gc=${gcMs.get / 1000.0}%.1fs")
        case None => println(s"$name: UNKNOWN")
      }
    }
    spark.stop()
  }
}
