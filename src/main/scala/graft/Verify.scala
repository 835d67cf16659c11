package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // optional 3rd arg: comma-separated name filter (substring match)
    // for fast single-query iteration; the driver passes two args.
    val Array(sfDir, outDir) = args.take(2)
    val nameFilter: String => Boolean =
      if (args.length > 2) { val pats = args(2).split(",").toSeq
        (n: String) => pats.exists(n.contains)
      } else _ => true
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // testdata timestamps are isAdjustedToUTC=false; read them as
      // TIMESTAMP in this UTC session (not TIMESTAMP_NTZ) so
      // unix_millis and the DuckDB oracle see the same instants
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Queries are independent jobs; run them through a small pool so
    // Spark's scheduler overlaps their stages (one query's shuffle
    // wait fills with another's scan). Failures stay per-query.
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    import scala.concurrent.{ExecutionContext, Future, Await}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val jobs = SparkEntry.queries.toSeq.filter(t => nameFilter(t._1))
      .map { case (name, fn) =>
      Future {
        try {
          val df = fn(spark, sfDir)
          // Output-type gate: reject wide decimals / undocumented
          // doubles BEFORE the dump — a type-unstable column would
          // hash-fail the driver's DuckDB compare even with exact
          // values (the r8 interpolated-double / r9 decimal(38,0)
          // failure family; see OutputContract).
          OutputContract.assertContract(name, df.schema)
          df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
        } catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
      }
    }
    Await.result(Future.sequence(jobs), Duration.Inf)
    pool.shutdown()
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.filter(t => nameFilter(t._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
