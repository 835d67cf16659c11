package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Abstraction over the replication medium (reference: a Postgres
  * connection on both ends, internal/pglink.go). A store reads/writes
  * whole logical tables; `write` MUST be safe when `df` derives from
  * the store's own current contents (the upsert/delete cycles rewrite
  * a table from itself), which in Spark's lazy model means staging the
  * result before touching the destination.
  */
trait TableStore {
  def read(table: String): DataFrame
  def exists(table: String): Boolean
  def write(table: String, df: DataFrame): Unit

  /** Where the replication state (per-table watermark + where clause)
    * lives for a sink. Spark-first divergence from the reference: sslr
    * keeps `__sslr_state` inside the target database; a Spark job keeps
    * job state in its checkpoint location (exactly like Structured
    * Streaming), which survives target rebuilds and needs no DDL on
    * the target.
    */
  def statePath: String
}

/** Directory-of-datasets store: `<dir>/<table>.<format>` per table,
  * for any Spark file source (parquet/orc/json/csv/avro). Text formats
  * carry weaker types — pass explicit `readOptions` (header,
  * inferSchema, timestampFormat) when replicating from them.
  */
class FormatStore(spark: SparkSession, dir: String, format: String,
                  readOptions: Map[String, String] = Map.empty,
                  writeOptions: Map[String, String] = Map.empty)
    extends TableStore {

  protected def path(t: String) = s"$dir/$t.$format"

  override def read(table: String): DataFrame =
    spark.read.format(format).options(readOptions).load(path(table))

  override def exists(table: String): Boolean =
    graft.util.Fs.existsNonEmpty(spark, path(table))

  override def write(table: String, df: DataFrame): Unit = {
    // stage first: df may read the very files the overwrite replaces.
    // The staged dataset then MOVES into place — re-writing it through
    // Spark would double the I/O and repack the partitions the caller
    // chose (chunk sizing, pk hashing). Hadoop FS API, not java.io:
    // works on hdfs:/s3a: paths, where a local-File exists() would
    // silently report "missing" and full-copy every cycle.
    val tmp = s"$dir/__staging_$table"
    df.write.format(format).options(writeOptions).mode("overwrite").save(tmp)
    graft.util.Fs.replace(spark, tmp, path(table))
  }

  override def statePath: String = s"$dir/__graft_state"
}

/** Directory-of-parquet store: `<dir>/<table>.parquet` per table. */
class ParquetStore(spark: SparkSession, dir: String)
    extends FormatStore(spark, dir, "parquet")

/** JDBC store — the reference's actual medium (Postgres on both ends).
  *
  * Code-complete but NOT exercised by the test suite: this container
  * has no database and no egress, so the Replicator specs drive the
  * identical orchestration through [[ParquetStore]]. The reads push
  * down through Spark's JDBC source (predicate + column pruning);
  * `partitionColumn` options can be layered on via `extraOptions` for
  * parallel extraction of large tables.
  *
  * @param checkpointDir local/DFS directory for staging and state —
  *        see [[TableStore.statePath]] for why state is job-side.
  */
class JdbcStore(spark: SparkSession, url: String,
                connProps: Map[String, String],
                checkpointDir: String,
                extraOptions: Map[String, String] = Map.empty)
    extends TableStore {

  /** The assembled reader option map — the exact options handed to
    * Spark's jdbc source. Factored out so specs can assert the
    * plumbing (url/driver/partitionColumn passthrough, query vs
    * dbtable precedence) without a live database.
    */
  def readerOptions(query: Option[String], table: Option[String]): Map[String, String] = {
    val base = Map("url" -> url) ++ connProps ++ extraOptions
    (query, table) match {
      case (Some(q), _) => base + ("query" -> q)
      case (_, Some(t)) => base + ("dbtable" -> t)
      case _ => throw new IllegalArgumentException("query or table required")
    }
  }

  /** Writer options for the truncate-overwrite apply step. */
  def writerOptions(table: String): Map[String, String] =
    Map("url" -> url, "dbtable" -> table, "truncate" -> "true") ++ connProps

  private def reader(query: Option[String], table: Option[String]) =
    spark.read.format("jdbc").options(readerOptions(query, table))

  override def read(table: String): DataFrame =
    reader(None, Some(table)).load()

  override def exists(table: String): Boolean =
    try { reader(Some(s"SELECT 1 FROM $table WHERE 1 = 0"), None).load(); true }
    catch { case _: Exception => false }

  override def write(table: String, df: DataFrame): Unit = {
    // stage to parquet: a JDBC overwrite truncates the table the plan
    // may still be reading from
    val tmp = stagingPath(table)
    df.write.mode("overwrite").parquet(tmp)
    val staged = spark.read.parquet(tmp)
    jdbcSave(staged, table)
    graft.util.Fs.delete(spark, tmp)
  }

  /** The one step that needs a live database — the staged frame's
    * truncate-overwrite into the target table. Overridable so specs
    * drive the full write sequence (stage → read-back → save →
    * cleanup) against a recorder instead of a DB.
    */
  protected def jdbcSave(staged: DataFrame, table: String): Unit =
    staged.write.format("jdbc").options(writerOptions(table))
      .mode("overwrite").save()

  def stagingPath(table: String): String = s"$checkpointDir/__staging_$table"

  override def statePath: String = s"$checkpointDir/__graft_state"
}
