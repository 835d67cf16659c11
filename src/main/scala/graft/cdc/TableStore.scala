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

  /** Parallel chunked full extraction — the EXECUTOR consuming the A38
    * equi-depth chunk plan (`cdc_chunk_plan`). The reference's full
    * copy streams the table over ONE connection (reference:
    * copy.go:11); the cluster path pays one single-connection scan of
    * JUST the key column to plan bounds ([[ChangeCapture.chunkPlan]]),
    * then fans the data read out as one bounded JDBC partition per
    * chunk: `pk >= lo AND pk <= hi` predicates — consecutive chunks
    * abut on distinct keys, so the partition union is exactly the
    * table. Equi-DEPTH bounds are the point: an auto-increment key
    * with deleted eras or a hot recent segment puts most rows in few
    * equal-WIDTH ranges and starves the other connections (the
    * JdbcLiveSpec skew case shows 96% of rows in one width bucket).
    *
    * The pk must be non-null (it is a primary key); a NULL-keyed row
    * would match no chunk predicate. An empty table degrades to the
    * plain single-partition read.
    */
  def readChunked(table: String, pkCol: String, chunks: Int): DataFrame = {
    require(chunks >= 1, s"chunks must be >= 1, got $chunks")
    val keys = reader(Some(s"SELECT $pkCol FROM $table"), None).load()
    val plan = ChangeCapture.chunkPlan(keys, pkCol, chunks)
      .select("lo_key", "hi_key").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    if (plan.isEmpty) read(table) else readWithBounds(table, pkCol, plan)
  }

  /** Bounded-predicate read from an EXPLICIT chunk plan — `(lo, hi)`
    * INCLUSIVE key bounds, one JDBC partition (connection) per entry.
    * Callers that already ran the gated `cdc_chunk_plan` query hand
    * its `(lo_key, hi_key)` rows straight in; the plan is
    * chunk-cardinality, so the driver-side collect is bounded by the
    * requested parallelism, never the data.
    */
  def readWithBounds(table: String, pkCol: String,
      bounds: Seq[(Long, Long)]): DataFrame = {
    require(bounds.nonEmpty, "chunk plan is empty")
    val preds = bounds.map { case (lo, hi) =>
      s"$pkCol >= $lo AND $pkCol <= $hi" }
    val props = new java.util.Properties()
    (connProps ++ extraOptions).foreach { case (k, v) =>
      props.setProperty(k, v) }
    spark.read.jdbc(url, table, preds.toArray, props)
  }

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

  /** Extract the source table's indexes from JDBC metadata — the
    * Spark-side twin of the reference's `extractTableIndices`
    * (reference: internal/schemas.go:147): `getPrimaryKeys` rows
    * become the primary [[SchemaSync.IndexSpec]], `getIndexInfo` rows
    * the secondary ones. Feed the result to [[SchemaSync.layoutFor]]
    * (the analogue of `applyIndices`, schemas.go:241) to derive the
    * bucket/sort layout a [[CatalogStore]] target applies — a user
    * pointing graft at a live database no longer hand-writes what the
    * reference discovers.
    *
    * The cursor walk is thin; the row→spec mapping lives in
    * [[JdbcIndexes.indexSpecs]] and the connection comes from the
    * overridable [[withConnection]], so specs drive the whole path
    * with recorded metadata, DB-free.
    */
  def extractIndices(table: String,
                     schema: Option[String] = None): Seq[SchemaSync.IndexSpec] =
    withConnection { conn =>
      val md = conn.getMetaData
      // pass the schema pattern when known: with null, JDBC matches
      // EVERY schema, and a same-named table elsewhere (public vs
      // archive) would interleave its pk/index rows into this one's
      val schemaPat = schema.orNull
      var pkName: Option[String] = None
      val pkRows = Seq.newBuilder[(String, Int)]
      val pk = md.getPrimaryKeys(null, schemaPat, table)
      try while (pk.next()) {
        Option(pk.getString("COLUMN_NAME")).foreach { c =>
          pkRows += ((c, pk.getInt("KEY_SEQ")))
        }
        Option(pk.getString("PK_NAME")).foreach(n => pkName = Some(n))
      } finally pk.close()
      val idxRows = Seq.newBuilder[(String, String, Int)]
      val ix = md.getIndexInfo(null, schemaPat, table, false, true)
      try while (ix.next()) {
        // tableIndexStatistic rows describe the table (null INDEX_NAME);
        // functional/expression indexes report a null COLUMN_NAME — a
        // cluster sink can't sort by an expression, so skip both rather
        // than emit a spec with a null column that breaks every write
        for {
          name <- Option(ix.getString("INDEX_NAME"))
          column <- Option(ix.getString("COLUMN_NAME"))
        } idxRows += ((name, column, ix.getInt("ORDINAL_POSITION")))
      } finally ix.close()
      JdbcIndexes.indexSpecs(table, pkRows.result(), pkName, idxRows.result())
    }

  /** [[extractIndices]] piped through [[SchemaSync.layoutFor]]: the
    * target layout this source's catalog implies.
    */
  def layoutFor(table: String, numBuckets: Int,
                schema: Option[String] = None): Option[SchemaSync.TableLayout] =
    SchemaSync.layoutFor(extractIndices(table, schema), numBuckets)

  /** Open a plain JDBC connection with the store's url/props. The one
    * seam that needs a live database; overridable for recorded-
    * metadata specs.
    */
  protected def withConnection[T](f: java.sql.Connection => T): T = {
    connProps.get("driver").foreach(Class.forName(_))
    val props = new java.util.Properties()
    connProps.foreach { case (k, v) => props.setProperty(k, v) }
    val conn = java.sql.DriverManager.getConnection(url, props)
    try f(conn) finally conn.close()
  }
}

/** Pure mapping from JDBC metadata rows to [[SchemaSync.IndexSpec]]s —
  * factored out of the cursor walk so it is directly testable.
  */
object JdbcIndexes {

  /** @param pkRows  getPrimaryKeys rows as (COLUMN_NAME, KEY_SEQ)
    * @param pkName  PK_NAME if the driver reports one
    * @param idxRows getIndexInfo rows as
    *                (INDEX_NAME, COLUMN_NAME, ORDINAL_POSITION)
    */
  def indexSpecs(table: String, pkRows: Seq[(String, Int)], pkName: Option[String],
                 idxRows: Seq[(String, String, Int)]): Seq[SchemaSync.IndexSpec] = {
    val pkCols = pkRows.sortBy(_._2).map(_._1)
    val pk =
      if (pkCols.isEmpty) None
      else Some(SchemaSync.IndexSpec(pkName.getOrElse(s"${table}_pkey"),
        primary = true, pkCols))
    // the primary key's BACKING unique index shows up in getIndexInfo
    // too (by pk name, or under another name with the pk's columns) —
    // drop it rather than re-deriving the pk as a secondary index
    val secondary = idxRows.groupBy(_._1).toSeq
      .filterNot { case (name, _) => pkName.contains(name) }
      .map { case (name, rows) =>
        SchemaSync.IndexSpec(name, primary = false, rows.sortBy(_._3).map(_._2))
      }
      .filterNot(ix => pk.exists(_.columns == ix.columns))
      .sortBy(_.name)
    pk.toSeq ++ secondary
  }
}
