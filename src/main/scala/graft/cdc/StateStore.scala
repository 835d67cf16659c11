package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-table replication state — the Spark-native form of sslr's
  * `__sslr_state` table (reference: internal/state.go).
  *
  * Same schema and upsert semantics: (table_name PK, last_seen_version,
  * where_clause), persisted as parquet under `path`. Writes rewrite the
  * (tiny) state table via the same Merge.upsert used for data tables;
  * reads are a single-file scan. On a cluster this lives on shared
  * storage next to the target dataset, exactly as the reference keeps
  * state in the target database.
  */
class StateStore(spark: SparkSession, path: String) {
  import spark.implicits._

  def stateTable(): DataFrame =
    if (graft.util.Fs.existsNonEmpty(spark, path))
      spark.read.parquet(path)
    else
      Seq.empty[(String, Long, String)]
        .toDF("table_name", "last_seen_version", "where_clause")

  case class TableState(lastSeenVersion: Long, whereClause: String) {
    def isEmpty: Boolean = lastSeenVersion == 0L && whereClause.isEmpty
  }

  def get(table: String): TableState = synchronized {
    val rows = stateTable().filter($"table_name" === table)
      .select("last_seen_version", "where_clause").collect()
    if (rows.isEmpty) TableState(0L, "")
    else TableState(rows.head.getLong(0), Option(rows.head.getString(1)).getOrElse(""))
  }

  // `synchronized`: state mutations are read-modify-write over one
  // parquet path; the Replicator syncs tables CONCURRENTLY and two
  // interleaved puts would lose one table's watermark. (Cross-process
  // coordination, if ever needed, belongs to the driver — same as
  // Structured Streaming's single-writer checkpoint rule.)
  def put(table: String, state: TableState): Unit = synchronized {
    val update = Seq((table, state.lastSeenVersion, state.whereClause))
      .toDF("table_name", "last_seen_version", "where_clause")
    val merged = Merge.upsert(stateTable(), update, Seq("table_name")).collect()
    // two-phase rewrite: the state table is tiny, so collect + rewrite
    // avoids read/overwrite-same-path races
    val out = spark.createDataFrame(
      spark.sparkContext.parallelize(merged.toIndexedSeq, 1), stateTable().schema)
    out.write.mode("overwrite").parquet(path)
  }

  def setVersion(table: String, version: Long): Unit = synchronized {
    put(table, get(table).copy(lastSeenVersion = version))
  }

  def setWhere(table: String, where: String): Unit = synchronized {
    put(table, get(table).copy(whereClause = where))
  }
}
