package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Catalog-backed [[TableStore]]: tables are Spark-catalog managed
  * tables, and each table's [[SchemaSync.TableLayout]] (derived from
  * the source's indexes — primary key → bucket columns, secondary
  * indexes → sort columns) is applied on every write via
  * `bucketBy`/`sortBy` + `saveAsTable`.
  *
  * This is the sink that makes the steady-state CDC merge
  * SHUFFLE-FREE on the base side: a table bucketed by its primary key
  * already satisfies the anti-join's required distribution, so cycle 2
  * onward only the (small) change batch shuffles — the target, however
  * large, is read in place. [[PlanAuditSpec]] pins that plan shape.
  *
  * Writes stage to a `__staging_<t>` table then swap via DROP +
  * RENAME: the merged frame reads the very table it replaces, and
  * `saveAsTable(overwrite)` on a self-referential plan is rejected by
  * Spark. The swap is two catalog statements, NOT atomic — a crash
  * between them leaves the live name missing while `__staging_<t>`
  * holds the complete new data. Every read/exists/write first runs
  * [[recoverIfNeeded]], which detects exactly that state and renames
  * the staging table into place, so the window costs nothing but the
  * rename on the next touch. A metastore with a transactional
  * exchange/rename-over op would remove the window entirely.
  */
class CatalogStore(spark: SparkSession,
                   layouts: Map[String, SchemaSync.TableLayout],
                   val statePath: String,
                   tablePrefix: String = "") extends TableStore {

  private def name(table: String): String = s"$tablePrefix$table"

  /** Crash recovery for the non-atomic swap: live name missing while
    * the staging table exists ⇒ the writer died between DROP and
    * RENAME, and staging holds the COMPLETE new table — publish it.
    * (Staging alongside a live table is the other crash shape — a
    * death before the DROP; the live table is current and the stale
    * staging copy is dropped by the next write.)
    *
    * Invoked from the WRITER-side entry points only (`exists`/`write`,
    * i.e. the sync job that owns the swap) — `read` stays catalog-
    * read-only, so a concurrent consumer can never rename staging into
    * place in the middle of a healthy writer's own DROP→RENAME window.
    * A reader that does hit the window gets a loud table-not-found and
    * the next sync cycle repairs it.
    */
  def recoverIfNeeded(table: String): Boolean = {
    val staging = s"__staging_${name(table)}"
    val orphaned = !spark.catalog.tableExists(name(table)) &&
      spark.catalog.tableExists(staging)
    if (orphaned)
      spark.sql(s"ALTER TABLE `$staging` RENAME TO `${name(table)}`")
    orphaned
  }

  override def read(table: String): DataFrame = spark.table(name(table))

  override def exists(table: String): Boolean = {
    recoverIfNeeded(table)
    spark.catalog.tableExists(name(table))
  }

  override def write(table: String, df: DataFrame): Unit = {
    // recover BEFORE the staging drop: if the previous writer crashed
    // mid-swap, the staging table is the only complete copy — dropping
    // it here would turn a recoverable crash into data loss
    recoverIfNeeded(table)
    val staging = s"__staging_${name(table)}"
    spark.sql(s"DROP TABLE IF EXISTS `$staging`")
    val base = df.write.mode("overwrite").format("parquet")
    val writer = layouts.get(table).map(_.applyTo(base)).getOrElse(base)
    writer.saveAsTable(staging)
    spark.sql(s"DROP TABLE IF EXISTS `${name(table)}`")
    spark.sql(s"ALTER TABLE `$staging` RENAME TO `${name(table)}`")
  }
}
