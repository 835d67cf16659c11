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
  * holds the complete new data (recovery: rename it into place; the
  * next cycle otherwise just re-runs a full copy). A metastore with a
  * transactional exchange/rename-over op would close the window.
  */
class CatalogStore(spark: SparkSession,
                   layouts: Map[String, SchemaSync.TableLayout],
                   val statePath: String,
                   tablePrefix: String = "") extends TableStore {

  private def name(table: String): String = s"$tablePrefix$table"

  override def read(table: String): DataFrame = spark.table(name(table))

  override def exists(table: String): Boolean =
    spark.catalog.tableExists(name(table))

  override def write(table: String, df: DataFrame): Unit = {
    val staging = s"__staging_${name(table)}"
    spark.sql(s"DROP TABLE IF EXISTS `$staging`")
    val base = df.write.mode("overwrite").format("parquet")
    val writer = layouts.get(table).map(_.applyTo(base)).getOrElse(base)
    writer.saveAsTable(staging)
    spark.sql(s"DROP TABLE IF EXISTS `${name(table)}`")
    spark.sql(s"ALTER TABLE `$staging` RENAME TO `${name(table)}`")
  }
}
