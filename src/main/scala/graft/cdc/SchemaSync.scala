package graft.cdc

import org.apache.spark.sql.{DataFrame, DataFrameWriter, Row}
import org.apache.spark.sql.types._

/** Schema extraction, DDL generation and drift detection — the
  * Spark-native form of sslr's catalog introspection
  * (reference: internal/schemas.go:95-140 `extractTableSchema`,
  * job.go:96-160 `validateTable`).
  *
  * The reference renders a canonical `create table` string from
  * pg_catalog and compares strings to detect drift. Here the canonical
  * form is rendered from the Spark `StructType` (order-sensitive,
  * nullability-sensitive — matching the reference's column-order and
  * not-null sensitivity), and drift decisions follow the same policy
  * switch (`resyncOnSchemaChange` → resync vs abort).
  */
object SchemaSync {

  def sqlType(dt: DataType): String = dt match {
    case LongType => "bigint"
    case IntegerType => "int"
    case ShortType => "smallint"
    case DoubleType => "double"
    case FloatType => "real"
    case StringType => "varchar"
    case BooleanType => "boolean"
    case TimestampType => "timestamp"
    case DateType => "date"
    case BinaryType => "blob"
    case d: DecimalType => s"decimal(${d.precision},${d.scale})"
    case ArrayType(e, _) => s"${sqlType(e)}[]"
    case other => other.simpleString
  }

  /** Canonical `create table` DDL (reference schemas.go renders
    * `create table t(col type null/not null, …)`).
    */
  def ddl(table: String, schema: StructType): String = {
    val cols = schema.fields.map { f =>
      val nullability = if (f.nullable) "null" else "not null"
      s"${f.name} ${sqlType(f.dataType)} $nullability"
    }
    s"create table $table(${cols.mkString(",")});"
  }

  def fingerprint(table: String, schema: StructType): String = {
    val d = ddl(table, schema)
    java.security.MessageDigest.getInstance("MD5")
      .digest(d.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  sealed trait Drift
  case object InSync extends Drift
  case object TargetMissing extends Drift
  case class Mismatch(sourceDdl: String, targetDdl: String) extends Drift

  def compare(table: String, source: StructType, target: Option[StructType]): Drift =
    target match {
      case None => TargetMissing
      case Some(t) if ddl(table, t) == ddl(table, source) => InSync
      case Some(t) => Mismatch(ddl(table, source), ddl(table, t))
    }

  /** Policy from the reference: mismatch + resyncOnSchemaChange →
    * full resync; mismatch otherwise → abort (errSchemaMismatch).
    */
  sealed trait Action
  case object NoAction extends Action
  case object CreateTarget extends Action
  case object ForceResync extends Action
  case object Abort extends Action

  def decide(drift: Drift, resyncOnSchemaChange: Boolean): Action = drift match {
    case InSync => NoAction
    case TargetMissing => CreateTarget
    case Mismatch(_, _) => if (resyncOnSchemaChange) ForceResync else Abort
  }

  // -- indexes → physical layout -------------------------------------

  /** One source index, as the reference extracts it from pg_catalog
    * (schemas.go:141 `tableIndex{indexName, primary, columns}`).
    */
  case class IndexSpec(name: String, primary: Boolean, columns: Seq[String])

  /** Spark-native target layout derived from source indexes. A cluster
    * engine has no secondary B-trees; the faithful translation of the
    * reference's `applyIndices` (schemas.go:241) is physical layout:
    * the PRIMARY index becomes bucketing on its columns — co-locating
    * every future merge/delete-sync join so they plan without a
    * shuffle — and secondary index columns become the in-bucket sort
    * order, giving parquet min/max data skipping where Postgres would
    * use the index.
    */
  case class TableLayout(bucketColumns: Seq[String], numBuckets: Int,
                         sortColumns: Seq[String]) {
    /** `USING parquet CLUSTERED BY … SORTED BY … INTO n BUCKETS` text
      * (informational twin of the reference's rendered index DDL). */
    def ddlFragment: String = {
      val sorted = if (sortColumns.nonEmpty)
        s" sorted by (${sortColumns.mkString(",")})" else ""
      s"clustered by (${bucketColumns.mkString(",")})$sorted into $numBuckets buckets"
    }
    def applyTo(w: DataFrameWriter[Row]): DataFrameWriter[Row] = {
      val bucketed = w.bucketBy(numBuckets, bucketColumns.head, bucketColumns.tail: _*)
      if (sortColumns.nonEmpty) bucketed.sortBy(sortColumns.head, sortColumns.tail: _*)
      else bucketed
    }
  }

  /** Derive the layout: primary index → bucket columns; remaining
    * index columns (dedup'd, first-seen order) → sort columns.
    */
  def layoutFor(indices: Seq[IndexSpec], numBuckets: Int): Option[TableLayout] =
    indices.find(_.primary).map { pk =>
      val secondary = indices.filterNot(_.primary)
        .flatMap(_.columns).distinct.filterNot(pk.columns.contains)
      TableLayout(pk.columns, numBuckets, secondary)
    }
}
