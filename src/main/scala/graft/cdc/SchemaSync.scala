package graft.cdc

import org.apache.spark.sql.DataFrame
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
}
