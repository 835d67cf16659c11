package graft.cdc

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

/** PostgreSQL dialect mapping layer — the pieces a live-Postgres run
  * needs beyond generic JDBC, unit-tested DB-free against recorded
  * catalog metadata (same technique as [[JdbcIndexes]]: thin cursor
  * walk, pure row→spec mapping).
  *
  * The reference talks to Postgres natively: `xmin::text::bigint` is
  * its row version for watermark pulls (reference:
  * internal/updates.go:44,94 and state.go:23), and schema/index
  * discovery walks pg_catalog (internal/schemas.go:95,142). This
  * object reproduces those behaviors as query builders + pure mappers,
  * so the first live-Postgres run has no unexercised code paths — the
  * only thing the zero-egress container can't test is the socket.
  */
object PgDialect {

  // ---------- identifier quoting ----------

  /** Words Postgres reserves in table/column position (the common
    * collisions; a superset is harmless — quoting is always safe).
    */
  private val reserved = Set(
    "all", "analyse", "analyze", "and", "any", "array", "as", "asc",
    "between", "both", "case", "cast", "check", "collate", "column",
    "constraint", "create", "cross", "current_date", "current_time",
    "current_timestamp", "current_user", "default", "deferrable",
    "desc", "distinct", "do", "else", "end", "except", "false",
    "for", "foreign", "from", "full", "grant", "group", "having",
    "in", "initially", "inner", "intersect", "into", "is", "join",
    "leading", "left", "like", "limit", "localtime", "localtimestamp",
    "natural", "not", "null", "offset", "on", "only", "or", "order",
    "outer", "overlaps", "placing", "primary", "references", "right",
    "select", "session_user", "similar", "some", "symmetric", "table",
    "then", "to", "trailing", "true", "union", "unique", "user",
    "using", "when", "where", "window", "with")

  /** Quote an identifier the way Postgres needs it: bare only when it
    * is a simple lower-case name and not reserved (Postgres folds
    * unquoted identifiers to lower case, so anything with upper case
    * MUST be quoted to round-trip); embedded double quotes double.
    */
  def quoteIdent(name: String): String =
    if (name.matches("[a-z_][a-z0-9_$]*") && !reserved(name)) name
    else "\"" + name.replace("\"", "\"\"") + "\""

  /** schema-qualified, per-part-quoted table path ("public.orders"). */
  def qualify(schema: Option[String], table: String): String =
    schema.map(s => s"${quoteIdent(s)}.").getOrElse("") + quoteIdent(table)

  // ---------- type mapping ----------

  /** `pg_catalog.format_type` output → Spark type — the read-side map
    * for schema sync against a Postgres source (the reference captures
    * these strings verbatim into its DDL, schemas.go:108; Spark needs
    * real types). Unknown types fall back to string, the lossless
    * choice for round-tripping values Spark has no native type for
    * (uuid/json/interval/inet...).
    */
  def toSparkType(pgType: String): DataType = {
    val t = pgType.trim.toLowerCase
    if (t.endsWith("[]")) ArrayType(toSparkType(t.dropRight(2)))
    else {
      val numeric = "numeric\\((\\d+),\\s*(\\d+)\\)".r
      t match {
        case "smallint" => ShortType
        case "integer" => IntegerType
        case "bigint" => LongType
        case "real" => FloatType
        case "double precision" => DoubleType
        case "boolean" => BooleanType
        case "bytea" => BinaryType
        case "date" => DateType
        case numeric(p, s) => DecimalType(p.toInt, s.toInt)
        case "numeric" => DecimalType(38, 18)
        case tt if tt.startsWith("timestamp") => TimestampType
        case _ => StringType // text/varchar/char/uuid/json/inet/interval/...
      }
    }
  }

  /** Spark type → Postgres DDL type — the write-side map for creating
    * a Postgres sink table from a Spark schema.
    */
  def toPgType(dt: DataType): String = dt match {
    case ShortType | ByteType => "smallint"
    case IntegerType => "integer"
    case LongType => "bigint"
    case FloatType => "real"
    case DoubleType => "double precision"
    case BooleanType => "boolean"
    case BinaryType => "bytea"
    case DateType => "date"
    case d: DecimalType => s"numeric(${d.precision},${d.scale})"
    case TimestampType | TimestampNTZType => "timestamp"
    case ArrayType(e, _) => s"${toPgType(e)}[]"
    case _ => "text"
  }

  /** CREATE TABLE DDL from a Spark schema — the sink-side twin of the
    * reference's source-side DDL extraction (schemas.go:95 builds the
    * same `create table path(col type null-ness, ...)` shape from
    * pg_catalog; here the Spark schema is the source of truth).
    */
  def createTableDdl(schema: Option[String], table: String, st: StructType): String = {
    val cols = st.fields.map { f =>
      s"${quoteIdent(f.name)} ${toPgType(f.dataType)}" +
        (if (f.nullable) "" else " not null")
    }
    s"create table ${qualify(schema, table)} (${cols.mkString(", ")});"
  }

  // ---------- xmin version hook ----------

  /** The row-version expression: Postgres's per-row transaction id,
    * cast through text to a comparable bigint exactly as the reference
    * does (updates.go:94 — xmin is a special system column whose type
    * has no direct integer cast). Monotonic per committed row change
    * within wraparound horizon, which is the reference's watermark
    * assumption too (state.go `last_seen_xmin`).
    */
  val versionExpr = "xmin::text::bigint"

  /** Length + max version in one scan (reference updates.go:44's
    * `select count(*), max(xmin::text::bigint)`): feeds both the
    * full-copy decision and the pull range.
    */
  def tableRangeSql(table: String, where: String = ""): String = {
    val w = if (where.nonEmpty) s" where $where" else ""
    s"select count(*) as table_length, max($versionExpr) as max_version from $table$w"
  }

  /** Incremental pull subquery: every row at or past the watermark,
    * the version exposed as `__graft_version` (the reference pulls
    * `xmin, *` with `xmin::text::bigint >= $1`, updates.go:86-107; its
    * offset/limit chunking is pgx cursor pagination — Spark instead
    * chunks via partitionColumn bounds on the version column, which is
    * the same scan split without the O(offset) re-skip per chunk).
    */
  def pullSinceSql(table: String, fromVersion: Long, where: String = ""): String = {
    val w = if (where.nonEmpty) s" and ($where)" else ""
    s"select $versionExpr as __graft_version, t.* from $table t " +
      s"where $versionExpr >= $fromVersion$w"
  }

  // ---------- catalog discovery ----------

  /** Column inventory for one table, in attnum order — the dialect's
    * schema-sync source (semantics of reference schemas.go:95: name,
    * format_type, null-ness from pg_attribute). JDBC `?` placeholders:
    * (schema, table).
    */
  val columnsSql: String =
    """select a.attname as column_name,
      |       pg_catalog.format_type(a.atttypid, a.atttypmod) as data_type,
      |       a.attnotnull as not_null
      |from pg_catalog.pg_attribute a
      |join pg_catalog.pg_class c on c.oid = a.attrelid
      |join pg_catalog.pg_namespace n on n.oid = c.relnamespace
      |where n.nspname = ? and c.relname = ?
      |  and a.attnum > 0 and not a.attisdropped
      |order by a.attnum""".stripMargin

  /** Index inventory: one row per (index, position) with the column
    * name — the pg_catalog twin of `getIndexInfo` + `getPrimaryKeys`
    * (reference schemas.go:142 aggregates the same join). JDBC `?`
    * placeholders: (schema, table).
    */
  val indexesSql: String =
    """select i.relname as index_name, ix.indisprimary as is_primary,
      |       a.attname as column_name, k.ord as position
      |from pg_catalog.pg_index ix
      |join pg_catalog.pg_class i on i.oid = ix.indexrelid
      |join pg_catalog.pg_class t on t.oid = ix.indrelid
      |join pg_catalog.pg_namespace n on n.oid = t.relnamespace
      |cross join lateral unnest(ix.indkey) with ordinality as k(attnum, ord)
      |join pg_catalog.pg_attribute a
      |  on a.attrelid = t.oid and a.attnum = k.attnum
      |where n.nspname = ? and t.relname = ? and t.relkind = 'r'
      |order by i.relname, k.ord""".stripMargin

  /** Recorded (column_name, format_type, not_null) rows → Spark
    * schema: the pure mapping [[columnsSql]] rows feed.
    */
  def schemaFromRows(rows: Seq[(String, String, Boolean)]): StructType =
    StructType(rows.map { case (name, pgType, notNull) =>
      StructField(name, toSparkType(pgType), nullable = !notNull)
    })

  /** Recorded (index_name, is_primary, column_name, position) rows →
    * [[SchemaSync.IndexSpec]]s: primary first, the pk's backing
    * unique index deduplicated — same contract as
    * [[JdbcIndexes.indexSpecs]], fed from [[indexesSql]] rows.
    */
  def indexSpecsFromRows(rows: Seq[(String, Boolean, String, Int)]): Seq[SchemaSync.IndexSpec] = {
    val byIndex = rows.groupBy(_._1).toSeq.map { case (name, rs) =>
      SchemaSync.IndexSpec(name, primary = rs.head._2,
        rs.sortBy(_._4).map(_._3))
    }
    val pk = byIndex.filter(_.primary).sortBy(_.name).headOption
    val secondary = byIndex.filterNot(_.primary)
      .filterNot(ix => pk.exists(_.columns == ix.columns))
      .sortBy(_.name)
    pk.toSeq ++ secondary
  }
}

/** [[JdbcStore]] specialized for PostgreSQL: driver wired, identifiers
  * quoted with Postgres rules, and the xmin-versioned incremental pull
  * exposed as a reader ([[readSince]]) so the Replicator's watermark
  * cycle runs against a live Postgres exactly the way the reference's
  * does — `pg_catalog` index discovery included (the generic JDBC
  * metadata path in [[JdbcStore.extractIndices]] also works on
  * Postgres; both feed the same [[SchemaSync.layoutFor]]).
  */
class PgStore(spark: SparkSession, url: String,
              connProps: Map[String, String],
              checkpointDir: String,
              extraOptions: Map[String, String] = Map.empty,
              schema: Option[String] = None)
    extends JdbcStore(spark, url,
      connProps + ("driver" -> connProps.getOrElse("driver", "org.postgresql.Driver")),
      checkpointDir, extraOptions) {

  private def qualified(table: String): String =
    PgDialect.qualify(schema, table)

  override def read(table: String): org.apache.spark.sql.DataFrame =
    spark.read.format("jdbc")
      .options(readerOptions(None, Some(qualified(table)))).load()

  override def exists(table: String): Boolean =
    try {
      spark.read.format("jdbc")
        .options(readerOptions(
          Some(s"select 1 from ${qualified(table)} where 1 = 0"), None))
        .load(); true
    } catch { case _: Exception => false }

  /** Incremental watermark pull: rows whose xmin version is ≥
    * `fromVersion`, with `__graft_version` materialized for the
    * state update. Layer `partitionColumn=__graft_version` bounds via
    * `extraOptions` to parallelize large pulls.
    */
  def readSince(table: String, fromVersion: Long,
                where: String = ""): org.apache.spark.sql.DataFrame =
    spark.read.format("jdbc")
      .options(readerOptions(
        Some(PgDialect.pullSinceSql(qualified(table), fromVersion, where)), None))
      .load()
}
