package graft

import org.apache.spark.sql.types._
import graft.cdc.{PgDialect, PgStore, SchemaSync}

/** DB-free Postgres dialect coverage: every mapper is driven by
  * RECORDED catalog metadata — the rows/strings a real Postgres 15
  * emits for a TPC-H-ish table (captured once from a live instance's
  * `format_type`/`pg_index` output shapes) — so the only untested part
  * of a live run is the socket itself.
  */
class PgDialectSpec extends SparkSpec {

  test("identifier quoting follows Postgres folding rules") {
    // bare: simple lower-case, not reserved (Postgres folds these)
    assert(PgDialect.quoteIdent("o_orderkey") == "o_orderkey")
    assert(PgDialect.quoteIdent("lineitem") == "lineitem")
    // forced: upper case would fold to a DIFFERENT identifier unquoted
    assert(PgDialect.quoteIdent("OrderKey") == "\"OrderKey\"")
    // forced: reserved words, leading digit, embedded quote (doubled)
    assert(PgDialect.quoteIdent("user") == "\"user\"")
    assert(PgDialect.quoteIdent("order") == "\"order\"")
    assert(PgDialect.quoteIdent("2fast") == "\"2fast\"")
    assert(PgDialect.quoteIdent("we\"ird") == "\"we\"\"ird\"")
    assert(PgDialect.qualify(Some("public"), "orders") == "public.orders")
    assert(PgDialect.qualify(Some("Archive"), "user") == "\"Archive\".\"user\"")
  }

  test("recorded format_type strings map to the right Spark types") {
    // the exact strings pg_catalog.format_type renders (schemas.go:108
    // captures these verbatim; Spark needs real types)
    val recorded = Seq(
      "smallint" -> ShortType,
      "integer" -> IntegerType,
      "bigint" -> LongType,
      "real" -> FloatType,
      "double precision" -> DoubleType,
      "boolean" -> BooleanType,
      "bytea" -> BinaryType,
      "date" -> DateType,
      "numeric(12,2)" -> DecimalType(12, 2),
      "numeric" -> DecimalType(38, 18),
      "timestamp without time zone" -> TimestampType,
      "timestamp(3) with time zone" -> TimestampType,
      "character varying(25)" -> StringType,
      "character(1)" -> StringType,
      "text" -> StringType,
      "uuid" -> StringType,
      "jsonb" -> StringType,
      "integer[]" -> ArrayType(IntegerType),
      "double precision[]" -> ArrayType(DoubleType))
    recorded.foreach { case (pg, spark) =>
      assert(PgDialect.toSparkType(pg) == spark, s"for $pg")
    }
  }

  test("spark schema renders Postgres DDL and survives the round trip") {
    val st = StructType(Seq(
      StructField("o_orderkey", LongType, nullable = false),
      StructField("o_totalprice", DecimalType(12, 2), nullable = true),
      StructField("o_comment", StringType, nullable = true),
      StructField("order", TimestampType, nullable = false),
      StructField("tags", ArrayType(StringType), nullable = true)))
    val ddl = PgDialect.createTableDdl(Some("public"), "orders", st)
    assert(ddl == "create table public.orders (o_orderkey bigint not null, " +
      "o_totalprice numeric(12,2), o_comment text, " +
      "\"order\" timestamp not null, tags text[]);")
    // write-side type map feeds back through the read-side map losslessly
    // for every type both sides represent natively
    Seq(ShortType, IntegerType, LongType, FloatType, DoubleType,
      BooleanType, BinaryType, DateType, DecimalType(12, 2),
      ArrayType(LongType)).foreach { dt =>
      assert(PgDialect.toSparkType(PgDialect.toPgType(dt)) == dt, s"for $dt")
    }
  }

  test("recorded pg_attribute rows become the Spark schema in attnum order") {
    // recorded columnsSql output for a lineitem-ish table
    val rows = Seq(
      ("l_orderkey", "bigint", true),
      ("l_quantity", "numeric(12,2)", false),
      ("l_shipdate", "date", false),
      ("l_comment", "character varying(44)", false))
    val st = PgDialect.schemaFromRows(rows)
    assert(st.fieldNames.toSeq ==
      Seq("l_orderkey", "l_quantity", "l_shipdate", "l_comment"))
    assert(st("l_orderkey") == StructField("l_orderkey", LongType, nullable = false))
    assert(st("l_quantity") == StructField("l_quantity", DecimalType(12, 2)))
    assert(st("l_comment").dataType == StringType)
  }

  test("recorded pg_index rows derive the bucket/sort layout") {
    // recorded indexesSql output: pk, its backing unique index under
    // the pk name (deduplicated), and two secondaries
    val rows = Seq(
      ("orders_pkey", true, "o_orderkey", 1),
      ("orders_custkey_idx", false, "o_custkey", 1),
      ("orders_date_prio_idx", false, "o_orderdate", 1),
      ("orders_date_prio_idx", false, "o_orderpriority", 2))
    val specs = PgDialect.indexSpecsFromRows(rows)
    assert(specs == Seq(
      SchemaSync.IndexSpec("orders_pkey", primary = true, Seq("o_orderkey")),
      SchemaSync.IndexSpec("orders_custkey_idx", primary = false, Seq("o_custkey")),
      SchemaSync.IndexSpec("orders_date_prio_idx", primary = false,
        Seq("o_orderdate", "o_orderpriority"))))
    // a same-column unique index must not shadow the pk as a secondary
    val withDup = rows :+ ("orders_okey_unique", false, "o_orderkey", 1)
    assert(!PgDialect.indexSpecsFromRows(withDup).exists(_.name == "orders_okey_unique"))
    // and the layout buckets on the pk, sorts by secondary columns
    val layout = SchemaSync.layoutFor(specs, numBuckets = 8).get
    assert(layout.bucketColumns == Seq("o_orderkey"))
    assert(layout.sortColumns == Seq("o_custkey", "o_orderdate", "o_orderpriority"))
  }

  test("xmin version queries carry the reference's watermark semantics") {
    assert(PgDialect.tableRangeSql("public.orders") ==
      "select count(*) as table_length, max(xmin::text::bigint) as max_version " +
        "from public.orders")
    assert(PgDialect.tableRangeSql("t", "o_flag = 'O'").endsWith("where o_flag = 'O'"))
    val pull = PgDialect.pullSinceSql("public.orders", 12345L, "o_flag = 'O'")
    assert(pull.contains("xmin::text::bigint as __graft_version"))
    assert(pull.contains("where xmin::text::bigint >= 12345"))
    assert(pull.endsWith("and (o_flag = 'O')"))
  }

  test("PgStore wires driver, quoting, and the incremental reader options") {
    val store = new PgStore(spark, "jdbc:postgresql://db:5432/x",
      Map.empty, "/tmp/pg_ckpt", schema = Some("public")) {
      // expose the assembled options DB-free
      def pullOptions(table: String, from: Long): Map[String, String] =
        readerOptions(Some(PgDialect.pullSinceSql(
          PgDialect.qualify(Some("public"), table), from)), None)
    }
    val opts = store.pullOptions("order", 77L)
    assert(opts("url") == "jdbc:postgresql://db:5432/x")
    assert(opts("driver") == "org.postgresql.Driver")
    assert(opts("query").contains("from public.\"order\" t"))
    assert(opts("query").contains(">= 77"))
    // a caller-pinned driver (pgbouncer shims etc.) is not overridden
    val custom = new PgStore(spark, "jdbc:postgresql://db/x",
      Map("driver" -> "example.CustomDriver"), "/tmp/pg_ckpt")
    assert(custom.readerOptions(None, Some("t"))("driver") == "example.CustomDriver")
  }

  test("catalog discovery SQL walks pg_catalog with bind placeholders") {
    // the queries a live run sends (semantics of schemas.go:95,142):
    // parameterized, ordered, and scoped to one schema+table
    Seq(PgDialect.columnsSql, PgDialect.indexesSql).foreach { q =>
      assert(q.count(_ == '?') == 2, "must bind (schema, table)")
      assert(q.contains("pg_catalog."))
      assert(q.toLowerCase.contains("order by"))
    }
    assert(PgDialect.columnsSql.contains("format_type"))
    assert(PgDialect.columnsSql.contains("attisdropped"),
      "dropped columns still occupy attnums and must be excluded")
    assert(PgDialect.indexesSql.contains("indisprimary"))
    assert(PgDialect.indexesSql.contains("unnest(ix.indkey) with ordinality"),
      "multi-column index order comes from indkey position, not attnum")
  }
}
