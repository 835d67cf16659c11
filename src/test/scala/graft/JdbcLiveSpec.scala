package graft

import java.nio.file.Files
import java.sql.DriverManager
import org.apache.spark.sql.functions._
import graft.cdc._

/** LIVE-database end-to-end coverage: Apache Derby embedded (already
  * on Spark's classpath as the Hive metastore's store) stands in for
  * the reference's Postgres. This closes the "JdbcStore is
  * code-complete but never touched a real database" residual: reads,
  * existence probes, truncate-overwrite writes, full Replicator
  * cycles (incremental updates AND range-hash delete sync) and
  * live-catalog index extraction all run against real JDBC here.
  */
class JdbcLiveSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dbHome = {
    val d = Files.createTempDirectory("graft-derby").toString
    System.setProperty("derby.system.home", d)  // keeps derby.log out of the repo
    d
  }
  private lazy val url = s"jdbc:derby:$dbHome/db;create=true"
  private val driver = "org.apache.derby.jdbc.EmbeddedDriver"

  private def exec(stmts: String*): Unit = {
    val conn = DriverManager.getConnection(url)
    try stmts.foreach { s => val st = conn.createStatement(); try st.execute(s) finally st.close() }
    finally conn.close()
  }

  private def store(ckpt: String) =
    new JdbcStore(spark, url, Map("driver" -> driver), ckpt)

  test("Derby: read, exists, and truncate-overwrite write round-trip") {
    exec("CREATE TABLE W (ID BIGINT NOT NULL PRIMARY KEY, V VARCHAR(100))",
      "INSERT INTO W VALUES (1, 'stale'), (2, 'stale')")
    val s = store(Files.createTempDirectory("graft-jdbc-ck").toString)
    assert(s.exists("W") && !s.exists("NO_SUCH_TABLE"))
    assert(s.read("W").count() == 2)

    val fresh = Seq((10L, "a"), (11L, "b"), (12L, "c")).toDF("ID", "V")
    s.write("W", fresh)   // stage → truncate → insert (never drops the PK)
    val back = s.read("W").as[(Long, String)].collect().toMap
    assert(back == Map(10L -> "a", 11L -> "b", 12L -> "c"))
    // the PK constraint survived the truncate path (a DROP+recreate
    // overwrite would have lost it)
    intercept[Exception](exec("INSERT INTO W VALUES (10, 'dup')"))
  }

  test("Derby → parquet: full Replicator cycles with updates and deletes") {
    exec("CREATE TABLE T (ID BIGINT NOT NULL PRIMARY KEY, VER BIGINT, V VARCHAR(40))",
      s"INSERT INTO T VALUES ${(0 until 60).map(i => s"($i, $i, 'v$i')").mkString(", ")}")
    val tgtDir = Files.createTempDirectory("graft-jdbc-tgt").toString
    val src = store(Files.createTempDirectory("graft-jdbc-ck2").toString)
    val tgt = new ParquetStore(spark, tgtDir)
    val cfg = ReplicationConfig(
      tables = Seq(TableConfig("T", Seq("ID"), "VER")), deleteChunkSize = 16)
    val rep = new Replicator(spark, cfg, src, tgt)

    rep.run() // initial sync (full copy branch: empty target)
    def target() = tgt.read("T").as[(Long, Long, String)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(target() == (0 until 60).map(i => i.toLong -> (i.toLong, s"v$i")).toMap)

    // live mutations: version-bumped updates, inserts, deletes
    exec("UPDATE T SET VER = 100, V = 'patched' WHERE ID IN (3, 7)",
      "INSERT INTO T VALUES (60, 101, 'new'), (61, 102, 'new')",
      "DELETE FROM T WHERE ID IN (5, 11, 42)")
    rep.run() // incremental branch: watermark pull + range-hash delete sync
    val want = ((0 until 60).map(i => i.toLong -> (i.toLong, s"v$i")).toMap
      -- Seq(5L, 11L, 42L)
      ++ Map(3L -> (100L, "patched"), 7L -> (100L, "patched"),
        60L -> (101L, "new"), 61L -> (102L, "new")))
    assert(target() == want, "second cycle must apply updates AND deletes")

    // a quiet third cycle is a no-op that leaves the target identical
    rep.run()
    assert(target() == want)
  }

  test("config-driven CLI run replicates a live Derby source to parquet") {
    exec("CREATE TABLE C (ID BIGINT NOT NULL PRIMARY KEY, VER BIGINT, V VARCHAR(40))",
      s"INSERT INTO C VALUES ${(0 until 25).map(i => s"($i, $i, 'c$i')").mkString(", ")}")
    val tgtDir = Files.createTempDirectory("graft-cli-tgt").toString
    val ckpt = Files.createTempDirectory("graft-cli-ck").toString
    // exactly the file a reference user would write: jdbc source URL,
    // parquet target dir, declared keys (file/JDBC stores carry no xmin)
    val cfg = ConfigLoader.loadString(
      s"""{"source":"$url","target":"$tgtDir","tables":["C"],
         |"keys":{"C":{"primaryKeys":["ID"],"versionColumn":"VER"}},
         |"checkpointDir":"$ckpt"}""".stripMargin)
    assert(graft.Replicate.run(spark, cfg, continuous = false) == 1)
    def target() = spark.read.parquet(s"$tgtDir/C.parquet")
      .as[(Long, Long, String)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(target() == (0 until 25).map(i => i.toLong -> (i.toLong, s"c$i")).toMap)

    exec("DELETE FROM C WHERE ID = 13",
      "UPDATE C SET VER = 50, V = 'bumped' WHERE ID = 2")
    assert(graft.Replicate.run(spark, cfg, continuous = false) == 1)
    assert(target() == ((0 until 25).map(i => i.toLong -> (i.toLong, s"c$i")).toMap
      - 13L + (2L -> (50L, "bumped"))))
  }

  test("continuous polling mode tracks a live Derby source across cycles") {
    exec("CREATE TABLE K (ID BIGINT NOT NULL PRIMARY KEY, VER BIGINT, V VARCHAR(20))",
      "INSERT INTO K VALUES (1, 1, 'a'), (2, 2, 'b')")
    val tgtDir = Files.createTempDirectory("graft-cont-tgt").toString
    val src = store(Files.createTempDirectory("graft-cont-ck").toString)
    val tgt = new ParquetStore(spark, tgtDir)
    val rep = new Replicator(spark,
      ReplicationConfig(tables = Seq(TableConfig("K", Seq("ID"), "VER"))), src, tgt)
    // the reference's -c loop: mutate the live table BETWEEN polls via
    // the onCycle hook and verify the replica tracks each cycle
    var seen = Vector.empty[Set[Long]]
    val cycles = rep.runContinuous(pollIntervalMs = 0L, maxCycles = 3,
      afterCycle = { n =>
        seen :+= tgt.read("K").as[(Long, Long, String)].collect().map(_._1).toSet
        if (n == 1) exec("INSERT INTO K VALUES (3, 3, 'c')")
        if (n == 2) exec("DELETE FROM K WHERE ID = 1")
      })
    assert(cycles == 3)
    assert(seen == Vector(Set(1L, 2L), Set(1L, 2L, 3L), Set(2L, 3L)),
      "each poll must observe the previous cycle's live mutations")
  }

  test("Derby: partitioned parallel extraction returns the same rows across N connections") {
    exec("CREATE TABLE P (ID BIGINT NOT NULL PRIMARY KEY, V VARCHAR(20))",
      s"INSERT INTO P VALUES ${(0 until 97).map(i => s"($i, 'p$i')").mkString(", ")}")
    // the 100 TB extraction shape: partitionColumn splits the scan into
    // numPartitions range-predicate queries over parallel connections
    val par = new JdbcStore(spark, url, Map("driver" -> driver),
      Files.createTempDirectory("graft-jdbc-ck4").toString,
      extraOptions = Map("partitionColumn" -> "ID", "lowerBound" -> "0",
        "upperBound" -> "97", "numPartitions" -> "4"))
    val df = par.read("P")
    assert(df.rdd.getNumPartitions == 4, "extraction must fan out as configured")
    assert(df.as[(Long, String)].collect().toMap ==
      (0 until 97).map(i => i.toLong -> s"p$i").toMap,
      "range-partitioned reads must cover every row exactly once")
  }

  test("Derby: chunked extraction — union ≡ full read, equi-depth balances where equal-width starves") {
    // the skew a real auto-increment key grows: a dense live segment
    // (240 keys at 0..239) plus a sparse deleted-era tail (10 keys at
    // 1M strides). Equal-width bounds put 96% of rows in one partition.
    val dense = (0 until 240).map(i => s"($i, 'd$i')")
    val sparse = (0 until 10).map(i => s"(${(i + 1) * 1000000L}, 's$i')")
    exec("CREATE TABLE SKEW (ID BIGINT NOT NULL PRIMARY KEY, V VARCHAR(40))",
      s"INSERT INTO SKEW VALUES ${(dense ++ sparse).mkString(", ")}")
    val s = store(Files.createTempDirectory("graft-jdbc-ck5").toString)
    val full = s.read("SKEW").as[(Long, String)].collect().sorted.toSeq
    val chunked = s.readChunked("SKEW", "ID", 5)
    assert(chunked.rdd.getNumPartitions === 5,
      "one bounded JDBC partition per plan chunk")
    assert(chunked.as[(Long, String)].collect().sorted.toSeq === full,
      "chunk union must equal the single-connection read exactly")
    // equi-depth balance: 250 rows over 5 chunks -> 50 per chunk
    val depthSizes = chunked.rdd
      .mapPartitions(it => Iterator.single(it.size)).collect().toSeq
    assert(depthSizes.max <= 60, s"equi-depth must balance, got $depthSizes")
    // the same keyspace under equal-WIDTH bounds (driver arithmetic):
    // width = (10M - 0)/5 -> every dense key lands in bucket 0
    val keys = full.map(_._1)
    val w = (keys.max - keys.min) / 5 + 1
    val widthSizes = keys.groupBy(k => (k - keys.min) / w).values.map(_.size)
    assert(widthSizes.max >= 240,
      "equal-width starves: the dense segment collapses into one bucket")
    // explicit-plan seam: the gated cdc_chunk_plan's own (lo, hi) rows
    // drive the same bounded read
    val plan = ChangeCapture.chunkPlan(
        s.read("SKEW").select("ID"), "ID", 5)
      .select("lo_key", "hi_key").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(s.readWithBounds("SKEW", "ID", plan)
      .as[(Long, String)].collect().sorted.toSeq === full)
    // empty table degrades to the plain read, not a crash
    exec("CREATE TABLE EMPTYT (ID BIGINT NOT NULL PRIMARY KEY)")
    assert(s.readChunked("EMPTYT", "ID", 4).count() === 0L)
  }

  test("Derby: Replicator full copy routes through the chunk-plan executor") {
    exec("CREATE TABLE CHK (ID BIGINT NOT NULL PRIMARY KEY, VER BIGINT, V VARCHAR(40))",
      s"INSERT INTO CHK VALUES ${((0 until 40).map(i => s"($i, $i, 'c$i')") ++
        Seq("(5000000, 40, 'tail')")).mkString(", ")}")
    val ckpt = Files.createTempDirectory("graft-jdbc-ck6").toString
    var chunkedReads = 0
    val src = new JdbcStore(spark, url, Map("driver" -> driver), ckpt) {
      override def readChunked(table: String, pkCol: String,
          chunks: Int): org.apache.spark.sql.DataFrame = {
        chunkedReads += 1
        super.readChunked(table, pkCol, chunks)
      }
    }
    val tgtDir = Files.createTempDirectory("graft-jdbc-tgt2").toString
    val cfg = ReplicationConfig(
      tables = Seq(TableConfig("CHK", Seq("ID"), "VER")), copyChunks = 4)
    new Replicator(spark, cfg, src, new ParquetStore(spark, tgtDir)).run()
    assert(chunkedReads === 1, "the full-copy branch must route through readChunked")
    val got = spark.read.parquet(s"$tgtDir/CHK.parquet")
      .as[(Long, Long, String)].collect().map(r => r._1 -> r._3).toMap
    assert(got === ((0 until 40).map(i => i.toLong -> s"c$i").toMap +
      (5000000L -> "tail")))
  }

  test("Derby: live-catalog index extraction maps to a bucketed layout") {
    exec("CREATE TABLE IX (ID BIGINT NOT NULL, TS BIGINT, V VARCHAR(20), " +
      "CONSTRAINT IX_PK PRIMARY KEY (ID))",
      "CREATE INDEX IX_TS ON IX (TS)")
    val s = store(Files.createTempDirectory("graft-jdbc-ck3").toString)
    val specs = s.extractIndices("IX", schema = Some("APP"))
    val pk = specs.find(_.primary).getOrElse(fail("no primary index extracted"))
    assert(pk.columns == Seq("ID"))
    assert(specs.exists(i => !i.primary && i.columns == Seq("TS")),
      s"secondary index missing from $specs")
    val layout = s.layoutFor("IX", numBuckets = 8, schema = Some("APP"))
      .getOrElse(fail("no layout derived"))
    assert(layout.bucketColumns == Seq("ID") && layout.numBuckets == 8)
    assert(layout.sortColumns.contains("TS"))
  }
}
