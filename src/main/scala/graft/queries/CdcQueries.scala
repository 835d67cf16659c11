package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.cdc.{ChangeCapture, Compaction, Merge, RangeHashDiff, Retention, SnapshotDiff, SchemaSync}
import graft.util.Tables

/** Driver-checkable bindings of the CDC operator library (SURVEY §2
  * A-block) onto the synthetic tables. `events.event_id` plays the
  * monotone version role (sslr's xmin); `orders.o_orderkey` is the
  * replicated PK. Simulated target states (dropped key ranges, stale
  * subsets) are derived deterministically so the DuckDB oracle can
  * derive the identical scenario.
  */
object CdcQueries {

  private val W = 500L        // incremental watermark (nonempty at every sf)
  private val CHUNK = 1000L   // ordered range-hash chunk
  private val DCHUNK = 500L   // delete-scan chunk

  // simulated source-side deletion: every 97th key above 5000 vanished
  private val delPred = "o_orderkey % 97 = 0 AND o_orderkey > 5000"

  def updateRangeQ(spark: SparkSession, sfDir: String): DataFrame =
    ChangeCapture.updateRange(
      Tables.events(spark, sfDir), col("event_id"), col("event_type") =!= "error")

  def incrementalPullQ(spark: SparkSession, sfDir: String): DataFrame =
    ChangeCapture.incrementalPull(
      Tables.events(spark, sfDir).select("event_id", "user_id", "event_type", "value"),
      col("event_id"), W, col("event_type") =!= "error")

  def mergeUpsertQ(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = Tables.orders(spark, sfDir)
    val base = orders.filter(expr("o_orderkey % 10 <> 0"))
    val updates = orders
      .filter(col("o_orderdate") >= lit("1998-01-01").cast("timestamp"))
      .withColumn("o_orderpriority", lit("UPDATED"))
    Merge.upsert(base, updates, Seq("o_orderkey"))
  }

  def fullCopyQ(spark: SparkSession, sfDir: String): DataFrame =
    ChangeCapture.fullCopy(
      Tables.lineitem(spark, sfDir),
      col("l_shipdate") >= lit("1998-06-01").cast("timestamp"))

  def fullCopyDecisionQ(spark: SparkSession, sfDir: String): DataFrame = {
    val src = Tables.events(spark, sfDir).filter(col("event_type") =!= "error")
    val tgt = src.filter(expr("event_id % 3 = 0"))
    ChangeCapture.fullCopyDecision(src, tgt, "events@0.5", 0.5)
      .unionByName(ChangeCapture.fullCopyDecision(src, tgt, "events@0.2", 0.2))
  }

  def rangeHashQ(spark: SparkSession, sfDir: String): DataFrame =
    RangeHashDiff.bucketHashes(Tables.orders(spark, sfDir), "o_orderkey", CHUNK, ordered = true)

  def rangeHashFastQ(spark: SparkSession, sfDir: String): DataFrame =
    RangeHashDiff.bucketHashes(Tables.orders(spark, sfDir), "o_orderkey", CHUNK, ordered = false)

  private def srcAfterDeletes(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir).filter(expr(s"NOT ($delPred)"))

  def rangeDiffQ(spark: SparkSession, sfDir: String): DataFrame =
    RangeHashDiff.diffBuckets(
      srcAfterDeletes(spark, sfDir), Tables.orders(spark, sfDir), "o_orderkey", DCHUNK)
      .withColumnsRenamed(Map("src_keys" -> "source_keys", "tgt_keys" -> "target_keys"))

  def changedRangeResyncQ(spark: SparkSession, sfDir: String): DataFrame = {
    val src = srcAfterDeletes(spark, sfDir)
    val diff = RangeHashDiff.diffBuckets(src, Tables.orders(spark, sfDir), "o_orderkey", DCHUNK)
    RangeHashDiff.changedRangeRows(src, diff, "o_orderkey", DCHUNK)
  }

  /** Composite-pk delete detection: hash buckets over
    * (l_orderkey, l_linenumber) — the any-key-shape variant of the
    * range diff (every 89th order's first line vanished).
    */
  def hashBucketDiffQ(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_linenumber")
    val src = li.filter(expr("NOT (l_orderkey % 89 = 0 AND l_linenumber = 1)"))
    RangeHashDiff.hashBucketDiff(src, li, Seq("l_orderkey", "l_linenumber"), 64)
      .withColumnsRenamed(Map("src_keys" -> "source_keys", "tgt_keys" -> "target_keys"))
  }

  def deletedKeysQ(spark: SparkSession, sfDir: String): DataFrame =
    RangeHashDiff.deletedKeys(
      srcAfterDeletes(spark, sfDir), Tables.orders(spark, sfDir), Seq("o_orderkey"))

  def snapshotDiffQ(spark: SparkSession, sfDir: String): DataFrame = {
    val old = Tables.orders(spark, sfDir)
    val newSnap = old.filter(expr("o_orderkey % 13 <> 0"))
      .withColumn("o_totalprice",
        when(expr("o_orderkey % 11 = 0"), col("o_totalprice") + 1.0)
          .otherwise(col("o_totalprice")))
      .unionByName(old.filter(expr("o_orderkey % 17 = 0"))
        .withColumn("o_orderkey", col("o_orderkey") + 10000000L))
    SnapshotDiff.diff(old, newSnap, Seq("o_orderkey"))
  }

  /** Three-way merge classification (SnapshotDiff.threeWay): two
    * branches diverge from orders — left updates %5 (+1.0), deletes
    * %13, inserts %29-derived keys; right updates %7 (+2.0), deletes
    * %19, inserts %23-derived keys; both insert the SAME %17-derived
    * rows. Every outcome class has deterministic true positives
    * (both-deleted and both-inserted-same → agree, crossing
    * update/delete → conflict); the oracle derives outcomes from the
    * construction predicates — algorithm-independent truth.
    */
  private def threeWayBranches(spark: SparkSession, sfDir: String)
      : (DataFrame, DataFrame, DataFrame) = {
    val base = Tables.orders(spark, sfDir)
    val k = col("o_orderkey")
    def branch(updMod: Int, updDelta: Double, delMod: Int,
               insMod: Int, insOffset: Long, extraMod: Int, extraOffset: Long) =
      base.filter(k % delMod =!= 0)
        .withColumn("o_totalprice",
          when(k % updMod === 0, col("o_totalprice") + updDelta)
            .otherwise(col("o_totalprice")))
        .unionByName(base.filter(k % insMod === 0)
          .withColumn("o_orderkey", k + insOffset))
        .unionByName(base.filter(k % extraMod === 0)
          .withColumn("o_orderkey", k + extraOffset))
    (base, branch(5, 1.0, 13, 17, 20000000L, 29, 30000000L),
      branch(7, 2.0, 19, 17, 20000000L, 23, 40000000L))
  }

  def threeWayQ(spark: SparkSession, sfDir: String): DataFrame = {
    val (base, left, right) = threeWayBranches(spark, sfDir)
    SnapshotDiff.threeWay(base, left, right, Seq("o_orderkey"))
  }

  /** The SAME diverged branches RESOLVED prefer-left into the merged
    * snapshot (SnapshotDiff.threeWayResolve): left's deletes/updates
    * win every conflict, right's clean changes are adopted, both-side
    * inserts land once — the oracle derives the whole merged table
    * from the construction predicates (algorithm-independent truth).
    */
  def threeWayResolveQ(spark: SparkSession, sfDir: String): DataFrame = {
    val (base, left, right) = threeWayBranches(spark, sfDir)
    SnapshotDiff.threeWayResolve(base, left, right, Seq("o_orderkey"),
      preferLeft = true)
  }

  /** Column-level changelog orders→mutated-orders: status flips on %7
    * (incl. a %21 overlap with the custkey change — multi-cell keys),
    * custkey bumps on %3, a %42 null-out exercising the null→value
    * axis; only STRING/BIGINT columns diffed (the double-rendering
    * contract).
    */
  def columnDiffQ(spark: SparkSession, sfDir: String): DataFrame = {
    val base = Tables.orders(spark, sfDir)
    val k = col("o_orderkey")
    val mutated = base
      .withColumn("o_orderstatus",
        when(k % 42 === 0, lit(null: String))
          .when(k % 7 === 0, lit("X")).otherwise(col("o_orderstatus")))
      .withColumn("o_custkey",
        when(k % 3 === 0, col("o_custkey") + 1L).otherwise(col("o_custkey")))
    SnapshotDiff.columnDiff(base, mutated, Seq("o_orderkey"),
      Seq("o_orderstatus", "o_custkey", "o_orderpriority"))
  }

  /** Replication-lag report — the monitoring number a replication
    * deployment watches between cycles (the reference's update-range
    * read IS this check's first half, updates.go:44): against the
    * recorded watermark, the source's max version, the exact number
    * of rows still to pull, and the version distance. ONE
    * column-pruned partial-agg scan, single-row result; at 100 TB the
    * scan reads only the version column (plan-audited family).
    */
  /** Equi-depth chunk plan (ChangeCapture.chunkPlan) over the orders
    * pk — 16 key ranges with ~n/16 rows each, the boundaries a
    * parallel initial copy / per-chunk resync fans out over. Gated on
    * a key space with structure (o_orderkey is a strided TPC-H key,
    * so equal-width would misbalance).
    */
  def chunkPlanQ(spark: SparkSession, sfDir: String): DataFrame =
    ChangeCapture.chunkPlan(Tables.orders(spark, sfDir), "o_orderkey", 16)

  def cdcLagQ(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .filter(col("event_type") =!= "error")
      .agg(max(col("event_id")).as("max_version"),
        count(lit(1)).as("row_count"),
        sum(when(col("event_id") > W, 1L).otherwise(0L)).as("rows_behind"))
      .select(lit(W).as("watermark"), col("max_version"), col("row_count"),
        col("rows_behind"),
        (col("max_version") - lit(W)).as("lag_versions"))

  /** The column-diff changelog APPLIED BACK to the base snapshot —
    * diff → apply must reproduce the mutated table exactly (the
    * oracle IS the mutation), proving the changelog is actionable,
    * null-outs included.
    */
  def applyChangelogQ(spark: SparkSession, sfDir: String): DataFrame = {
    val base = Tables.orders(spark, sfDir)
    SnapshotDiff.applyCellChanges(base, columnDiffQ(spark, sfDir),
      Seq("o_orderkey"), Seq("o_orderstatus", "o_custkey", "o_orderpriority"))
  }

  /** Change-batch collapse: one row per PK keeping the highest version
    * (the streaming micro-batch dedup step). PK here is user_id, so a
    * real multi-row-per-key distribution: each user's latest event.
    */
  def latestByKeyQ(spark: SparkSession, sfDir: String): DataFrame =
    Merge.latestByKey(
      Tables.events(spark, sfDir).select("event_id", "user_id", "event_type", "value"),
      Seq("user_id"), "event_id")

  /** Incremental aggregate maintenance through one CDC cycle: the
    * per-customer (count, revenue) aggregate of orders maintained from
    * a change batch (price updates on every 7th order, inserts cloned
    * from every 23rd, deletes of every 31st not also updated) WITHOUT
    * rescanning the base — signed deltas folded into the stored state
    * (graft.cdc.AggMaintain). The oracle recomputes the aggregate over
    * the post-cycle table, so equality IS the maintenance proof.
    */
  def aggMaintainQ(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = Tables.orders(spark, sfDir)
    val upserts = orders.filter(expr("o_orderkey % 7 = 0"))
      .withColumn("o_totalprice", col("o_totalprice") + 10.0)
      .unionByName(orders.filter(expr("o_orderkey % 23 = 0"))
        .withColumn("o_orderkey", col("o_orderkey") + 20000000L))
    val dels = orders
      .filter(expr("o_orderkey % 31 = 0 AND o_orderkey % 7 <> 0"))
      .select("o_orderkey")
    graft.cdc.AggMaintain.maintainSumCount(spark, orders, upserts, dels,
      pkCols = Seq("o_orderkey"), grpCols = Seq("o_custkey"), valCol = "o_totalprice",
      cntCol = "n_orders", sumCol = "revenue")
      .withColumn("revenue", col("revenue").cast("double"))
  }

  /** Incremental JOIN-view maintenance through one CDC cycle touching
    * BOTH sides: the materialized orders ⋈ customer star view folded
    * forward from a fact batch (price updates on every 7th order,
    * custkey RE-HOMES to a +10M key on every 13th — danglers where no
    * such customer exists, landings where the dim insert covers it —
    * inserts cloned from every 23rd, deletes of every 31st not
    * otherwise touched) and a dim batch (segment moves on every 5th
    * customer, +10M-key inserts cloned from every 3rd, deletes of
    * every 11th not also moved — each delete CASCADES its orders out
    * of the view) — O(touched) fold, untouched view rows pass through
    * by reference (graft.cdc.JoinMaintain). The oracle recomputes the
    * join over the post-cycle tables, so hash equality IS the proof
    * that fold == rebuild, dangling/appearing rows included.
    */
  def joinMaintainQ(spark: SparkSession, sfDir: String): DataFrame =
    joinMaintainFold(spark, Tables.orders(spark, sfDir),
      Tables.customer(spark, sfDir), reHome = 10000000L, clone = 20000000L)

  /** The LEFT-OUTER (enrichment) view maintained through the SAME
    * two-sided cycle — the self-maintainable variant (the fold never
    * reads the fact base; dim deletes NULL payload out instead of
    * cascading rows, re-homed danglers stay with NULL payload). Same
    * oracle chain with a LEFT JOIN, so hash equality pins the two
    * modes' delta rules apart.
    */
  def joinMaintainOuterQ(spark: SparkSession, sfDir: String): DataFrame =
    joinMaintainFold(spark, Tables.orders(spark, sfDir),
      Tables.customer(spark, sfDir), reHome = 10000000L, clone = 20000000L,
      outer = true)

  /** The gate's fold with the synthetic-key offsets parameterized:
    * the gate uses 10M/20M (what the oracle SQL replays); BenchStress
    * passes 1e9/2e9 so stacked key-offset copies never cross-match.
    */
  private[graft] def joinMaintainFold(spark: SparkSession, orders: DataFrame,
                                      cust: DataFrame, reHome: Long,
                                      clone: Long,
                                      outer: Boolean = false): DataFrame = {
    val payload = Seq("c_name", "c_mktsegment")
    val view = graft.cdc.JoinMaintain.build(orders, cust,
      "o_custkey", "c_custkey", payload, outer)
    val fUp = orders.filter(expr("o_orderkey % 7 = 0"))
      .withColumn("o_totalprice", col("o_totalprice") + 10.0)
      .unionByName(orders
        .filter(expr("o_orderkey % 13 = 0 AND o_orderkey % 7 <> 0"))
        .withColumn("o_custkey", col("o_custkey") + reHome))
      .unionByName(orders.filter(expr("o_orderkey % 23 = 0"))
        .withColumn("o_orderkey", col("o_orderkey") + clone))
    val fDel = orders.filter(expr(
        "o_orderkey % 31 = 0 AND o_orderkey % 7 <> 0 AND o_orderkey % 13 <> 0"))
      .select("o_orderkey")
    val dUp = cust.filter(expr("c_custkey % 5 = 0"))
      .withColumn("c_mktsegment", lit("MOVED"))
      .unionByName(cust.filter(expr("c_custkey % 3 = 0"))
        .withColumn("c_custkey", col("c_custkey") + reHome))
    val dDel = cust.filter(expr("c_custkey % 11 = 0 AND c_custkey % 5 <> 0"))
      .select("c_custkey")
    graft.cdc.JoinMaintain.maintain(spark, view, orders, cust,
        fUp, fDel, dUp, dDel, Seq("o_orderkey"), "o_custkey", "c_custkey",
        payload, outer = outer)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "c_name", "c_mktsegment")
  }

  /** The OUTER fold on the CONTINUOUS path, gated end-to-end through
    * the persisted three-store layout (the ann_graph_persisted
    * lifecycle-in-a-gate convention): trigger 0 bootstraps the
    * bucketed view store from the full orders+customer feed, trigger
    * 1 folds the exact cdc_join_maintain mutation cycle, and the gate
    * reads the VIEW STORE back from parquet. Self-maintainability is
    * structural on this path — outer mode hands the fold an EMPTY
    * fact frame and probes re-homes from the view's own buckets
    * ([[graft.streaming.JoinStream.foldBatch]]) — so hash equality
    * against the cdc_join_maintain_outer oracle proves the continuous
    * folded-store read lands the identical view.
    */
  def joinStreamOuterQ(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.streaming.JoinStream
    val dir = java.nio.file.Files.createTempDirectory("graft-jso").toString
    val orders = Tables.orders(spark, sfDir)
    val cust = Tables.customer(spark, sfDir)
    val factCols = Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    val dimCols = Seq("c_custkey", "c_name", "c_mktsegment")
    val types = Map(
      "o_orderkey" -> "bigint", "o_custkey" -> "bigint",
      "o_orderstatus" -> "string", "o_totalprice" -> "double",
      "c_custkey" -> "bigint", "c_name" -> "string",
      "c_mktsegment" -> "string")
    def widen(df: DataFrame, side: String, del: Boolean, ver: Long): DataFrame =
      (factCols ++ dimCols).foldLeft(df)((acc, c) =>
          if (acc.columns.contains(c)) acc
          else acc.withColumn(c, lit(null).cast(types(c))))
        .select(lit(side).as("side") +: (factCols ++ dimCols).map(col) :+
          lit(ver).as("ver") :+ lit(del).as("del"): _*)
    def fold(batch: DataFrame, id: Long): Unit =
      JoinStream.foldBatch(spark, batch, id, s"$dir/fact", s"$dir/dim",
        s"$dir/view", Seq("o_orderkey"), "o_custkey", "c_custkey",
        factCols, dimCols, "ver", "del", nBuckets = 8, outer = true)
    fold(widen(orders.select(factCols.map(col): _*), "fact", del = false, 0L)
      .unionByName(widen(cust.select(dimCols.map(col): _*), "dim",
        del = false, 0L)), 0L)
    val fUp = orders.filter(expr("o_orderkey % 7 = 0"))
      .withColumn("o_totalprice", col("o_totalprice") + 10.0)
      .unionByName(orders
        .filter(expr("o_orderkey % 13 = 0 AND o_orderkey % 7 <> 0"))
        .withColumn("o_custkey", col("o_custkey") + 10000000L))
      .unionByName(orders.filter(expr("o_orderkey % 23 = 0"))
        .withColumn("o_orderkey", col("o_orderkey") + 20000000L))
      .select(factCols.map(col): _*)
    val fDel = orders.filter(expr(
        "o_orderkey % 31 = 0 AND o_orderkey % 7 <> 0 AND o_orderkey % 13 <> 0"))
      .select("o_orderkey")
    val dUp = cust.filter(expr("c_custkey % 5 = 0"))
      .withColumn("c_mktsegment", lit("MOVED"))
      .unionByName(cust.filter(expr("c_custkey % 3 = 0"))
        .withColumn("c_custkey", col("c_custkey") + 10000000L))
      .select(dimCols.map(col): _*)
    val dDel = cust.filter(expr("c_custkey % 11 = 0 AND c_custkey % 5 <> 0"))
      .select("c_custkey")
    fold(widen(fUp, "fact", del = false, 1L)
      .unionByName(widen(fDel, "fact", del = true, 1L))
      .unionByName(widen(dUp, "dim", del = false, 1L))
      .unionByName(widen(dDel, "dim", del = true, 1L)), 1L)
    JoinStream.readView(spark, s"$dir/view")
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "c_name", "c_mktsegment")
  }

  /** Multi-dimension STAR maintenance in ONE fold over ONE view (A46;
    * JoinMaintain.maintainStar — the k-dim composition of the A44
    * delta rules): the lineitem ⋈ part ⋈ supplier star folded through
    * one cycle touching ALL THREE sides — fact quantity updates
    * (every 7th orderkey), partkey re-homes (every 13th, danglers
    * where no such part), suppkey re-homes (every 17th), +20M-key
    * clones (every 23rd), fact deletes (every 31st not otherwise
    * touched); part brand moves / +10M clones / deletes; supplier
    * name moves / +10M clones / deletes. A row touched through BOTH
    * dims re-derives once. The oracle recomputes the post-cycle
    * three-way join, so hash equality proves fold == rebuild with the
    * per-dim rules composed — cascades, danglers, landings, re-homes
    * across two dims in one pass.
    */
  def starMaintainQ(spark: SparkSession, sfDir: String): DataFrame =
    starMaintainFold(spark,
      Tables.lineitem(spark, sfDir),
      Tables.part(spark, sfDir), Tables.supplier(spark, sfDir),
      reHome = 10000000L, clone = 20000000L)

  /** The gate's star fold with the synthetic-key offsets
    * parameterized (the joinMaintainFold convention): the gate uses
    * 10M/20M (what the oracle replays); BenchStress passes 1e9/2e9 so
    * stacked key-offset copies never cross-match.
    */
  private[graft] def starMaintainFold(spark: SparkSession, lineitem: DataFrame,
                                      part: DataFrame, supp: DataFrame,
                                      reHome: Long, clone: Long): DataFrame = {
    import graft.cdc.JoinMaintain
    import graft.cdc.JoinMaintain.StarDim
    val li = lineitem
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
        "l_quantity")
    val k = col("l_orderkey")
    val fUp = li.filter(k % 7 === 0)
      .withColumn("l_quantity", col("l_quantity") + 1.0)
      .unionByName(li.filter(k % 13 === 0 && k % 7 =!= 0)
        .withColumn("l_partkey", col("l_partkey") + reHome))
      .unionByName(li.filter(k % 17 === 0 && k % 7 =!= 0 && k % 13 =!= 0)
        .withColumn("l_suppkey", col("l_suppkey") + reHome))
      .unionByName(li.filter(k % 23 === 0)
        .withColumn("l_orderkey", k + clone))
    val fDel = li.filter(k % 31 === 0 && k % 7 =!= 0 && k % 13 =!= 0 &&
        k % 17 =!= 0)
      .select("l_orderkey", "l_linenumber")
    val pUp = part.filter(col("p_partkey") % 5 === 0)
      .withColumn("p_brand", lit("MOVED"))
      .unionByName(part.filter(col("p_partkey") % 3 === 0)
        .withColumn("p_partkey", col("p_partkey") + reHome))
    val pDel = part
      .filter(col("p_partkey") % 11 === 0 && col("p_partkey") % 5 =!= 0)
      .select("p_partkey")
    val sUp = supp.filter(col("s_suppkey") % 4 === 0)
      .withColumn("s_name", lit("MOVED"))
      .unionByName(supp.filter(col("s_suppkey") % 3 === 0)
        .withColumn("s_suppkey", col("s_suppkey") + reHome))
    val sDel = supp
      .filter(col("s_suppkey") % 7 === 0 && col("s_suppkey") % 4 =!= 0)
      .select("s_suppkey")
    val dims = Seq(
      StarDim(part, pUp, pDel, "l_partkey", "p_partkey", Seq("p_brand")),
      StarDim(supp, sUp, sDel, "l_suppkey", "s_suppkey", Seq("s_name")))
    val view = JoinMaintain.buildStar(li, dims)
    JoinMaintain.maintainStar(spark, view, li, fUp, fDel,
      Seq("l_orderkey", "l_linenumber"), dims)
  }

  /** SCD type-2 history built from the full events change feed:
    * per-user event_type version intervals, consecutive identical
    * payloads collapsed (graft.cdc.Scd2). is_current exposed as 0/1
    * (driver hash contract: NULL-free, engine-stable types).
    */
  def scd2Q(spark: SparkSession, sfDir: String): DataFrame =
    graft.cdc.Scd2.buildHistory(
      Tables.events(spark, sfDir).select("user_id", "event_id", "event_type"),
      Seq("user_id"), "event_id", Seq("event_type"))
      .withColumn("is_current", col("is_current").cast("long"))

  /** Point-in-time lookup over the SCD2 history: the state of every
    * key at version 500 — one interval-containment filter, which a
    * bucketed/Z-ordered history store answers with file skipping on
    * valid_from/valid_to min/max (never a scan of closed history).
    */
  def scd2AsofQ(spark: SparkSession, sfDir: String): DataFrame =
    graft.cdc.Scd2.asOf(
      graft.cdc.Scd2.buildHistory(
        Tables.events(spark, sfDir).select("user_id", "event_id", "event_type"),
        Seq("user_id"), "event_id", Seq("event_type")),
      version = 500L)

  /** SCD2 maintenance: history built at watermark 500, then ONE
    * change batch (500, 900] folded in via Scd2.maintain — O(touched
    * keys), untouched rows pass through. The oracle rebuilds the full
    * history over event_id <= 900 from scratch, so hash equality IS
    * the proof that incremental fold == full rebuild.
    */
  def scd2MaintainQ(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir).select("user_id", "event_id", "event_type")
    val base = graft.cdc.Scd2.buildHistory(
      ev.filter(col("event_id") <= 500), Seq("user_id"), "event_id", Seq("event_type"))
    val batch = ev.filter(col("event_id") > 500 && col("event_id") <= 900)
    graft.cdc.Scd2.maintain(base, batch, Seq("user_id"), "event_id", Seq("event_type"))
      .withColumn("is_current", col("is_current").cast("long"))
  }

  def tableLengthQ(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir).filter(col("l_discount") > 0.05)
      .agg(count(lit(1)).as("row_count"))

  /** DDL + fingerprint per table from the live Spark schemas
    * (reference schemas.go:95). Hash-gated: the oracle pins the DDL
    * render as catalog constants for the fixed test tables and has
    * DuckDB compute md5(ddl) itself, so the fingerprint column is
    * verified cross-engine rather than declared.
    */
  def schemaFingerprintQ(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.names.map { t =>
      val schema = Tables.load(spark, sfDir, t).schema
      (t, SchemaSync.ddl(t, schema), SchemaSync.fingerprint(t, schema))
    }.toDF("table_name", "ddl", "fingerprint")
  }

  /** Small-file compaction plan (A39; graft.cdc.Compaction.plan) over
    * a manifest synthesized from orders (file = orderkey DIV 64,
    * bucket = file % 8, rows = keys per file): files under the
    * 150-row threshold pack in file order into ~200-row merge groups,
    * big files pass through as keeps. One window over the
    * file-cardinality manifest — the data is never read.
    */
  def compactionPlanQ(spark: SparkSession, sfDir: String): DataFrame = {
    val manifest = graft.util.Tables.orders(spark, sfDir)
      .groupBy(expr("o_orderkey DIV 64").as("file_id"))
      .agg(count(lit(1)).as("n_rows"))
      .withColumn("bucket", pmod(col("file_id"), lit(8L)))
    Compaction.plan(manifest, "bucket", "file_id", "n_rows",
      targetRows = 200L, smallThreshold = 150L)
  }

  /** Calendar-tiered snapshot retention plan (A41;
    * graft.cdc.Retention.plan): keep dailies 7 days, weeklies 4
    * weeks, drop the rest — anchored to the NEWEST snapshot day, so
    * reruns are byte-identical. Snapshot manifest synthesized from
    * the distinct event days.
    */
  def retentionPlanQ(spark: SparkSession, sfDir: String): DataFrame =
    Retention.plan(
      Tables.events(spark, sfDir).filter(col("ts").isNotNull)
        .select(expr("unix_millis(ts) DIV 86400000").as("snap_day")),
      "snap_day", keepDailyDays = 7, keepWeeklyWeeks = 4)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "cdc_retention_plan" -> retentionPlanQ,
    "cdc_compaction_plan" -> compactionPlanQ,
    "cdc_update_range" -> updateRangeQ,
    "cdc_incremental_pull" -> incrementalPullQ,
    "cdc_merge_upsert" -> mergeUpsertQ,
    "cdc_full_copy" -> fullCopyQ,
    "cdc_full_copy_decision" -> fullCopyDecisionQ,
    "cdc_range_hash" -> rangeHashQ,
    "cdc_range_hash_fast" -> rangeHashFastQ,
    "cdc_range_diff" -> rangeDiffQ,
    "cdc_hash_bucket_diff" -> hashBucketDiffQ,
    "cdc_changed_range_resync" -> changedRangeResyncQ,
    "cdc_deleted_keys" -> deletedKeysQ,
    "cdc_snapshot_diff" -> snapshotDiffQ,
    "cdc_three_way_merge" -> threeWayQ,
    "cdc_conflict_resolve" -> threeWayResolveQ,
    "cdc_column_diff" -> columnDiffQ,
    "cdc_lag" -> cdcLagQ,
    "cdc_chunk_plan" -> chunkPlanQ,
    "cdc_apply_changelog" -> applyChangelogQ,
    "cdc_latest_by_key" -> latestByKeyQ,
    "cdc_agg_maintain" -> aggMaintainQ,
    "cdc_join_maintain" -> joinMaintainQ,
    "cdc_join_maintain_outer" -> joinMaintainOuterQ,
    "cdc_join_stream_outer" -> joinStreamOuterQ,
    "cdc_star_maintain" -> starMaintainQ,
    "cdc_scd2" -> scd2Q,
    "cdc_scd2_maintain" -> scd2MaintainQ,
    "cdc_scd2_asof" -> scd2AsofQ,
    "cdc_table_length" -> tableLengthQ,
    "cdc_schema_fingerprint" -> schemaFingerprintQ)

  private val joinMaintainCtes: String =
    """WITH fpost AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus,
        |         o_totalprice + 10.0 AS o_totalprice
        |  FROM orders WHERE o_orderkey % 7 = 0
        |  UNION ALL
        |  SELECT o_orderkey, o_custkey + 10000000, o_orderstatus, o_totalprice
        |  FROM orders WHERE o_orderkey % 13 = 0 AND o_orderkey % 7 <> 0
        |  UNION ALL
        |  SELECT o_orderkey + 20000000, o_custkey, o_orderstatus, o_totalprice
        |  FROM orders WHERE o_orderkey % 23 = 0
        |  UNION ALL
        |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        |  FROM orders WHERE o_orderkey % 7 <> 0 AND o_orderkey % 13 <> 0
        |    AND o_orderkey % 31 <> 0),
        |dpost AS (
        |  SELECT c_custkey, c_name, 'MOVED' AS c_mktsegment
        |  FROM customer WHERE c_custkey % 5 = 0
        |  UNION ALL
        |  SELECT c_custkey + 10000000, c_name, c_mktsegment
        |  FROM customer WHERE c_custkey % 3 = 0
        |  UNION ALL
        |  SELECT c_custkey, c_name, c_mktsegment
        |  FROM customer WHERE c_custkey % 5 <> 0 AND c_custkey % 11 <> 0)""".stripMargin

  private val diffCte =
    s"""WITH s AS (SELECT o_orderkey // $DCHUNK AS bucket, count(*) AS n FROM orders
       |           WHERE NOT ($delPred) GROUP BY 1),
       |     t AS (SELECT o_orderkey // $DCHUNK AS bucket, count(*) AS n FROM orders GROUP BY 1),
       |     d AS (SELECT t.bucket, coalesce(s.n, 0) AS source_keys, t.n AS target_keys
       |           FROM t LEFT JOIN s ON s.bucket = t.bucket
       |           WHERE coalesce(s.n, 0) <> t.n)""".stripMargin

  /** SCD2 full-rebuild SQL over a change-feed source expression —
    * shared by cdc_scd2 (whole feed) and cdc_scd2_maintain (feed
    * truncated at the batch horizon; comparing the incremental fold
    * against this full rebuild is the maintenance proof).
    */
  private def scd2Oracle(src: String) =
    s"""WITH ch AS (SELECT user_id, event_id, event_type,
       |  lag(event_type) OVER (PARTITION BY user_id ORDER BY event_id) AS prev
       |  FROM $src),
       |keep AS (SELECT user_id, event_id, event_type FROM ch
       |         WHERE prev IS NULL OR event_type <> prev),
       |h AS (SELECT user_id, event_type, event_id AS valid_from,
       |  coalesce(lead(event_id) OVER (PARTITION BY user_id ORDER BY event_id),
       |           9223372036854775807) AS valid_to
       |  FROM keep)
       |SELECT user_id, event_type, valid_from, valid_to,
       |  CAST(CASE WHEN valid_to = 9223372036854775807 THEN 1 ELSE 0 END AS BIGINT) AS is_current
       |FROM h""".stripMargin

  val oracles: Map[String, String] = Map(
    "cdc_retention_plan" ->
      """WITH d AS (SELECT DISTINCT epoch_ms(ts) // 86400000 AS snap_day
        |      FROM events WHERE ts IS NOT NULL),
        |a AS (SELECT max(snap_day) AS mx FROM d),
        |w AS (SELECT snap_day, mx - snap_day AS age_days,
        |        snap_day // 7 AS wk FROM d, a),
        |m AS (SELECT wk, max(snap_day) AS wk_max FROM w GROUP BY 1)
        |SELECT w.snap_day, CAST(w.age_days AS BIGINT) AS age_days,
        |  CASE WHEN w.age_days < 7 THEN 'keep-daily'
        |       WHEN w.snap_day = m.wk_max AND w.age_days < 28
        |            THEN 'keep-weekly'
        |       ELSE 'drop' END AS action
        |FROM w JOIN m USING (wk)""".stripMargin,
    "cdc_compaction_plan" ->
      """WITH m AS (SELECT o_orderkey // 64 AS file_id,
        |        CAST(count(*) AS BIGINT) AS n_rows,
        |        (o_orderkey // 64) % 8 AS bucket
        |      FROM orders GROUP BY 1),
        |small AS (SELECT * FROM m WHERE n_rows < 150),
        |big AS (SELECT * FROM m WHERE n_rows >= 150),
        |g AS (SELECT bucket, file_id, n_rows,
        |        CAST(sum(n_rows) OVER (PARTITION BY bucket ORDER BY file_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        |      FROM small),
        |mg AS (SELECT bucket, (cum - n_rows) // 200 AS grp,
        |        CAST(count(*) AS BIGINT) AS n_files,
        |        CAST(sum(n_rows) AS BIGINT) AS rows_total,
        |        min(file_id) AS file_lo, max(file_id) AS file_hi
        |      FROM g GROUP BY 1, 2)
        |SELECT bucket,
        |  CASE WHEN n_files > 1 THEN 'merge' ELSE 'keep' END AS action,
        |  n_files, rows_total, file_lo, file_hi
        |FROM mg
        |UNION ALL
        |SELECT bucket, 'keep', 1, n_rows, file_id, file_id FROM big""".stripMargin,
    "cdc_scd2" -> scd2Oracle("events"),
    "cdc_scd2_asof" ->
      s"""SELECT user_id, event_type, valid_from, valid_to
         |FROM (${scd2Oracle("events")})
         |WHERE valid_from <= 500 AND 500 < valid_to""".stripMargin,
    "cdc_scd2_maintain" ->
      scd2Oracle("(SELECT * FROM events WHERE event_id <= 900)"),
    "cdc_update_range" ->
      """SELECT count(*) AS row_count, max(event_id) AS max_version
        |FROM events WHERE event_type <> 'error'""".stripMargin,
    // replays the equi-depth rank walk with a plain cumulative sum
    // over distinct keys — same ((cum-cnt)·16) div n bin arithmetic
    "cdc_chunk_plan" ->
      """WITH k AS (SELECT o_orderkey AS k, CAST(count(*) AS BIGINT) AS cnt
        |      FROM orders GROUP BY 1),
        |w AS (SELECT k, cnt,
        |        CAST(sum(cnt) OVER (ORDER BY k) AS BIGINT) AS cum,
        |        CAST((SELECT sum(cnt) FROM k) AS BIGINT) AS n
        |      FROM k)
        |SELECT ((cum - cnt) * 16) // n AS chunk_id,
        |  CAST(sum(cnt) AS BIGINT) AS n_rows,
        |  min(k) AS lo_key, max(k) AS hi_key
        |FROM w GROUP BY 1""".stripMargin,
    "cdc_incremental_pull" ->
      s"""SELECT event_id, user_id, event_type, value FROM events
         |WHERE event_id > $W AND event_type <> 'error'""".stripMargin,
    "cdc_merge_upsert" ->
      """WITH upd AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
        |         'UPDATED' AS o_orderpriority
        |  FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01')
        |SELECT * FROM upd
        |UNION ALL
        |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        |FROM orders WHERE o_orderkey % 10 <> 0
        |  AND o_orderkey NOT IN (SELECT o_orderkey FROM upd)""".stripMargin,
    "cdc_full_copy" ->
      "SELECT * FROM lineitem WHERE l_shipdate >= TIMESTAMP '1998-06-01'",
    "cdc_full_copy_decision" ->
      """WITH src AS (SELECT count(*) AS source_rows FROM events WHERE event_type <> 'error'),
        |     tgt AS (SELECT count(*) AS target_rows FROM events
        |             WHERE event_type <> 'error' AND event_id % 3 = 0)
        |SELECT 'events@0.5' AS table_name, source_rows, target_rows,
        |       target_rows < source_rows * 0.5 AS full_copy FROM src, tgt
        |UNION ALL
        |SELECT 'events@0.2', source_rows, target_rows,
        |       target_rows < source_rows * 0.2 FROM src, tgt""".stripMargin,
    "cdc_range_hash" ->
      s"""SELECT o_orderkey // $CHUNK AS bucket, count(*) AS n_keys,
         |  md5(string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY o_orderkey)) AS key_hash
         |FROM orders GROUP BY 1""".stripMargin,
    "cdc_range_hash_fast" ->
      s"""SELECT o_orderkey // $CHUNK AS bucket, count(*) AS n_keys,
         |  CAST(CAST(sum(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT) AS BIGINT) AS VARCHAR) AS key_hash
         |FROM orders GROUP BY 1""".stripMargin,
    "cdc_range_diff" ->
      s"""$diffCte
         |SELECT bucket, source_keys, target_keys FROM d""".stripMargin,
    "cdc_changed_range_resync" ->
      s"""$diffCte
         |SELECT o.* FROM orders o
         |WHERE NOT ($delPred)
         |  AND o.o_orderkey // $DCHUNK IN (SELECT bucket FROM d)""".stripMargin,
    "cdc_deleted_keys" ->
      s"SELECT o_orderkey FROM orders WHERE $delPred",
    "cdc_hash_bucket_diff" ->
      """WITH t AS (SELECT coalesce(md5(l_orderkey::VARCHAR), 'N') || '|' ||
        |                  coalesce(md5(l_linenumber::VARCHAR), 'N') AS k,
        |                  (l_orderkey % 89 = 0 AND l_linenumber = 1) AS gone
        |           FROM lineitem),
        |b AS (SELECT ('0x' || substr(md5(k), 1, 15))::BIGINT % 64 AS bucket,
        |             ('0x' || substr(md5(k), 1, 8))::BIGINT AS kh, gone FROM t),
        |s AS (SELECT bucket, count(*) AS source_keys, sum(kh)::BIGINT AS h
        |      FROM b WHERE NOT gone GROUP BY 1),
        |g AS (SELECT bucket, count(*) AS target_keys, sum(kh)::BIGINT AS h
        |      FROM b GROUP BY 1)
        |SELECT g.bucket, coalesce(s.source_keys, 0) AS source_keys, g.target_keys
        |FROM g LEFT JOIN s USING (bucket)
        |WHERE s.h IS NULL OR s.h <> g.h""".stripMargin,
    "cdc_snapshot_diff" ->
      """SELECT o_orderkey, 'delete' AS change_type FROM orders WHERE o_orderkey % 13 = 0
        |UNION ALL
        |SELECT o_orderkey, 'update' FROM orders WHERE o_orderkey % 13 <> 0 AND o_orderkey % 11 = 0
        |UNION ALL
        |SELECT o_orderkey + 10000000, 'insert' FROM orders WHERE o_orderkey % 17 = 0""".stripMargin,
    // outcomes derived from the branch-construction predicates: the
    // hash-classification must reproduce set logic exactly
    "cdc_three_way_merge" ->
      """WITH b AS (SELECT o_orderkey AS k,
        |        o_orderkey % 13 = 0 AS ld, o_orderkey % 19 = 0 AS rd,
        |        o_orderkey % 13 <> 0 AND o_orderkey % 5 = 0 AS lu,
        |        o_orderkey % 19 <> 0 AND o_orderkey % 7 = 0 AS ru
        |      FROM orders)
        |SELECT k AS o_orderkey,
        |  CASE WHEN (ld OR lu) AND NOT (rd OR ru) THEN 'left'
        |       WHEN (rd OR ru) AND NOT (ld OR lu) THEN 'right'
        |       WHEN ld AND rd THEN 'agree'
        |       ELSE 'conflict' END AS outcome
        |FROM b WHERE (ld OR lu) OR (rd OR ru)
        |UNION ALL
        |SELECT o_orderkey + 20000000, 'agree' FROM orders WHERE o_orderkey % 17 = 0
        |UNION ALL
        |SELECT o_orderkey + 30000000, 'left' FROM orders WHERE o_orderkey % 29 = 0
        |UNION ALL
        |SELECT o_orderkey + 40000000, 'right' FROM orders WHERE o_orderkey % 23 = 0""".stripMargin,
    // prefer-left resolution derived from the construction predicates:
    // ld(k%13) -> absent (left delete wins conflicts too); else
    // lu(k%5) -> +1.0 (left change wins); else clean right delete
    // (k%19) -> absent; else ru(k%7) -> +2.0; else base. Inserts land
    // once each (both-side %17 agree, one-side %29/%23 clean).
    "cdc_apply_changelog" ->
      """SELECT o_orderkey, o_custkey + CASE WHEN o_orderkey % 3 = 0
        |    THEN 1 ELSE 0 END AS o_custkey,
        |  CASE WHEN o_orderkey % 42 = 0 THEN NULL
        |       WHEN o_orderkey % 7 = 0 THEN 'X'
        |       ELSE o_orderstatus END AS o_orderstatus,
        |  o_totalprice, o_orderdate, o_orderpriority
        |FROM orders""".stripMargin,
    "cdc_lag" ->
      """SELECT 500 AS watermark,
        |  max(event_id) AS max_version,
        |  count(*) AS row_count,
        |  CAST(sum(CASE WHEN event_id > 500 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS rows_behind,
        |  max(event_id) - 500 AS lag_versions
        |FROM events WHERE event_type <> 'error'""".stripMargin,
    "cdc_column_diff" ->
      """WITH m AS (SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 42 = 0 THEN NULL
        |         WHEN o_orderkey % 7 = 0 THEN 'X'
        |         ELSE o_orderstatus END AS n_status,
        |    CASE WHEN o_orderkey % 3 = 0 THEN o_custkey + 1
        |         ELSE o_custkey END AS n_custkey,
        |    o_orderstatus, o_custkey, o_orderpriority
        |  FROM orders)
        |SELECT o_orderkey, 'o_orderstatus' AS column_name,
        |  o_orderstatus AS old_value, n_status AS new_value
        |FROM m WHERE n_status IS DISTINCT FROM o_orderstatus
        |UNION ALL
        |SELECT o_orderkey, 'o_custkey', o_custkey::VARCHAR,
        |  n_custkey::VARCHAR
        |FROM m WHERE n_custkey <> o_custkey""".stripMargin,
    "cdc_conflict_resolve" ->
      """WITH kept AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus,
        |    CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 1.0
        |         WHEN o_orderkey % 19 <> 0 AND o_orderkey % 7 = 0
        |           THEN o_totalprice + 2.0
        |         ELSE o_totalprice END AS o_totalprice,
        |    o_orderdate, o_orderpriority
        |  FROM orders
        |  WHERE o_orderkey % 13 <> 0
        |    AND NOT (o_orderkey % 5 <> 0 AND o_orderkey % 19 = 0))
        |SELECT * FROM kept
        |UNION ALL SELECT o_orderkey + 20000000, o_custkey, o_orderstatus,
        |  o_totalprice, o_orderdate, o_orderpriority
        |FROM orders WHERE o_orderkey % 17 = 0
        |UNION ALL SELECT o_orderkey + 30000000, o_custkey, o_orderstatus,
        |  o_totalprice, o_orderdate, o_orderpriority
        |FROM orders WHERE o_orderkey % 29 = 0
        |UNION ALL SELECT o_orderkey + 40000000, o_custkey, o_orderstatus,
        |  o_totalprice, o_orderdate, o_orderpriority
        |FROM orders WHERE o_orderkey % 23 = 0""".stripMargin,
    "cdc_latest_by_key" ->
      """SELECT event_id, user_id, event_type, value FROM events
        |QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) = 1""".stripMargin,
    "cdc_agg_maintain" ->
      """WITH upd AS (
        |  SELECT o_orderkey, o_custkey, o_totalprice + 10.0 AS v
        |  FROM orders WHERE o_orderkey % 7 = 0),
        |ins AS (
        |  SELECT o_orderkey + 20000000 AS o_orderkey, o_custkey, o_totalprice AS v
        |  FROM orders WHERE o_orderkey % 23 = 0),
        |final AS (
        |  SELECT o_custkey, o_totalprice AS v FROM orders
        |  WHERE o_orderkey % 7 <> 0 AND o_orderkey % 31 <> 0
        |  UNION ALL SELECT o_custkey, v FROM upd
        |  UNION ALL SELECT o_custkey, v FROM ins)
        |SELECT o_custkey, count(*) AS n_orders,
        |       CAST(sum(CAST(v AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM final GROUP BY 1""".stripMargin,
    "cdc_join_maintain" ->
      s"""$joinMaintainCtes
        |SELECT f.o_orderkey, f.o_custkey, f.o_orderstatus, f.o_totalprice,
        |       d.c_name, d.c_mktsegment
        |FROM fpost f JOIN dpost d ON f.o_custkey = d.c_custkey""".stripMargin,
    "cdc_join_maintain_outer" ->
      s"""$joinMaintainCtes
        |SELECT f.o_orderkey, f.o_custkey, f.o_orderstatus, f.o_totalprice,
        |       d.c_name, d.c_mktsegment
        |FROM fpost f LEFT JOIN dpost d ON f.o_custkey = d.c_custkey""".stripMargin,
    // the streaming outer fold converges to the SAME post-state view —
    // one oracle, two engines' worth of proof (batch fold + folded store)
    "cdc_join_stream_outer" ->
      s"""$joinMaintainCtes
        |SELECT f.o_orderkey, f.o_custkey, f.o_orderstatus, f.o_totalprice,
        |       d.c_name, d.c_mktsegment
        |FROM fpost f LEFT JOIN dpost d ON f.o_custkey = d.c_custkey""".stripMargin,
    "cdc_star_maintain" ->
      """WITH fpost AS (
        |  SELECT l_orderkey, l_linenumber,
        |    CASE WHEN l_orderkey % 13 = 0 AND l_orderkey % 7 <> 0
        |         THEN l_partkey + 10000000 ELSE l_partkey END AS l_partkey,
        |    CASE WHEN l_orderkey % 17 = 0 AND l_orderkey % 7 <> 0
        |           AND l_orderkey % 13 <> 0
        |         THEN l_suppkey + 10000000 ELSE l_suppkey END AS l_suppkey,
        |    CASE WHEN l_orderkey % 7 = 0
        |         THEN l_quantity + 1.0 ELSE l_quantity END AS l_quantity
        |  FROM lineitem
        |  WHERE NOT (l_orderkey % 31 = 0 AND l_orderkey % 7 <> 0
        |             AND l_orderkey % 13 <> 0 AND l_orderkey % 17 <> 0)
        |  UNION ALL
        |  SELECT l_orderkey + 20000000, l_linenumber, l_partkey, l_suppkey,
        |         l_quantity
        |  FROM lineitem WHERE l_orderkey % 23 = 0),
        |ppost AS (
        |  SELECT p_partkey,
        |    CASE WHEN p_partkey % 5 = 0 THEN 'MOVED' ELSE p_brand END AS p_brand
        |  FROM part WHERE NOT (p_partkey % 11 = 0 AND p_partkey % 5 <> 0)
        |  UNION ALL
        |  SELECT p_partkey + 10000000, p_brand FROM part WHERE p_partkey % 3 = 0),
        |spost AS (
        |  SELECT s_suppkey,
        |    CASE WHEN s_suppkey % 4 = 0 THEN 'MOVED' ELSE s_name END AS s_name
        |  FROM supplier WHERE NOT (s_suppkey % 7 = 0 AND s_suppkey % 4 <> 0)
        |  UNION ALL
        |  SELECT s_suppkey + 10000000, s_name FROM supplier WHERE s_suppkey % 3 = 0)
        |SELECT f.l_orderkey, f.l_linenumber, f.l_partkey, f.l_suppkey,
        |       f.l_quantity, p.p_brand, s.s_name
        |FROM fpost f JOIN ppost p ON f.l_partkey = p.p_partkey
        |             JOIN spost s ON f.l_suppkey = s.s_suppkey""".stripMargin,
    "cdc_table_length" ->
      "SELECT count(*) AS row_count FROM lineitem WHERE l_discount > 0.05",
    // catalog constants for the fixed test tables; DuckDB computes the
    // md5 fingerprint from the same text Spark renders, so the
    // fingerprint column is a real cross-engine check
    "cdc_schema_fingerprint" ->
      """WITH t(table_name, ddl) AS (VALUES
        | ('customer', 'create table customer(c_custkey bigint null,c_name varchar null,c_nationkey int null,c_acctbal double null,c_mktsegment varchar null);'),
        | ('documents', 'create table documents(doc_id bigint null,text varchar null,lang varchar null,source varchar null,n_chars bigint null);'),
        | ('embeddings', 'create table embeddings(vec_id bigint null,embedding real[] null,label int null);'),
        | ('events', 'create table events(event_id bigint null,ts timestamp null,user_id bigint null,event_type varchar null,value double null,props varchar null);'),
        | ('lineitem', 'create table lineitem(l_orderkey bigint null,l_partkey bigint null,l_suppkey bigint null,l_linenumber int null,l_quantity double null,l_extendedprice double null,l_discount double null,l_tax double null,l_returnflag varchar null,l_linestatus varchar null,l_shipdate timestamp null);'),
        | ('nation', 'create table nation(n_nationkey int null,n_name varchar null,n_regionkey int null);'),
        | ('orders', 'create table orders(o_orderkey bigint null,o_custkey bigint null,o_orderstatus varchar null,o_totalprice double null,o_orderdate timestamp null,o_orderpriority varchar null);'),
        | ('part', 'create table part(p_partkey bigint null,p_name varchar null,p_brand varchar null,p_type varchar null,p_size int null,p_retailprice double null);'),
        | ('region', 'create table region(r_regionkey int null,r_name varchar null);'),
        | ('supplier', 'create table supplier(s_suppkey bigint null,s_name varchar null,s_nationkey int null,s_acctbal double null);'))
        |SELECT table_name, ddl, md5(ddl) AS fingerprint FROM t""".stripMargin)
}
