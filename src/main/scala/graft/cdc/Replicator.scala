package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-table replication settings (reference: internal/config.go).
  *
  * `where` is an optional SQL predicate (the reference's filtered
  * tables); `uses` lists tables the predicate depends on, validated
  * for cycles exactly like the reference's validationStatus machine
  * (job.go:96).
  */
case class TableConfig(
    name: String,
    primaryKeys: Seq[String],
    versionColumn: String,
    where: Option[String] = None,
    uses: Seq[String] = Nil)

/** Job-level knobs (reference: internal/config.go, sslr.json).
  * `updateChunkSize` maps to the incremental write's partition sizing;
  * `deleteChunkSize` is the range-hash bucket width. WITHIN a cycle,
  * throttling maps to Spark's own admission controls
  * (maxFilesPerTrigger when streaming, AQE partition sizing when
  * batch) — a cluster engine throttles by sizing parallelism, not by
  * sleeping a single connection; BETWEEN cycles the CLI additionally
  * enforces the reference's utilization-budget sleep
  * (`graft.Replicate.throttleWaitMs`).
  */
case class ReplicationConfig(
    tables: Seq[TableConfig],
    fullCopyThreshold: Double = 0.5,
    syncUpdates: Boolean = true,
    syncDeletes: Boolean = true,
    resyncOnSchemaChange: Boolean = false,
    updateChunkSize: Int = 10000,
    deleteChunkSize: Long = 50000,
    copyChunks: Int = 0)

/** End-to-end replication job between two [[TableStore]]s — the
  * Spark-native Job.Run (reference: internal/job.go:51).
  *
  * Stores are parquet directories in the specs ([[ParquetStore]]) or
  * databases ([[JdbcStore]], the reference's actual medium). Each
  * cycle: validate (dependency cycles, schema drift, where-clause
  * drift) → update (watermark incremental pull + upsert, or full copy
  * when stale per fullCopyThreshold) → delete-sync (range-hash diff +
  * changed-range reload). State (last seen version + where clause per
  * table) persists in a StateStore at the sink's state path, like the
  * reference's __sslr_state.
  */
class Replicator(spark: SparkSession, cfg: ReplicationConfig,
                 source: TableStore, sink: TableStore) {

  /** Convenience: both ends are parquet directories. */
  def this(spark: SparkSession, cfg: ReplicationConfig,
           sourceDir: String, targetDir: String) =
    this(spark, cfg, new ParquetStore(spark, sourceDir),
      new ParquetStore(spark, targetDir))

  val state = new StateStore(spark, sink.statePath)

  private def readSource(t: TableConfig): DataFrame = {
    val df = source.read(t.name)
    t.where.map(w => df.filter(expr(w))).getOrElse(df)
  }

  private def targetExists(t: String): Boolean = sink.exists(t)

  private def readTarget(t: String): DataFrame = sink.read(t)

  private def writeTarget(t: String, df: DataFrame): Unit = sink.write(t, df)

  /** Tables whose validation found drift requiring a full resync. */
  private var forceSync = Set.empty[String]

  // -- validate ------------------------------------------------------

  /** Cycle-checked dependency validation (reference job.go:96-160). */
  def validateTables(): Unit = {
    var status = Map.empty[String, String] // unknown -> validating -> valid
    def validate(name: String): Unit = {
      if (status.get(name).contains("valid")) return
      if (status.get(name).contains("validating"))
        throw new IllegalStateException("filtered table dependency loop")
      status += name -> "validating"
      val t = cfg.tables.find(_.name == name)
        .getOrElse(throw new IllegalArgumentException(s"unknown table $name"))
      t.uses.foreach(validate)

      val srcSchema = source.read(name).schema
      val tgtSchema = if (targetExists(name)) Some(readTarget(name).schema) else None
      SchemaSync.decide(SchemaSync.compare(name, srcSchema, tgtSchema),
          cfg.resyncOnSchemaChange) match {
        case SchemaSync.Abort =>
          throw new IllegalStateException(s"schema mismatch for table $name")
        case SchemaSync.ForceResync => forceSync += name
        case _ => ()
      }

      // where-clause drift (reference job.go:180)
      val st = state.get(name)
      val where = t.where.getOrElse("")
      if (st.isEmpty) state.setWhere(name, where)
      else if (st.whereClause != where) {
        if (cfg.resyncOnSchemaChange) { forceSync += name; state.setWhere(name, where) }
        else throw new IllegalStateException(
          s"filtered table $name where clause changed without resyncOnSchemaChange")
      }
      status += name -> "valid"
    }
    cfg.tables.foreach(t => validate(t.name))
  }

  // -- update --------------------------------------------------------

  def updateTable(t: TableConfig): Unit = {
    val src = readSource(t)
    val version = col(t.versionColumn).cast("long")
    val st = state.get(t.name)

    val Array(srcCount, maxVersion) = {
      val r = ChangeCapture.updateRange(src, version).head()
      Array(r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }

    val needFull = forceSync.contains(t.name) || st.lastSeenVersion == 0L || !targetExists(t.name) || {
      // the state-recorded count is the cheap path: counting a large
      // object-store target on EVERY poll cycle is O(files) listing
      // I/O; the recorded number is exact because this job is the
      // target's only writer (checkpoint single-writer rule)
      val tgtCount =
        if (st.targetRows >= 0) st.targetRows else readTarget(t.name).count()
      tgtCount < srcCount * cfg.fullCopyThreshold
    }

    // updateChunkSize is the reference's rows-per-chunk extraction
    // bound (updates.go:68); the Spark analog is output partition
    // sizing — each written partition carries ~chunkSize rows, hashed
    // by PK so the layout is stable across cycles. (A bucketed sink
    // sizes by its bucket count instead — the layout IS the chunking.)
    val parts = math.max(1,
      math.ceil(srcCount.toDouble / cfg.updateChunkSize).toInt)
    val byPk = t.primaryKeys.map(col(_))
    if (needFull) {
      // copyChunks > 1 on a JDBC source with a single integer pk
      // routes the full-copy extraction through the A38 chunk plan:
      // one bounded connection per equi-depth chunk instead of the
      // reference's single streaming connection (copy.go:11)
      val copySrc = (source, t.primaryKeys) match {
        case (j: JdbcStore, Seq(pk)) if cfg.copyChunks > 1 =>
          val df = j.readChunked(t.name, pk, cfg.copyChunks)
          t.where.map(w => df.filter(expr(w))).getOrElse(df)
        case _ => src
      }
      sink match {
        case b: BucketedParquetStore =>
          b.writeFull(t.name, ChangeCapture.fullCopy(copySrc), t.primaryKeys)
        case _ =>
          writeTarget(t.name, ChangeCapture.fullCopy(copySrc).repartition(parts, byPk: _*))
      }
      state.setTargetRows(t.name, srcCount) // full copy: count known for free
    } else {
      // pull bounded to the recorded maxVersion: the range and the
      // watermark we persist must describe the same set of rows even
      // if the source gains rows between the two actions (live feeds;
      // see ChangeCapture.incrementalPull on snapshot isolation).
      // eager truncation: the change batch feeds up to four actions
      // (emptiness, affected-bucket collect, both merge sides) — ONE
      // source extraction, not four (decisive on a JDBC source, and
      // the reads can't disagree on a live one). Durable under
      // spark.graft.checkpointDir: an executor loss mid-merge then
      // re-reads the batch from storage instead of re-querying a
      // source that has already moved past the recorded watermark.
      val changes = graft.util.Lineage.truncate(ChangeCapture.incrementalPull(
        src, version, st.lastSeenVersion, upperBound = Some(maxVersion)))
      if (!changes.isEmpty) {
        sink match {
          case b: BucketedParquetStore =>
            // O(batch) merge: read ONLY the partitions the change batch
            // touches (partition-pruned scan) and swap only those back
            b.upsert(t.name, changes, t.primaryKeys)
          case _ =>
            writeTarget(t.name,
              Merge.upsert(readTarget(t.name), changes, t.primaryKeys)
                .repartition(parts, byPk: _*))
        }
        // one post-write metadata count per ACTUAL write (idle cycles
        // never touch the target at all)
        state.setTargetRows(t.name, readTarget(t.name).count())
      }
    }
    state.setVersion(t.name, maxVersion)
  }

  // -- deletes -------------------------------------------------------

  def syncDeletes(t: TableConfig): Unit = sink match {
    case b: BucketedParquetStore =>
      // Bucket-aligned delete sync: the diff's hash buckets ARE the
      // sink's storage partitions, so "divergent bucket" maps 1:1 to
      // "partition to reload" — rewrite exactly those directories,
      // O(divergence) I/O instead of a full-table stage-and-swap.
      // A delete-ONLY cycle never passes through the upsert self-heal,
      // so align a stale/changed bucket layout here first — the diff
      // below assumes diff buckets == storage partitions.
      b.ensureLayout(t.name, t.primaryKeys)
      val src = readSource(t)
      val tgt = readTarget(t.name)
      val diff = RangeHashDiff.hashBucketDiff(src, tgt, t.primaryKeys, b.nBuckets)
      if (!diff.isEmpty) {
        val affected = diff.select("bucket").collect().map(_.getLong(0).toInt).toSeq
        val reload = RangeHashDiff.changedHashBucketRows(src, diff, t.primaryKeys, b.nBuckets)
        // clearBuckets handles buckets whose source rows vanished
        // entirely (no staged dir to swap in — just drop the partition)
        b.overwriteBuckets(t.name, reload, t.primaryKeys, clearBuckets = affected)
        state.setTargetRows(t.name, readTarget(t.name).count())
      }
    case _ => syncDeletesFullRewrite(t)
  }

  private def syncDeletesFullRewrite(t: TableConfig): Unit = {
    val src = readSource(t)
    val tgt = readTarget(t.name)
    if (t.primaryKeys.size == 1) {
      // single numeric pk: contiguous value-range buckets (reference
      // semantics, deletes.go:160 — reloads are contiguous ranges)
      val pk = t.primaryKeys.head
      val diff = RangeHashDiff.diffBuckets(src, tgt, pk, cfg.deleteChunkSize)
      if (!diff.isEmpty) {
        val cleaned = tgt.join(
          broadcast(diff.select("bucket")),
          expr(s"cast(`$pk` as bigint) div ${cfg.deleteChunkSize}L") === col("bucket"),
          "left_anti")
        val reloaded = RangeHashDiff.changedRangeRows(src, diff, pk, cfg.deleteChunkSize)
        writeTarget(t.name, cleaned.unionByName(reloaded))
        state.setTargetRows(t.name, readTarget(t.name).count())
      }
    } else {
      // composite pk: hash buckets — any key shape, same 2-scan diff
      val nBuckets = math.max(1, (cfg.deleteChunkSize / 16).toInt)
      val diff = RangeHashDiff.hashBucketDiff(src, tgt, t.primaryKeys, nBuckets)
      if (!diff.isEmpty) {
        val cleaned = tgt
          .withColumn("bucket", pmod(
            graft.util.Hashing.portableHash64(RangeHashDiff.pkTuple(t.primaryKeys)),
            lit(nBuckets.toLong)))
          .join(broadcast(diff.select("bucket")), Seq("bucket"), "left_anti")
          .drop("bucket")
        val reloaded = RangeHashDiff.changedHashBucketRows(src, diff, t.primaryKeys, nBuckets)
        writeTarget(t.name, cleaned.unionByName(reloaded))
        state.setTargetRows(t.name, readTarget(t.name).count())
      }
    }
  }

  /** One full sync cycle: validate → update → delete-sync. Tables
    * sync CONCURRENTLY (they touch disjoint paths and the StateStore
    * serializes its own writes) — the reference is sequential only
    * because it owns a single database connection; a cluster engine
    * overlaps one table's shuffle with another's scan.
    */
  def run(): Unit = {
    validateTables()
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(4, math.max(1, cfg.tables.size)))
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val jobs = cfg.tables.map { t => Future {
        if (cfg.syncUpdates) updateTable(t)
        if (cfg.syncDeletes && targetExists(t.name)) syncDeletes(t)
      }}
      Await.result(Future.sequence(jobs), Duration.Inf)
    } finally pool.shutdown()
    forceSync = Set.empty
  }

  /** Continuous polling mode (the reference's `-c` flag, main.go):
    * repeat sync cycles with a pause between them, up to `maxCycles`
    * (bounded for tests; pass Int.MaxValue to run until error).
    * `afterCycle(n)` runs after each completed cycle — a hook for
    * metrics or test mutation. Returns cycles completed. For a
    * push-based low-latency feed use `streaming.CdcStream` instead;
    * this mirrors the reference's poll loop for sources that only
    * support snapshot reads.
    */
  def runContinuous(pollIntervalMs: Long, maxCycles: Int,
                    afterCycle: Int => Unit = _ => ()): Int = {
    var n = 0
    while (n < maxCycles) {
      run()
      n += 1
      afterCycle(n)
      if (n < maxCycles && pollIntervalMs > 0) Thread.sleep(pollIntervalMs)
    }
    n
  }
}
