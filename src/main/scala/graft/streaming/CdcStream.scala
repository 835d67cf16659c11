package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.cdc.Merge

/** Streaming CDC: the continuous (`-c`) mode of the reference
  * (main.go:60, polling loop) re-expressed as Structured Streaming.
  *
  * The reference polls the source and applies chunked upserts; here the
  * change feed is a file stream (new parquet files landing in the
  * source directory — the cluster-world shape of a CDC feed) and each
  * micro-batch applies the same Merge.upsert used in batch mode via
  * foreachBatch. Checkpointing replaces the state table for stream
  * progress; `maxFilesPerTrigger` is the throttle knob
  * (reference: throttlePercentage).
  *
  * At scale the target is hash-bucket partitioned (`nBuckets`): each
  * micro-batch reads and rewrites ONLY the partitions its keys hash
  * into — O(batch) I/O per trigger. A flat parquet target (the
  * stage-and-swap branch) remains for small tables; a transactional
  * table format would replace the swap with MERGE INTO.
  */
object CdcStream {

  /** Continuous upsert of a file-based change feed into a parquet
    * target. Returns the running query; callers own its lifecycle.
    *
    * A micro-batch can carry SEVERAL change rows for one PK (two feed
    * files landing in one trigger), so each batch is collapsed to one
    * row per PK before the upsert: by highest `versionColumn` when
    * given (last-writer-wins), else by an arbitrary-but-deterministic
    * struct max over the payload — pass the version column whenever
    * the feed has one.
    *
    * Schema drift (`onSchemaDrift`): the file source pins the feed
    * schema at start, so a mid-stream source DDL change would
    * otherwise be INVISIBLE — added columns silently read as dropped,
    * dropped columns as nulls, type changes as read errors deep in
    * the merge. Instead each trigger compares the batch's ACTUAL
    * parquet footer schema (re-read from the trigger's input files,
    * mergeSchema across them) against the live target and routes the
    * drift through the same policy switch the batch Replicator uses
    * ([[graft.cdc.SchemaSync.decide]], mirroring the reference's
    * resyncOnSchemaChange):
    *   - `"abort"` (default — the reference's errSchemaMismatch):
    *     fail the stream loudly with both canonical DDLs; the
    *     checkpoint replays the batch after the operator intervenes.
    *   - `"resync"`: evolve the target in place — existing rows are
    *     projected onto the new schema (added columns null, dropped
    *     columns removed, matching names cast) via one staged full
    *     rewrite, then the batch upserts normally. O(target) once per
    *     drift EVENT, never per trigger (the next compare is InSync).
    *   - `"ignore"`: round-10 behavior, no footer read.
    * The drift check costs, per trigger: one column-pruned pass over
    * the batch to collect its distinct file paths (no data columns
    * are read — the metadata column is a per-file constant) plus one
    * footer read per file. A batch mixing pre- and post-drift files
    * with an incompatible type change fails the mergeSchema read —
    * loudly, by design.
    */
  def upsertStream(spark: SparkSession, sourceDir: String, targetPath: String,
                   checkpoint: String, pkCols: Seq[String],
                   maxFilesPerTrigger: Int = 10,
                   versionColumn: Option[String] = None,
                   nBuckets: Option[Int] = None,
                   feedSchema: Option[org.apache.spark.sql.types.StructType] = None,
                   onSchemaDrift: String = "abort"): StreamingQuery = {
    require(Set("ignore", "abort", "resync")(onSchemaDrift),
      s"onSchemaDrift must be ignore|abort|resync, got $onSchemaDrift")
    val schema = graft.util.Fs.feedSchema(spark, sourceDir, feedSchema)
    val raw = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(sourceDir)
    // the drift check needs the trigger's file list, and the batch
    // DataFrame foreachBatch hands over reports no inputFiles — ride
    // the file-source metadata column through instead
    val feed =
      if (onSchemaDrift == "ignore") raw
      else raw.withColumn(SrcFileCol, col("_metadata.file_path"))

    feed.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime("1 second"))
      .foreachBatch { (pinned: DataFrame, _: Long) =>
        // An EMPTY first micro-batch must not write at all: a zero-row
        // overwrite leaves a schema-less shell (_SUCCESS only) that
        // flips the exists gates below, after which every later merge
        // fails to infer the parquet schema and permanently wedges the
        // stream — replays hit the same error. (Inverted guard, NOT an
        // early return: `return` in a lambda is a non-local return.)
        if (!pinned.isEmpty) {
          import graft.cdc.BucketedLayout
          // Heal interrupted swaps BEFORE anything reads the target —
          // including the drift compare: a swap that crashed between
          // delete and rename leaves the target missing, and a drift
          // check against the void would route a post-drift replay
          // down CreateTarget while recovery then restores the OLD
          // schema underneath it.
          nBuckets match {
            case Some(_) => BucketedLayout.recoverSwap(spark, targetPath)
            case None =>
              graft.util.Fs.recoverReplace(spark, s"$targetPath.staging", targetPath)
          }
          val batch =
            resolveDrift(spark, pinned, targetPath, pkCols, nBuckets, onSchemaDrift)
          // a PK-only feed (presence-set replication) has no payload to
          // version by — any row of a PK group is the same row, dedup by
          // key; otherwise collapse to the highest version
          val payload = batch.columns.filterNot(pkCols.contains)
          val latest =
            if (payload.isEmpty) batch.dropDuplicates(pkCols)
            else Merge.latestByKey(batch, pkCols, versionColumn.getOrElse(payload.head))
          nBuckets match {
            case Some(n) =>
              // bucketed target: merge touches ONLY the partitions this
              // micro-batch's keys hash into — O(batch) I/O per trigger,
              // not O(target). This is the scale shape; the flat-target
              // branch below survives for small tables and demos.
              // materialize once: upsertBuckets reads the batch for the
              // affected-bucket collect AND both merge sides
              val latestM = latest.localCheckpoint()
              if (graft.util.Fs.existsNonEmpty(spark, targetPath))
                BucketedLayout.upsertBuckets(spark, targetPath, latestM, pkCols, n)
              else BucketedLayout.writeFull(spark, latestM, pkCols, n, targetPath)
            case None =>
              val merged =
                if (graft.util.Fs.hasFileWithSuffix(spark, targetPath, ".parquet")) {
                  Merge.upsert(spark.read.parquet(targetPath), latest, pkCols)
                } else latest
              // stage then MOVE (not re-write): the merged frame reads the
              // files the overwrite would replace, and a second Spark write
              // would double the I/O per micro-batch
              val staging = s"$targetPath.staging"
              merged.write.mode("overwrite").parquet(staging)
              graft.util.Fs.replace(spark, staging, targetPath)
          }
        }
        ()
      }
      .start()
  }

  /** Per-trigger drift decision for [[upsertStream]]. Returns the
    * batch to merge: the pinned-schema micro-batch when drift checking
    * is off, else a DIRECT read of the trigger's input files (so a
    * just-added column's VALUES survive — the pinned schema would
    * silently null them). Nullability is normalized before the
    * compare: parquet footers flip nullable bits freely (partition
    * writes, lit(null) evolution) and a nullability-only "drift"
    * re-triggering a full-target resync every trigger would be an
    * O(target)-per-trigger failure mode, not a safety feature.
    */
  /** Name of the injected per-row source-file column ([[upsertStream]]
    * drift checking); stripped before any merge or write.
    */
  private[graft] val SrcFileCol = "__graft_src_file"

  private[graft] def resolveDrift(spark: SparkSession, pinned: DataFrame,
                                  targetPath: String, pkCols: Seq[String],
                                  nBuckets: Option[Int],
                                  policy: String): DataFrame = {
    import graft.cdc.{BucketedLayout, SchemaSync}
    import org.apache.spark.sql.types.StructType
    if (policy == "ignore") return pinned
    val files = pinned.select(SrcFileCol).distinct()
      .collect().map(_.getString(0)).toSeq
    if (files.isEmpty) return pinned.drop(SrcFileCol)
    val live = spark.read.option("mergeSchema", "true").parquet(files: _*)
    val relax = (s: StructType) => StructType(s.map(_.copy(nullable = true)))
    val targetSchema: Option[StructType] = scala.util.Try {
      relax(StructType(spark.read.parquet(targetPath)
        .schema.filterNot(_.name == BucketedLayout.GB)))
    }.toOption
    val drift = SchemaSync.compare("target", relax(live.schema), targetSchema)
    SchemaSync.decide(drift, resyncOnSchemaChange = policy == "resync") match {
      case SchemaSync.NoAction | SchemaSync.CreateTarget => live
      case SchemaSync.Abort =>
        val SchemaSync.Mismatch(s, t) = drift: @unchecked
        throw new IllegalStateException(
          s"schema drift on $targetPath (onSchemaDrift=abort): feed=$s target=$t")
      case SchemaSync.ForceResync =>
        require(pkCols.forall(live.columns.contains),
          s"schema drift dropped pk column(s) ${pkCols.filterNot(live.columns.contains)
            .mkString(",")} — cannot resync $targetPath")
        evolveTarget(spark, targetPath, relax(live.schema), pkCols, nBuckets)
        live
    }
  }

  /** Project every existing target row onto `newSchema` (matching
    * names cast, added columns null, dropped columns removed) through
    * one staged full rewrite — the streaming form of the Replicator's
    * ForceResync. Runs once per drift EVENT: after the swap the next
    * trigger's compare is InSync.
    */
  private def evolveTarget(spark: SparkSession, targetPath: String,
                           newSchema: org.apache.spark.sql.types.StructType,
                           pkCols: Seq[String], nBuckets: Option[Int]): Unit = {
    import graft.cdc.BucketedLayout
    val cur = spark.read.parquet(targetPath).drop(BucketedLayout.GB)
    val projected = cur.select(newSchema.fields.toSeq.map { f =>
      if (cur.columns.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }: _*)
    nBuckets match {
      case Some(n) => BucketedLayout.writeFull(spark, projected, pkCols, n, targetPath)
      case None =>
        val staging = s"$targetPath.staging"
        projected.write.mode("overwrite").parquet(staging)
        graft.util.Fs.replace(spark, staging, targetPath)
    }
  }

  /** Streaming NEAR-duplicate filter — the corpus-cleaning member of
    * the dedup family for a continuously-arriving document feed: each
    * micro-batch's docs are MinHash-banded and admitted only if no
    * band bucket collides (Jaccard-verified ≥ threshold) with an
    * already-admitted doc or a smaller-id doc of the same batch
    * (greedy-by-id within a batch: a doc is dropped iff it matches ANY
    * smaller admitted-or-earlier id — deterministic, no per-batch
    * connected components).
    *
    * State = two parquet stores (band signatures + sorted token-hash
    * sets of admitted docs), laid out as HASH PARTITIONS
    * `gb=<k>/batch=<id>` — k = portable_hash(band:sig) mod
    * `nStoreBuckets` for bands, portable_hash(id) for sets. Each
    * trigger probes ONLY the buckets its batch hashes into (direct
    * bucket-dir reads — listing and scan are both O(batch's buckets),
    * never O(store)), and per-bucket compaction folds old `batch=`
    * dirs into one base dir, so per-bucket listing stays bounded as
    * the stream ages. Per batch the work is O(batch × collisions):
    * the store side is probed through the band equi-join, never
    * scanned pairwise.
    *
    * Replay-safe under foreachBatch's at-least-once contract: every
    * write lands in DETERMINISTIC `(gb, batch)` partitions via
    * dynamic-partition overwrite, so a replayed batch overwrites its
    * own previous partial writes instead of double-appending — and
    * store probes EXCLUDE the current batch's partitions, so a replay
    * can't collide with its own half-written signatures and drop
    * everything as self-duplicates. Output rows carry a `batch`
    * partition column.
    */
  def nearDupStream(spark: SparkSession, sourceDir: String, outDir: String,
                    stateDir: String, checkpoint: String,
                    textCol: String, idCol: String,
                    numHashes: Int = 16, numBands: Int = 2,
                    threshold: Double = 0.7,
                    maxFilesPerTrigger: Int = 10,
                    nStoreBuckets: Int = 64,
                    maxStoreDirsPerBucket: Int = 8,
                    feedSchema: Option[org.apache.spark.sql.types.StructType] = None): StreamingQuery = {
    val schema = graft.util.Fs.feedSchema(spark, sourceDir, feedSchema)
    val feed = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(sourceDir)

    feed.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime("1 second"))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        nearDupBatch(spark, batch, batchId, outDir, stateDir, textCol, idCol,
          numHashes, numBands, threshold, nStoreBuckets, maxStoreDirsPerBucket)
      }
      .start()
  }

  /** Store hash bucket for a band signature row: which `gb=` partition
    * of the bands store a (band, sig) bucket key lives in.
    */
  private[graft] def bandBucket(nStoreBuckets: Int): Column =
    pmod(graft.util.Hashing.portableHash64(
      concat_ws(":", col("band"), col("sig"))), lit(nStoreBuckets.toLong)).cast("int")

  /** Store hash bucket for a doc id: which `gb=` partition of the sets
    * store the doc's token-hash set lives in.
    */
  private[graft] def idBucket(id: Column, nStoreBuckets: Int): Column =
    pmod(graft.util.Hashing.portableHash64(id.cast("string")),
      lit(nStoreBuckets.toLong)).cast("int")

  /** Read ONLY the given hash buckets of a signature store, excluding
    * the current batch's own partitions (a replayed batch must not
    * collide with its half-written signatures). Direct bucket-dir
    * reads: listing + scan are O(probed buckets), never O(store).
    * None when no probed bucket exists yet (empty store included).
    */
  private[graft] def probeStore(spark: SparkSession, store: String,
                                    buckets: Seq[Int], batchId: Long): Option[DataFrame] = {
    val f = graft.util.Fs.fs(spark, store)
    val root = new org.apache.hadoop.fs.Path(store)
    // a pre-bucketed store laid signatures out as flat batch=<id> dirs;
    // silently seeing "no gb= dirs → empty store" would re-admit every
    // previously-rejected duplicate after an upgrade — refuse instead
    if (f.exists(root) &&
      f.listStatus(root).exists(_.getPath.getName.startsWith("batch=")))
      throw new IllegalStateException(
        s"$store holds a legacy flat batch=<id> signature layout, not " +
          "gb=<bucket> hash partitions. Run CdcStream.migrateNearDupStore(" +
          "spark, stateDir, nStoreBuckets) once, or start a fresh stateDir " +
          "(re-admitting history through the filter).")
    val dirs = buckets.sorted
      .map(k => s"$store/gb=$k")
      .filter(d => f.exists(new org.apache.hadoop.fs.Path(d)))
    if (dirs.isEmpty) None
    else Some(spark.read.option("basePath", store).parquet(dirs: _*)
      .filter(col("batch") =!= batchId).drop("batch", "gb"))
  }

  /** The store's bucket count is part of its identity: probing or
    * writing with a DIFFERENT count uses the wrong gb= dirs and
    * silently misses stored signatures (historical dups re-admitted,
    * no error). Stores record their count in the same `_graft_buckets`
    * marker the bucketed CDC sinks use; a mismatch refuses loudly.
    */
  private[graft] def requireStoreBuckets(spark: SparkSession, store: String,
                                         nStoreBuckets: Int): Unit =
    graft.cdc.BucketedLayout.readBucketCount(spark, store).foreach { recorded =>
      if (recorded != nStoreBuckets)
        throw new IllegalStateException(
          s"$store was written with $recorded store buckets; this stream is " +
            s"configured with $nStoreBuckets — probes would silently miss " +
            "stored signatures. Use the recorded count, or migrate the store.")
    }

  /** Write a batch's store rows into their `(gb, batch)` partitions.
    * Dynamic-partition overwrite touches ONLY the partitions present
    * in `df`, so a replay rewrites exactly its own directories and
    * every other (bucket, batch) partition's files stay untouched.
    * Stamps the store's bucket-count marker BEFORE the first data
    * write (mkdirs + marker): a crash between a data write and a
    * trailing marker write would leave a bucketed store unmarked, so a
    * restart configured with a different count would pass
    * [[requireStoreBuckets]] and silently miss stored signatures —
    * exactly the failure the marker exists to refuse. This mirrors
    * writeFull's marker-in-staging ordering: the store is never
    * visible without its bucket count.
    */
  private[graft] def writeStorePartitions(df: DataFrame, bucket: Column, batchId: Long,
                                          store: String, nStoreBuckets: Int): Unit = {
    val spark = df.sparkSession
    if (graft.cdc.BucketedLayout.readBucketCount(spark, store).isEmpty) {
      graft.util.Fs.fs(spark, store).mkdirs(new org.apache.hadoop.fs.Path(store))
      graft.cdc.BucketedLayout.writeMarker(spark, store, nStoreBuckets)
    }
    df.withColumn("gb", bucket).withColumn("batch", lit(batchId))
      .repartition(col("gb"))
      .write.partitionBy("gb", "batch")
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite").parquet(store)
  }

  /** One-time migration of a LEGACY flat near-dup signature store
    * (`batch=<id>` dirs at each store root) into the bucketed layout
    * [[probeStore]] expects, stamped with `nStoreBuckets` — which MUST
    * match the stream's configured count (the marker makes a mismatch
    * refuse loudly afterwards, never silently miss signatures).
    *
    * Batch ids are preserved (one basePath read recovers them as a
    * partition column — ONE job per store, not one per batch dir), so
    * replay exclusion semantics carry over. Crash safety: the bucketed
    * copy is fully staged, the original is renamed ASIDE (never
    * deleted before the new layout is in place), staging renamed in,
    * and only then the original dropped. A re-run after any crash
    * either restores the set-aside original and restarts, or finishes
    * the cleanup — no window loses the store.
    */
  def migrateNearDupStore(spark: SparkSession, stateDir: String,
                          nStoreBuckets: Int = 64): Unit = {
    import org.apache.hadoop.fs.Path
    Seq((s"$stateDir/bands.parquet", bandBucket(nStoreBuckets)),
        (s"$stateDir/sets.parquet", idBucket(col("id"), nStoreBuckets)))
      .foreach { case (root, bucket) =>
        val f = graft.util.Fs.fs(spark, root)
        val staging = s"$root.__migrating"
        val aside = s"$root.__premigration"
        // crash between the two renames: the original sits aside and
        // nothing owns the root — put the original back and redo
        if (!f.exists(new Path(root)) && f.exists(new Path(aside))) {
          if (!f.rename(new Path(aside), new Path(root)))
            throw new java.io.IOException(s"restore $aside -> $root failed")
        }
        if (f.exists(new Path(root))) {
          val legacy = f.listStatus(new Path(root))
            .exists(_.getPath.getName.startsWith("batch="))
          if (legacy) {
            graft.util.Fs.delete(spark, staging)
            spark.read.option("basePath", root).parquet(root)
              .withColumn("gb", bucket)
              .repartition(col("gb"))
              .write.partitionBy("gb", "batch").mode("overwrite").parquet(staging)
            graft.cdc.BucketedLayout.writeMarker(spark, staging, nStoreBuckets)
            graft.util.Fs.delete(spark, aside) // stale from an older crash
            if (!f.rename(new Path(root), new Path(aside)))
              throw new java.io.IOException(s"set-aside $root -> $aside failed")
            if (!f.rename(new Path(staging), new Path(root)))
              throw new java.io.IOException(s"publish $staging -> $root failed")
          }
          // cleanup — also finishes a crash after the publish rename
          graft.util.Fs.delete(spark, aside)
          graft.util.Fs.delete(spark, staging)
        }
      }
  }

  /** Fold one store bucket's old `batch=` dirs into a single base dir
    * when the bucket holds more than `maxDirs` of them — keeps
    * per-bucket listing O(maxDirs) forever instead of O(stream age).
    *
    * Only dirs with id ≤ batchId-2 fold (anything newer may still be
    * the subject of an at-least-once replay); prior base dirs
    * (negative ids) fold too. The base id is derived from batchId, so
    * a replayed trigger recomputes the same compaction. Crash safety,
    * in write order:
    *  1. merged base staged, then RENAMED to `batch=<baseId>` — a
    *     crash before the rename leaves every source intact;
    *  2. source dirs deleted only after the rename — a crash mid-way
    *     leaves base + leftover sources, whose overlap is harmless
    *     (probes dedup candidates; the replay's step 3 re-skips to
    *     the deletes because the base already exists).
    */
  private[graft] def compactBucket(spark: SparkSession, store: String, k: Int,
                                       batchId: Long, keyCols: Seq[String],
                                       maxDirs: Int): Unit = {
    import org.apache.hadoop.fs.Path
    val bucketDir = s"$store/gb=$k"
    val f = graft.util.Fs.fs(spark, store)
    if (f.exists(new Path(bucketDir))) {
      val ids = f.listStatus(new Path(bucketDir)).map(_.getPath.getName)
        .filter(_.startsWith("batch=")).map(_.stripPrefix("batch=").toLong)
      val baseId = -batchId - 2 // distinct from every real id and every older base
      val srcs = ids.filter(id => id != baseId && id <= batchId - 2)
      if (ids.length > maxDirs && srcs.nonEmpty) {
        val basePath = s"$bucketDir/batch=$baseId"
        val staging = s"$bucketDir/__staging_compact"
        if (!f.exists(new Path(basePath))) {
          // the keeper must be DETERMINISTIC: if one key was admitted in
          // two folded batches (id reuse), dropDuplicates would keep an
          // arbitrary row and a replayed trigger could compact to a
          // different store. Recover the batch partition column
          // (basePath read) and keep the max-batch row per key — the
          // latest admission wins; prior bases carry negative ids, so
          // real batches outrank them. The struct max leads with batch
          // (unique per dir), so payload fields only break impossible
          // ties — but they keep the keeper total either way.
          val rows = spark.read.option("basePath", bucketDir)
            .parquet(srcs.map(id => s"$bucketDir/batch=$id").toIndexedSeq: _*)
          val payload = rows.columns.filterNot(c => keyCols.contains(c) || c == "batch")
          rows.groupBy(keyCols.map(col): _*)
            .agg(max(struct((col("batch") +: payload.map(col)): _*)).as("__keep"))
            .select(keyCols.map(col) ++ payload.map(p => col(s"__keep.`$p`").as(p)): _*)
            .coalesce(1)
            .write.mode("overwrite").parquet(staging)
          if (!f.rename(new Path(staging), new Path(basePath)))
            throw new java.io.IOException(s"rename $staging -> $basePath failed")
        }
        srcs.foreach(id => graft.util.Fs.delete(spark, s"$bucketDir/batch=$id"))
        graft.util.Fs.delete(spark, staging)
      }
    }
  }

  /** One near-dup micro-batch step — public so its replay idempotence
    * (same batchId processed twice == processed once) is directly
    * spec-testable without killing a live stream mid-commit.
    */
  def nearDupBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
                   outDir: String, stateDir: String,
                   textCol: String, idCol: String,
                   numHashes: Int = 16, numBands: Int = 2,
                   threshold: Double = 0.7,
                   nStoreBuckets: Int = 64,
                   maxStoreDirsPerBucket: Int = 8): Unit = if (!batch.isEmpty) {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    import graft.ops.Dedup
    val bandsPath = s"$stateDir/bands.parquet"
    val setsPath = s"$stateDir/sets.parquet"
    requireStoreBuckets(spark, bandsPath, nStoreBuckets)
    requireStoreBuckets(spark, setsPath, nStoreBuckets)
    val toks = Dedup.tokenSet(batch, textCol, idCol).persist(MEMORY_AND_DISK)
    toks.count() // materialize before fanning into two subtrees
    // sigs feeds the bucket collect, BOTH candidate-join sides and the
    // store write; the collect below materializes it before the
    // broadcast-exchange subtrees race the cache
    // wide-form band derivation (one aggregation, no ×numHashes rows);
    // values are bit-identical to the long form, so signatures stored
    // by earlier triggers/rounds keep matching
    val sigs = Dedup.minHashBandsWide(toks, numHashes, numBands)
      .persist(MEMORY_AND_DISK)
    val sets = Dedup.tokenHashSets(toks)

    // probe ONLY the store buckets this batch's band keys hash into —
    // a bounded (≤ nStoreBuckets) collect, then direct bucket-dir
    // reads; the rest of the store is never listed or scanned
    val bandBkts = sigs.select(bandBucket(nStoreBuckets).as("gb"))
      .distinct().collect().map(_.getInt(0)).toIndexedSeq
    val storeBands = probeStore(spark, bandsPath, bandBkts, batchId)

    // candidate pairs: batch×store plus batch×smaller-batch-id
    val newSide = sigs.select(col("band"), col("sig"), col("id").as("id_new"))
    val candBatch = newSide
      .join(sigs.select(col("band"), col("sig"), col("id").as("id_old")),
        Seq("band", "sig"))
      .filter(col("id_old") < col("id_new"))
    // the batch side is small and the probed bucket slice may still
    // dwarf it: broadcast the batch so the store probe is a map-side
    // hash join over the bucket scan, never a shuffle of the store
    val cands = (storeBands match {
      case Some(st) => candBatch.unionByName(
        st.select(col("band"), col("sig"), col("id").as("id_old"))
          .join(broadcast(newSide), Seq("band", "sig")))
      case None => candBatch
    }).select("id_new", "id_old").distinct().persist(MEMORY_AND_DISK)

    // sets store probe: only the buckets holding a candidate's id_old
    val setBkts = cands.select(idBucket(col("id_old"), nStoreBuckets).as("gb"))
      .distinct().collect().map(_.getInt(0)).toIndexedSeq
    val storeSets = probeStore(spark, setsPath, setBkts, batchId)

    val oldSets = storeSets.fold(sets)(_.unionByName(sets))
      .select(col("id").as("id_old"), col("toks").as("toks_b"), col("n").as("n_b"))
    val verified = cands
      .join(sets.select(col("id").as("id_new"), col("toks").as("toks_a"),
        col("n").as("n_a")), Seq("id_new"))
      .join(oldSets, Seq("id_old"))
      .withColumn("inter", Dedup.interSizeFn(col("toks_a"), col("toks_b")))
      .filter(col("inter").cast("double") /
        (col("n_a") + col("n_b") - col("inter")) >= threshold)
    val dupIds = verified.select(col("id_new").as("__dup_id")).distinct()

    val admitted = batch
      .join(dupIds, batch(idCol) === dupIds("__dup_id"), "left_anti")
      .persist(MEMORY_AND_DISK)
    admitted.count()
    // deterministic (gb, batch) partitions, dynamic overwrite: a
    // replay rewrites exactly its own directories (idempotent), never
    // double-appends. WRITE ORDER MATTERS: output first, bands last —
    // a crash part-way can never leave a band key probe-visible while
    // its sets row is missing (the verify join would silently drop
    // the pair and over-admit on replay).
    val admIds = admitted.select(col(idCol).as("id"))
    admitted.write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
    writeStorePartitions(sets.join(admIds, Seq("id")),
      idBucket(col("id"), nStoreBuckets), batchId, setsPath, nStoreBuckets)
    writeStorePartitions(sigs.join(admIds, Seq("id")),
      bandBucket(nStoreBuckets), batchId, bandsPath, nStoreBuckets)
    // fold old batch dirs in the buckets this trigger touched, so
    // per-bucket dir counts stay bounded as the stream ages
    val admSetBkts = admIds.select(idBucket(col("id"), nStoreBuckets).as("gb"))
      .distinct().collect().map(_.getInt(0)).toIndexedSeq
    admSetBkts.foreach(k => compactBucket(spark, setsPath, k, batchId,
      Seq("id"), maxStoreDirsPerBucket))
    bandBkts.foreach(k => compactBucket(spark, bandsPath, k, batchId,
      Seq("band", "sig", "id"), maxStoreDirsPerBucket))
    admitted.unpersist()
    cands.unpersist()
    sigs.unpersist()
    toks.unpersist()
    ()
  }

  /** Streaming EXACT-dedup ingestion against a persistent content-hash
    * store — the streaming twin of `Dedup.incremental`, with UNBOUNDED
    * history (vs [[dedupStream]]'s watermark-bounded state): a doc
    * admitted a month ago still rejects today's copy. Per trigger the
    * batch self-collapses to min-id keepers, probes ONLY the store
    * buckets its hashes land in, and appends admitted (hash, id) rows
    * into the same `gb=` bucketed layout [[nearDupBatch]] uses — probe
    * listing + scan are O(batch buckets), compaction keeps per-bucket
    * dir counts bounded with stream age, and a replayed trigger is a
    * no-op (dynamic-partition overwrite + own-batch probe exclusion).
    */
  def exactDedupStream(spark: SparkSession, sourceDir: String, outDir: String,
                       stateDir: String, checkpoint: String,
                       textCol: String, idCol: String,
                       maxFilesPerTrigger: Int = 10,
                       nStoreBuckets: Int = 64,
                       maxStoreDirsPerBucket: Int = 8,
                       feedSchema: Option[org.apache.spark.sql.types.StructType] = None): StreamingQuery = {
    val schema = graft.util.Fs.feedSchema(spark, sourceDir, feedSchema)
    val feed = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(sourceDir)
    feed.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime("1 second"))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        exactDedupBatch(spark, batch, batchId, outDir, stateDir, textCol, idCol,
          nStoreBuckets, maxStoreDirsPerBucket)
      }
      .start()
  }

  /** One micro-batch of [[exactDedupStream]] (directly callable for
    * batch-mode backfills). Write order matters: output first, store
    * last — a crash in between replays to an identical recompute (the
    * store probe excludes this batch's own rows), never to a store
    * entry whose document was silently dropped.
    */
  def exactDedupBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
                      outDir: String, stateDir: String,
                      textCol: String, idCol: String,
                      nStoreBuckets: Int = 64,
                      maxStoreDirsPerBucket: Int = 8): Unit = if (!batch.isEmpty) {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val hashesPath = s"$stateDir/hashes.parquet"
    requireStoreBuckets(spark, hashesPath, nStoreBuckets)
    // in-batch collapse: min-id keeper per content hash (an aggregate,
    // partial-combined map-side — never a per-group window sort)
    val keepers = batch
      .select(col(idCol).as("id"),
        md5(graft.ops.TextAnalysis.normalize(col(textCol))).as("ch"))
      .groupBy("ch").agg(min(col("id")).as("id"))
      .persist(MEMORY_AND_DISK)
    val bkts = keepers.select(idBucket(col("ch"), nStoreBuckets).as("gb"))
      .distinct().collect().map(_.getInt(0)).toIndexedSeq
    // store-side duplicates: inner join over ONLY the probed bucket
    // dirs with the batch broadcast — the store never shuffles, and the
    // match set is ≤ |batch| rows, so the anti join below broadcasts it
    val dupHashes = probeStore(spark, hashesPath, bkts, batchId) match {
      case Some(st) => st.select(col("ch"))
        .join(broadcast(keepers.select("ch")), Seq("ch")).distinct()
      case None => keepers.select("ch").filter(lit(false))
    }
    val admittedKeys = keepers
      .join(broadcast(dupHashes), Seq("ch"), "left_anti")
      .persist(MEMORY_AND_DISK)
    val admitted = batch.join(
      admittedKeys.select(col("id").as(idCol)), Seq(idCol))
    admitted.write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
    writeStorePartitions(admittedKeys,
      idBucket(col("ch"), nStoreBuckets), batchId, hashesPath, nStoreBuckets)
    bkts.foreach(k => compactBucket(spark, hashesPath, k, batchId,
      Seq("ch"), maxStoreDirsPerBucket))
    admittedKeys.unpersist()
    keepers.unpersist()
    ()
  }

  /** Streaming exact dedup on a key within an event-time watermark —
    * the streaming member of the dedup family (SURVEY C-block):
    * `dropDuplicatesWithinWatermark` keeps state bounded, unlike a
    * naive global dropDuplicates.
    */
  def dedupStream(feed: DataFrame, tsCol: String, keyCols: Seq[String],
                  watermark: String = "10 minutes"): DataFrame =
    feed.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)
}
