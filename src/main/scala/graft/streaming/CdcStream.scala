package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
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
    */
  def upsertStream(spark: SparkSession, sourceDir: String, targetPath: String,
                   checkpoint: String, pkCols: Seq[String],
                   maxFilesPerTrigger: Int = 10,
                   versionColumn: Option[String] = None,
                   nBuckets: Option[Int] = None): StreamingQuery = {
    val schema = spark.read.parquet(sourceDir).schema
    val feed = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(sourceDir)

    feed.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime("1 second"))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // An EMPTY first micro-batch must not write at all: a zero-row
        // overwrite leaves a schema-less shell (_SUCCESS only) that
        // flips the exists gates below, after which every later merge
        // fails to infer the parquet schema and permanently wedges the
        // stream — replays hit the same error. (Inverted guard, NOT an
        // early return: `return` in a lambda is a non-local return.)
        if (!batch.isEmpty) {
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
              import graft.cdc.BucketedLayout
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
    * sets of admitted docs). Per batch the work is O(batch ×
    * collisions): the store side is probed through the band equi-join,
    * never scanned pairwise.
    *
    * Replay-safe under foreachBatch's at-least-once contract: every
    * write (output and both stores) lands in a DETERMINISTIC
    * `batch=<id>` partition directory with mode=overwrite, so a
    * replayed batch overwrites its own previous partial writes instead
    * of double-appending — and store probes EXCLUDE the current
    * batch's partition, so a replay can't collide with its own
    * half-written signatures and drop everything as self-duplicates.
    * Output rows therefore carry a `batch` partition column.
    */
  def nearDupStream(spark: SparkSession, sourceDir: String, outDir: String,
                    stateDir: String, checkpoint: String,
                    textCol: String, idCol: String,
                    numHashes: Int = 16, numBands: Int = 2,
                    threshold: Double = 0.7,
                    maxFilesPerTrigger: Int = 10): StreamingQuery = {
    val schema = spark.read.parquet(sourceDir).schema
    val feed = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(sourceDir)

    feed.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime("1 second"))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        nearDupBatch(spark, batch, batchId, outDir, stateDir, textCol, idCol,
          numHashes, numBands, threshold)
      }
      .start()
  }

  /** One near-dup micro-batch step — public so its replay idempotence
    * (same batchId processed twice == processed once) is directly
    * spec-testable without killing a live stream mid-commit.
    */
  def nearDupBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
                   outDir: String, stateDir: String,
                   textCol: String, idCol: String,
                   numHashes: Int = 16, numBands: Int = 2,
                   threshold: Double = 0.7): Unit = {
    import graft.ops.Dedup
    val bandsPath = s"$stateDir/bands.parquet"
    val setsPath = s"$stateDir/sets.parquet"
    val toks = Dedup.tokenSet(batch, textCol, idCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    toks.count() // materialize before fanning into two subtrees
    val sigs = Dedup.bandSignatures(
      Dedup.minHashSignatures(toks, numHashes), numHashes, numBands)
    val sets = Dedup.tokenHashSets(toks)
    val haveStore = graft.util.Fs.existsNonEmpty(spark, bandsPath)
    // exclude this batch's own partition: a REPLAYED batch must not
    // collide with its half-written signatures from the failed run
    def readStore(path: String) =
      spark.read.option("basePath", path).parquet(path)
        .filter(col("batch") =!= batchId).drop("batch")

    // candidate pairs: batch×store plus batch×smaller-batch-id
    val newSide = sigs.select(col("band"), col("sig"), col("id").as("id_new"))
    val candBatch = newSide
      .join(sigs.select(col("band"), col("sig"), col("id").as("id_old")),
        Seq("band", "sig"))
      .filter(col("id_old") < col("id_new"))
    // the batch side is small and the admitted store grows without
    // bound: broadcast the batch so the store probe is a map-side
    // hash join over the store scan, never a shuffle of the store.
    // (At larger scale, lay the store out partitioned by a hash of
    // (band, sig) — the same BucketedLayout trick the CDC sink
    // uses — and the probe prunes to the batch's buckets.)
    val cands = (if (haveStore)
      candBatch.unionByName(
        readStore(bandsPath)
          .select(col("band"), col("sig"), col("id").as("id_old"))
          .join(broadcast(newSide), Seq("band", "sig")))
    else candBatch).select("id_new", "id_old").distinct()

    val oldSets = (if (haveStore)
      readStore(setsPath).unionByName(sets) else sets)
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
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    admitted.count()
    // deterministic per-batch partitions, overwrite mode: a replay
    // rewrites exactly its own directories (idempotent), never
    // double-appends. WRITE ORDER MATTERS: bands last — its existence
    // is the haveStore marker, so a crash part-way can never leave
    // bands present while sets is missing (a replay would then read a
    // nonexistent sets path and wedge the stream).
    val admIds = admitted.select(col(idCol).as("id"))
    admitted.write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
    sets.join(admIds, Seq("id")).write.mode("overwrite")
      .parquet(s"$setsPath/batch=$batchId")
    sigs.join(admIds, Seq("id")).write.mode("overwrite")
      .parquet(s"$bandsPath/batch=$batchId")
    admitted.unpersist()
    toks.unpersist()
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
