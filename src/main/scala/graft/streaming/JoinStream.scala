package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.cdc.{BucketedLayout, JoinMaintain, Merge}
import graft.util.Fs

/** Streaming JOIN-view maintenance — [[graft.cdc.JoinMaintain]]'s
  * continuous twin (the AggStream/Scd2Stream discipline applied to
  * A44): one unioned CDC feed carrying BOTH sides' changes (a `side`
  * column says 'fact' or 'dim' — the shape a multiplexed Debezium-
  * style topic pair lands as) keeps three stores current per trigger:
  *
  *  - the FACT replica, hash-bucketed by fact pk (a trigger rewrites
  *    only the buckets its keys hash into),
  *  - the DIM replica, flat stage-and-swap (dimensions are the small
  *    side by definition — that asymmetry is the whole point of the
  *    star shape),
  *  - the maintained VIEW (fact ⋈ dim), bucketed by fact pk like the
  *    fact replica — SAME bucket function, so every view row lives in
  *    the bucket of its fact row and fact-side maintenance is
  *    bucket-local.
  *
  * Per-trigger cost: fact-only triggers touch O(batch) buckets of
  * view + fact replica and never scan anything corpus-sized. Triggers
  * carrying dim changes additionally pay ONE (pk, fk) column-pruned
  * scan of the fact replica to find the buckets holding rows that
  * reference the touched dim keys — the honest price of inner-join
  * maintenance (a dim INSERT must surface dangling fact rows the view
  * has never seen, so the view alone cannot answer); dims change
  * rarely, and the scan reads two columns. The re-derivation itself
  * then runs restricted to exactly those buckets.
  *
  * `outer = true` maintains the LEFT-OUTER (enrichment) view instead
  * — [[JoinMaintain]]'s self-maintainable mode on the continuous
  * path, and the mode CLUSTER.md tells 100-TB deployments to prefer:
  * the view holds EVERY fact row (NULL payload where no dim
  * matches), so dim-bearing triggers derive everything from the
  * view's own buckets — the (pk, fk) probe reads the VIEW instead of
  * the fact replica and the view fold never reads the fact replica
  * at all (the fold is handed an empty frame; the replica is still
  * MAINTAINED as a store output, its merge untouched). The mode is
  * part of the store's identity: never point an `outer` stream at an
  * inner store or vice versa — the stamp guard catches batch-id
  * drift, not mode drift.
  *
  * Durability trade, named: the fold pins its inputs with
  * `localCheckpoint()` (executor-local blocks, NOT reliable storage).
  * On a real cluster an executor loss mid-trigger fails that trigger;
  * foreachBatch then RETRIES the whole batch, and the stamp ordering
  * above makes the retry safe (identical recompute before the stamp,
  * idempotent replica merges after) — so the trade costs retry
  * latency under executor churn, never correctness. A
  * `spark.cleaner.referenceTracking`-style reliable checkpoint would
  * halve tail latency under churn at the price of a per-trigger HDFS
  * round-trip; the local form is the right default for second-scale
  * triggers.
  *
  * Exactly-once under foreachBatch's at-least-once contract (the
  * AggStream invariant, same ordering proof): the view's replacement
  * buckets are computed against the PRE-batch replicas, so the fold
  * is only correct while the replicas haven't advanced. Order: view
  * bucket overwrite → `_graft_batch` stamp → fact replica merge → dim
  * replica swap. A replay that finds its stamp skips the view fold
  * (the replicas may have advanced) and re-runs only the idempotent
  * replica merges; a replay without the stamp recomputes an IDENTICAL
  * view (replicas only advance after stamping) and overwrites its own
  * buckets. Crashes inside any of the three swaps are healed at entry
  * ([[BucketedLayout.recoverSwap]] / [[Fs.recoverReplace]]) before
  * anything is read.
  *
  * SNOWFLAKE cascade: pass `deltaFeedDir` and every trigger re-emits
  * the fold's own change batch ([[JoinMaintain.maintainDelta]]) into
  * that directory in the same feed contract it consumes (side='fact',
  * ver = the trigger's batch id — monotone), as one deterministically
  * named file per batch inside the stamp window. Point a SECOND
  * JoinStream's source at that directory (its dim side arrives in the
  * same dir from its own producer; the explicit feed schema reads the
  * columns each writer omits as NULL) and level 2's fact replica
  * converges to level 1's VIEW without ever reading level 1's stores —
  * one O(touched) fold per level per cycle, the streaming form of the
  * batch cascade.
  */
object JoinStream {

  private val STAMP = "_graft_batch"

  private[graft] def readStamp(spark: SparkSession, dir: String): Option[Long] =
    Fs.readSmallText(spark, dir, STAMP).flatMap(_.toLongOption)

  private[graft] def writeStamp(spark: SparkSession, dir: String, batchId: Long): Unit =
    Fs.writeSmallText(spark, dir, STAMP, batchId.toString)

  /** The maintained view, minus the layout column. */
  def readView(spark: SparkSession, viewPath: String): DataFrame =
    spark.read.parquet(viewPath).drop(BucketedLayout.GB)

  /** One maintenance micro-batch — public so replay idempotence and
    * the crash windows are directly spec-testable (the
    * [[AggStream.foldBatch]] pattern).
    *
    * Feed contract: `batch` holds both sides' change rows. `sideCol`
    * is 'fact' or 'dim'; `versionCol` orders multiple changes to one
    * key within the batch (last writer wins per side); `deleteCol` is
    * the tombstone bool. Fact rows carry `factCols` (pk + fk +
    * payload), dim rows carry `dimCols` (dim pk + payload); each
    * side's rows may leave the other side's columns NULL.
    */
  def foldBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
                factPath: String, dimPath: String, viewPath: String,
                factPk: Seq[String], fk: String, dimPk: String,
                factCols: Seq[String], dimCols: Seq[String],
                versionCol: String, deleteCol: String,
                nBuckets: Int,
                outer: Boolean = false,
                deltaFeedDir: Option[String] = None): Unit =
    if (!batch.isEmpty) {
      val dimPayload = dimCols.filterNot(_ == dimPk)

      // split + collapse to ONE action per key per side. Both sides'
      // collapsed change sets pin under ONE localCheckpoint (a `__cs`
      // tag keeps them apart): the per-side frames feed the fold AND
      // the merges under stores being swapped, and one materialization
      // job is half the driver latency of two (guide §2.6 — the
      // driver's serial action count is the cost at trigger grain).
      val collapsed = {
        def latestOf(tag: String, pk: Seq[String], cols: Seq[String]) =
          Merge.latestByKey(
            batch.filter(col("side") === tag)
              .select((cols :+ versionCol :+ deleteCol).map(col): _*),
            pk, versionCol).withColumn("__cs", lit(tag))
        latestOf("fact", factPk, factCols)
          .unionByName(latestOf("dim", Seq(dimPk), dimCols),
            allowMissingColumns = true)
          .localCheckpoint()
      }
      def sideOf(tag: String, pk: Seq[String], cols: Seq[String]) = {
        // re-alias every projected column: both sides filter the SAME
        // checkpointed frame, and the fold later JOINS fact- against
        // dim-derived frames — without fresh output exprIds per side,
        // Spark's self-join ambiguity check sees one dataset on both
        // sides of that join and fails analysis
        val latest = collapsed.filter(col("__cs") === tag)
        (latest.filter(!col(deleteCol)).select(cols.map(c => col(c).as(c)): _*),
          latest.filter(col(deleteCol)).select(pk.map(c => col(c).as(c)): _*))
      }
      val (factUps, factDelKeys) = sideOf("fact", factPk, factCols)
      val (dimUps, dimDelKeys) = sideOf("dim", Seq(dimPk), dimCols)

      // heal half-finished swaps from a crashed predecessor attempt
      BucketedLayout.recoverSwap(spark, factPath)
      BucketedLayout.recoverSwap(spark, viewPath)
      Fs.recoverReplace(spark, s"$dimPath.staging", dimPath)

      val f = Fs.fs(spark, factPath)
      def bucketedExists(p: String): Boolean = f.exists(new Path(p)) &&
        f.listStatus(new Path(p))
          .exists(_.getPath.getName.startsWith(s"${BucketedLayout.GB}="))
      val factExists = bucketedExists(factPath)
      val viewExists = bucketedExists(viewPath)
      val dimExists = Fs.hasFileWithSuffix(spark, dimPath, ".parquet")

      val dimBase =
        if (dimExists) spark.read.parquet(dimPath) else dimUps.limit(0)

      // the buckets this trigger touches: the fact batch's own keys,
      // plus — only when the dim side moved — the buckets of fact
      // rows referencing touched dim keys (the one pruned fact scan).
      // Both bucket sets come back in ONE tagged collect (the fact
      // merge in step 2 needs the fact-side set alone, so the tag
      // rides along instead of a second driver round trip), and the
      // whole collect is skipped when no store exists yet to prune.
      val touchedDimKeys = dimUps.select(col(dimPk))
        .unionByName(dimDelKeys).filter(col(dimPk).isNotNull).distinct()
      val dimMoved = !touchedDimKeys.isEmpty
      def bucketsTagged(df: DataFrame, tag: String): DataFrame =
        df.select(BucketedLayout.bucketExpr(factPk, nBuckets).as("gb"))
          .distinct().withColumn("__bt", lit(tag))
      val factKeyBuckets = bucketsTagged(
        factUps.select(factPk.map(col): _*).unionByName(factDelKeys), "f")
      // OUTER mode probes the VIEW (it holds every fact row — the
      // self-maintainability invariant), inner mode the fact replica
      val dimProbeBuckets: Option[DataFrame] =
        if (!dimMoved) None
        else if (outer) {
          if (!viewExists) None
          else Some(bucketsTagged(spark.read.parquet(viewPath)
            .select((factPk :+ fk).map(col): _*)
            .join(broadcast(touchedDimKeys.select(col(dimPk).as(fk))),
              Seq(fk), "left_semi"), "d"))
        } else if (!factExists) None
        else Some(bucketsTagged(spark.read.parquet(factPath)
          .select((factPk :+ fk).map(col): _*)
          .join(broadcast(touchedDimKeys.select(col(dimPk).as(fk))),
            Seq(fk), "left_semi"), "d"))
      val taggedBuckets: Seq[(Int, String)] =
        if (!viewExists && !factExists) Nil // nothing to prune yet
        else dimProbeBuckets.fold(factKeyBuckets)(factKeyBuckets.unionByName(_))
          .collect().map(r => (r.getInt(0), r.getString(1))).toIndexedSeq
      val factSideBuckets = taggedBuckets.collect { case (k, "f") => k }.toSet
      val touched = taggedBuckets.map(_._1).distinct.sorted

      def bucketRead(p: String, exists: Boolean, empty: DataFrame) =
        if (!exists) empty
        else spark.read.parquet(p)
          .filter(col(BucketedLayout.GB).isin(touched: _*))
          .drop(BucketedLayout.GB)
      // the outer fold is fact-base-free by the delta rules — hand it
      // a provably-empty frame so the plan cannot read the replica
      val factB =
        if (outer) factUps.limit(0)
        else bucketRead(factPath, factExists, factUps.limit(0))
      // a view store can be legitimately ABSENT while the replicas are
      // not (zero matches so far): synthesize the empty view with the
      // projection contract's schema instead of failing inference
      val viewB = bucketRead(viewPath, viewExists,
        JoinMaintain.build(factUps.limit(0), dimUps.limit(0), fk, dimPk,
          dimPayload, outer))

      // 1. view bucket overwrite — computed against PRE-batch
      //    replicas, so only valid before they advance; stamp gates it
      val stamp = readStamp(spark, viewPath)
      if (stamp.exists(_ > batchId))
        throw new IllegalStateException(
          s"$viewPath was maintained up to batch ${stamp.get}, but this stream " +
            s"is at batch $batchId — a fresh checkpoint against an existing " +
            "store would silently skip folds. Start fresh store paths, or " +
            "keep the original checkpoint.")
      if (!stamp.contains(batchId)) {
        val (newView, dUps, dDels) = JoinMaintain.maintainDelta(spark,
          viewB, factB, dimBase, factUps, factDelKeys, dimUps, dimDelKeys,
          factPk, fk, dimPk, dimPayload, outer = outer)
        // the delta frames read the PRE-swap view/fact stores — they
        // must materialize BEFORE overwriteBuckets deletes those files
        val (vUps, vDels) =
          if (deltaFeedDir.isDefined)
            (dUps.localCheckpoint(), dDels.localCheckpoint())
          else (dUps, dDels)
        // the CASCADE seam: the fold's own change batch, re-emitted in
        // the feed contract (side='fact', ver = this batchId — monotone
        // because foreachBatch ids are) into the NEXT level's feed dir,
        // so a snowflake chains as streams — level 2's fact replica
        // converges to THIS view without ever reading this store.
        // Delete rows carry only the pk; the downstream reads the
        // missing payload columns as NULL (explicit feed schema).
        // ORDER MATTERS: the delta lands BEFORE the view bucket swap,
        // and an existing delta-<id> file is never rewritten. The
        // delete half of the delta derives from the PRE-fold view
        // (droppedKeys = touched-in-view minus rederived), so a replay
        // that recomputed it AFTER the swap would see the dropped rows
        // already gone and emit an empty delete set — the downstream
        // would keep rows forever. With this order every crash window
        // holds: before the rename, no file exists and the view is
        // still pre-fold, so the replay recomputes identical content;
        // after it, the file (atomic rename, so never partial) is the
        // pre-fold truth and is left untouched while the idempotent
        // view fold re-runs.
        deltaFeedDir.foreach { dir =>
          val df2 = Fs.fs(spark, dir)
          val dest = new Path(s"$dir/delta-$batchId.parquet")
          if (df2.exists(dest)) {
            // a crash between the rename and staging cleanup leaves an
            // orphan; the delta itself is complete and untouched
            Fs.delete(spark, s"$dir/.staging-$batchId")
          } else {
            val upRows = vUps.withColumn("side", lit("fact"))
              .withColumn(versionCol, lit(batchId))
              .withColumn(deleteCol, lit(false))
            val delRows = vDels.withColumn("side", lit("fact"))
              .withColumn(versionCol, lit(batchId))
              .withColumn(deleteCol, lit(true))
            // land as ONE deterministically-NAMED flat file (file-stream
            // sources track seen files by path, so the per-batch name is
            // what makes redelivery invisible downstream — append-mode
            // part files would double-deliver)
            val staging = s"$dir/.staging-$batchId"
            upRows.unionByName(delRows, allowMissingColumns = true)
              .coalesce(1).write.mode("overwrite").parquet(staging)
            df2.listStatus(new Path(staging)).map(_.getPath)
              .find(_.getName.endsWith(".parquet")).foreach { part =>
                if (!df2.rename(part, dest))
                  throw new java.io.IOException(s"rename $part -> $dest failed")
              }
            Fs.delete(spark, staging)
          }
        }
        if (viewExists) {
          // no pre-materialization and no kept-bucket collect:
          // overwriteBuckets stages the new view before any delete
          // (so the fold's pre-swap reads never race the swap) and
          // derives the survivor set from its own staged partitions
          BucketedLayout.overwriteBuckets(spark, newView, factPk, nBuckets,
            viewPath, clearBuckets = touched)
        } else {
          val nv = newView.localCheckpoint() // emptiness gate AND write
          if (!nv.isEmpty) {
            // zero-row partitioned bootstrap would publish a schema-less
            // shell that wedges every later read (the AggStream guard)
            BucketedLayout.writeFull(spark, nv, factPk, nBuckets, viewPath)
          }
        }
        writeStamp(spark, viewPath, batchId)
      }

      // 2. idempotent fact replica merge (bucket-local: only the fact
      //    batch's own buckets, not the dim-side re-derive set)
      if (factExists) {
        if (factSideBuckets.nonEmpty) {
          val fb = factSideBuckets.toIndexedSeq.sorted
          val base = spark.read.parquet(factPath)
            .filter(col(BucketedLayout.GB).isin(fb: _*))
            .drop(BucketedLayout.GB)
          val merged = Merge.applyDeletes(
            Merge.upsert(base, factUps, factPk), factDelKeys, factPk)
          // staged-before-delete + staged-survivor clearing: neither a
          // checkpoint nor a kept-bucket collect is needed (see the
          // view fold above)
          BucketedLayout.overwriteBuckets(spark, merged, factPk, nBuckets,
            factPath, clearBuckets = fb)
        }
      } else if (!factUps.isEmpty) {
        BucketedLayout.writeFull(spark, factUps, factPk, nBuckets, factPath)
      }

      // 3. idempotent dim replica swap (flat: the small side) — ONLY
      //    when the trigger actually carried dim changes: the common
      //    fact-only trigger must not rewrite-and-swap an unchanged
      //    dim table every second (a replay with dim changes still
      //    re-runs the merge, so idempotence is untouched)
      if (dimMoved) {
        val dimMerged =
          if (dimExists)
            Merge.applyDeletes(Merge.upsert(dimBase, dimUps, Seq(dimPk)),
              dimDelKeys, Seq(dimPk))
          else dimUps
        val staging = s"$dimPath.staging"
        dimMerged.write.mode("overwrite").parquet(staging)
        Fs.replace(spark, staging, dimPath)
      }
      ()
    }

  /** Continuous maintenance of fact replica + dim replica + join view
    * from a file-based unioned change feed. Returns the running
    * query; callers own its lifecycle. Read the maintained view with
    * [[readView]].
    */
  def maintainStream(spark: SparkSession, sourceDir: String,
                     factPath: String, dimPath: String, viewPath: String,
                     checkpoint: String,
                     factPk: Seq[String], fk: String, dimPk: String,
                     factCols: Seq[String], dimCols: Seq[String],
                     versionCol: String, deleteCol: String,
                     nBuckets: Int,
                     outer: Boolean = false,
                     maxFilesPerTrigger: Int = 10,
                     feedSchema: Option[org.apache.spark.sql.types.StructType] = None,
                     deltaFeedDir: Option[String] = None): StreamingQuery = {
    val schema = Fs.feedSchema(spark, sourceDir, feedSchema)
    val feed = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(sourceDir)
    feed.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime("1 second"))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        foldBatch(spark, batch, batchId, factPath, dimPath, viewPath,
          factPk, fk, dimPk, factCols, dimCols, versionCol, deleteCol,
          nBuckets, outer, deltaFeedDir)
      }
      .start()
  }
}
