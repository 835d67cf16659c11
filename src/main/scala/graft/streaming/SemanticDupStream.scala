package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.sim.Similarity

/** Streaming SEMANTIC near-duplicate filter — SemDeDup's (Abbas et
  * al. 2023) ingestion twin and the embedding-side sibling of
  * `CdcStream.nearDupStream`: each micro-batch's vectors are assigned
  * to their nearest FROZEN centroid cell and admitted only if no
  * same-cell neighbor (already admitted, or a smaller id in the same
  * batch) sits at cosine ≥ threshold. Frozen cells are the deployed
  * form: centroids train once on a seed corpus (emb_kmeans), then the
  * incoming crawl filters against them — assignment is a pure per-row
  * function, so the stream never re-clusters and replays are
  * deterministic.
  *
  * The SemDeDup trade carries over verbatim: near-dups straddling a
  * cell boundary are NOT compared (spec-pinned — that miss is the
  * price of never running the corpus-wide pair scan), and within a
  * batch admission is greedy by id (a vector is dropped iff it
  * matches ANY smaller same-cell id of the batch or the store — no
  * per-batch connected components).
  *
  * State = one parquet store of admitted (id, cid, qv, n2) rows in
  * the SAME `gb=<k>/batch=<id>` hash-bucketed layout as the near-dup
  * text store (k = portable_hash(cid) mod nStoreBuckets): each
  * trigger probes ONLY the buckets its batch's cells hash into
  * (direct bucket-dir reads, O(batch's cells) listing), per-bucket
  * compaction keeps dir counts bounded with stream age, and
  * dynamic-partition `(gb, batch)` overwrites + own-batch probe
  * exclusion make a replayed trigger rewrite identical bytes instead
  * of double-appending or self-colliding. Store probes are a
  * broadcast of the batch side against the bucket scan — the store
  * never shuffles, never pairwise-scans.
  *
  * Exactness: assignment and verification use the quantized integer
  * dot products every ANN op in graft.sim uses (codegen'd graft_dot
  * when registered); cell argmax is total-ordered by (cosine desc,
  * cid asc) with the −2.0 zero-norm sentinel, so ties can't flap.
  * Zero-norm vectors (no cosine) dedup by EXACT CODE equality: a
  * zero norm forces an all-zero quantized code, so all such vectors
  * are mutual exact duplicates and land in one cell — the first is
  * admitted, the rest drop (a mixed zero/non-zero pair is never a
  * dup: cosine is undefined and the codes differ).
  */
object SemanticDupStream {

  private def cellBucket(nStoreBuckets: Int) =
    pmod(graft.util.Hashing.portableHash64(col("cid").cast("string")),
      lit(nStoreBuckets.toLong)).cast("int")

  /** Nearest frozen cell per batch vector: (id, cid, qv, n2). */
  private def assign(batchPrep: DataFrame, cents: DataFrame,
                     dim: Option[Int]): DataFrame = {
    val prepC = cents
      .select(col("cid"), Similarity.quantize(col("cvec")).as("cqv"))
      .withColumn("cn2", Similarity.qdot(col("cqv"), col("cqv"), dim))
    val w = Window.partitionBy("id")
      .orderBy(col("__ccos").desc, col("cid").asc)
    batchPrep.crossJoin(broadcast(prepC))
      .withColumn("__ccos",
        when(col("n2") === 0 || col("cn2") === 0, lit(-2.0))
          .otherwise(Similarity.qdot(col("qv"), col("cqv"), dim).cast("double") /
            (sqrt(col("n2").cast("double")) * sqrt(col("cn2").cast("double")))))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("id"), col("cid"), col("qv"), col("n2"))
  }

  /** One semantic-dedup micro-batch step — public so replay
    * idempotence and the cell-boundary miss are directly
    * spec-testable. `centroids` is the frozen (cid, cvec) reference.
    */
  def semanticDupBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
                       outDir: String, stateDir: String,
                       centroids: DataFrame,
                       vecCol: String, idCol: String,
                       threshold: Double, dim: Option[Int] = None,
                       nStoreBuckets: Int = 64,
                       maxStoreDirsPerBucket: Int = 8)
      : Unit = if (!batch.isEmpty) {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val storePath = s"$stateDir/cells.parquet"
    CdcStream.requireStoreBuckets(spark, storePath, nStoreBuckets)
    val prep = batch
      .select(col(idCol).as("id"), Similarity.quantize(col(vecCol)).as("qv"))
      .withColumn("n2", Similarity.qdot(col("qv"), col("qv"), dim))
    val assigned = assign(prep, centroids, dim).persist(MEMORY_AND_DISK)
    assigned.count() // materialize before fanning into probe + joins

    // probe ONLY the store buckets this batch's cells hash into
    val cellBkts = assigned.select(cellBucket(nStoreBuckets).as("gb"))
      .distinct().collect().map(_.getInt(0)).toIndexedSeq
    val store = CdcStream.probeStore(spark, storePath, cellBkts, batchId)

    val newSide = assigned.select(col("cid"), col("id").as("id_new"),
      col("qv").as("qv_a"), col("n2").as("n_a"))
    val candBatch = newSide.join(
      assigned.select(col("cid"), col("id").as("id_old"),
        col("qv").as("qv_b"), col("n2").as("n_b")), Seq("cid"))
      .filter(col("id_old") < col("id_new"))
    val cands = store match {
      case Some(st) => candBatch.unionByName(
        st.select(col("cid"), col("id").as("id_old"),
            col("qv").as("qv_b"), col("n2").as("n_b"))
          .join(broadcast(newSide), Seq("cid")))
      case None => candBatch
    }
    // zero-norm vectors have no cosine, but their quantized codes are
    // ALL-ZERO by construction (n2 = Σqv² = 0 ⟺ qv ≡ 0) — i.e. every
    // zero-norm vector is an exact code duplicate of every other, and
    // they all argmax into the same cell (−2.0 sentinel ties resolve
    // to the lowest cid). Admit the first, drop the rest by exact
    // code equality — without this branch the zero-norm feed was an
    // unbounded always-admitted duplicate path (round-8 advice).
    val dupIds = cands
      .filter(
        (col("n_a") === 0 && col("n_b") === 0) ||
        (col("n_a") > 0 && col("n_b") > 0 &&
          Similarity.qdot(col("qv_a"), col("qv_b"), dim).cast("double") /
            (sqrt(col("n_a").cast("double")) * sqrt(col("n_b").cast("double")))
          >= threshold))
      .select(col("id_new").as("__dup_id")).distinct()

    val admitted = batch
      .join(dupIds, batch(idCol) === dupIds("__dup_id"), "left_anti")
      .persist(MEMORY_AND_DISK)
    admitted.count()
    // output first, store last: a crash can never leave a stored
    // vector that its own batch's output doesn't carry
    admitted.write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
    CdcStream.writeStorePartitions(
      assigned.join(admitted.select(col(idCol).as("id")), Seq("id")),
      cellBucket(nStoreBuckets), batchId, storePath, nStoreBuckets)
    cellBkts.foreach(k => CdcStream.compactBucket(spark, storePath, k,
      batchId, Seq("id"), maxStoreDirsPerBucket))
    admitted.unpersist()
    assigned.unpersist()
    ()
  }

  /** File-fed filter stream: new parquet vector files under
    * `sourceDir` are admitted/rejected against the frozen cells;
    * admitted rows land under `outDir/batch=<id>`.
    */
  def semanticDupStream(spark: SparkSession, sourceDir: String, outDir: String,
                        stateDir: String, checkpoint: String,
                        centroids: DataFrame,
                        vecCol: String, idCol: String,
                        threshold: Double, dim: Option[Int] = None,
                        maxFilesPerTrigger: Int = 10,
                        nStoreBuckets: Int = 64,
                        maxStoreDirsPerBucket: Int = 8,
                        feedSchema: Option[org.apache.spark.sql.types.StructType] = None)
      : StreamingQuery = {
    val schema = graft.util.Fs.feedSchema(spark, sourceDir, feedSchema)
    val feed = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(sourceDir)
    feed.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime("1 second"))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        semanticDupBatch(spark, batch, batchId, outDir, stateDir, centroids,
          vecCol, idCol, threshold, dim, nStoreBuckets, maxStoreDirsPerBucket)
      }
      .start()
  }
}
