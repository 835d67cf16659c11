package graft.sim

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental IVF index maintenance — the ingestion-time form of
  * [[Similarity.ivfTopK]] (which re-derives its coarse quantizer per
  * run; fine for one-shot queries, wasteful for a continuously-fed
  * corpus where the quantizer is the expensive, slowly-moving part).
  *
  * Store layout (all parquet under `store`):
  *   - `centroids/` — the PERSISTED coarse quantizer: K rows
  *     (cid, cqv: array<bigint>, cn2) in the file-wide floor(x·10⁴)
  *     quantization. Written once at [[build]]/[[recluster]]; every
  *     [[append]] broadcasts it — K×dim longs, never reshuffled.
  *   - `profile/` — per-dimension integer moments (n, Σq, Σq²) of the
  *     SEED corpus: the drift reference [[reclusterDecision]] compares
  *     new batches against (the [[Similarity.embDrift]] arithmetic,
  *     persisted so the seed itself need not be kept).
  *   - `assign/gb=<k>/batch=<id>/` — the inverted file: (id, cid,
  *     ccos) rows in the near-dup store discipline
  *     (streaming/CdcStream.scala:134): gb = cid mod nStoreBuckets so
  *     a search probing centroid c lists and reads ONLY its bucket
  *     dir; `batch=<id>` dynamic-partition overwrite makes a replayed
  *     append rewrite exactly its own directories (at-least-once
  *     safe); the bucket-count marker refuses a mismatched reader.
  *
  * Scale shape: build = one kmeans (broadcast centroids, partial-agg
  * struct-max assignment, k×dim update shuffle per iter); append =
  * ONE batch-sized assignment scan against the broadcast persisted
  * centroids + an O(batch) partitioned write — the corpus is never
  * rescanned; decision = one batch-sized partial agg joined to the
  * broadcast d-row profile. Only [[recluster]] is O(corpus), and the
  * decision exists precisely to run it rarely.
  */
object IvfIndex {

  import Similarity.{prepared, qdot}

  private def centroidsPath(store: String) = s"$store/centroids"
  private def profilePath(store: String) = s"$store/profile"
  private def assignPath(store: String) = s"$store/assign"
  private def tombsPath(store: String) = s"$store/tombs"

  /** Deterministic nearest-centroid assignment of `df` against a
    * (cid, cqv, cn2) centroid table: argmax cosine, ties to the
    * smallest cid, zero norms pinned at the −2.0 sentinel — the exact
    * [[Similarity.kmeansFull]] assignment convention, so an
    * iters=0-built index is DuckDB-replayable end-to-end.
    * Partial-aggregatable struct-max; the centroid side broadcasts.
    * Keeps the quantized vector and norm: the posting lists ARE the
    * inverted file [[searchTopK]] reranks from, so the vectors live
    * in the store (the actual IVF design), not in a side table.
    */
  def assign(df: DataFrame, vecCol: String, idCol: String,
             cents: DataFrame, dim: Int): DataFrame =
    prepared(df, vecCol, idCol)
      .crossJoin(broadcast(cents))
      .withColumn("ccos",
        when(col("cn2") === 0 || col("n2") === 0, lit(-2.0))
          .otherwise(qdot(col("qv"), col("cqv"), Some(dim)).cast("double") /
            (sqrt(col("n2").cast("double")) * sqrt(col("cn2").cast("double")))))
      .groupBy("id")
      .agg(max(struct(col("ccos"), (-col("cid")).as("ncid"))).as("m"),
        first(col("qv")).as("qv"), first(col("n2")).as("n2"))
      .select(col("id"), (-col("m.ncid")).as("cid"),
        round(col("m.ccos"), 6).as("ccos"), col("qv"), col("n2"))

  /** Per-dimension integer moments of the quantized vectors — the
    * persisted drift reference ([[Similarity.embDrift]]'s per-side
    * aggregate, kept instead of the vectors).
    */
  private def dimStats(df: DataFrame, vecCol: String): DataFrame =
    df.select(posexplode(Similarity.quantize(col(vecCol))).as(Seq("i", "q")))
      .groupBy("i")
      .agg(count(lit(1)).as("n"), sum(col("q")).as("s"),
        sum(col("q") * col("q")).as("ss"))
      .select(col("i").cast("long").as("dim_i"), col("n"), col("s"), col("ss"))

  /** Build the index from a seed corpus: train the quantizer
    * (k-means, deterministic hash-ranked init — iters=0 keeps it at
    * the init, making the whole index oracle-replayable), persist
    * centroids + drift profile, and write the seed's assignments as
    * `batch=0`.
    */
  def build(spark: SparkSession, seed: DataFrame, vecCol: String, idCol: String,
            k: Int, iters: Int, dim: Int, store: String,
            nStoreBuckets: Int): Unit = {
    val (_, cents) = Similarity.kmeansFull(seed, vecCol, idCol, k, iters, Some(dim))
    val centDf = spark.createDataFrame(cents.toSeq.map { case (cid, v) =>
        (cid, v.toArray)
      }).toDF("cid", "cqv")
      .withColumn("cn2", qdot(col("cqv"), col("cqv"), Some(dim)))
    graft.util.Fs.delete(spark, assignPath(store))
    // independent tiny writes (disjoint paths) — overlapped, guide §2.6
    graft.util.Par.run(
      centDf.coalesce(1).write.mode("overwrite").parquet(centroidsPath(store)),
      dimStats(seed, vecCol).coalesce(1)
        .write.mode("overwrite").parquet(profilePath(store)))
    // the seed's own assignment recomputes against the PERSISTED
    // centroids — one code path for every batch in the store
    append(spark, seed, vecCol, idCol, store, batchId = 0L, dim = dim,
      nStoreBuckets = Some(nStoreBuckets))
  }

  /** Read back the persisted quantizer. */
  def centroids(spark: SparkSession, store: String): DataFrame =
    spark.read.parquet(centroidsPath(store))

  /** Assign one ingestion batch against the persisted quantizer and
    * append it to the inverted file as `batch=<batchId>` — O(batch)
    * work, corpus never touched. Replay-idempotent: a re-delivered
    * batch overwrites exactly its own `(gb, batch)` partitions.
    * Returns the batch's (id, cid, ccos) assignment.
    */
  def append(spark: SparkSession, batch: DataFrame, vecCol: String,
             idCol: String, store: String, batchId: Long, dim: Int,
             nStoreBuckets: Option[Int] = None): DataFrame = {
    val nB = nStoreBuckets
      .orElse(graft.cdc.BucketedLayout.readBucketCount(spark, assignPath(store)))
      .getOrElse(throw new IllegalStateException(
        s"$store has no assignment store yet — build() it, or pass nStoreBuckets"))
    graft.streaming.CdcStream.requireStoreBuckets(spark, assignPath(store), nB)
    val asg = assign(batch, vecCol, idCol, centroids(spark, store), dim)
    graft.streaming.CdcStream.writeStorePartitions(
      asg, pmod(col("cid"), lit(nB.toLong)).cast("int"), batchId,
      assignPath(store), nB)
    asg
  }

  /** The whole inverted file (every batch), with `gb`/`batch` riding
    * along — the search side's full view.
    */
  def assignments(spark: SparkSession, store: String): DataFrame =
    spark.read.option("basePath", assignPath(store)).parquet(assignPath(store))

  /** Posting lists for the probed centroids only: lists and reads
    * exactly the `gb=` dirs those cids hash to — O(probed buckets)
    * I/O, never O(store) (the IVF search contract).
    */
  def probe(spark: SparkSession, store: String, cids: Seq[Long]): DataFrame = {
    val nB = graft.cdc.BucketedLayout.readBucketCount(spark, assignPath(store))
      .getOrElse(throw new IllegalStateException(s"$store has no assignment store"))
    val buckets = cids.map(c => ((c % nB) + nB) % nB).map(_.toInt).distinct
    graft.streaming.CdcStream
      .probeStore(spark, assignPath(store), buckets, batchId = -1L)
      .map(_.filter(col("cid").isin(cids: _*)))
      .getOrElse(spark.emptyDataFrame)
  }

  /** Should the quantizer retrain? Compares an incoming batch's
    * per-dimension means against the persisted seed profile with
    * [[Similarity.embDrift]]'s integer arithmetic (micro-unit means,
    * matched truncation): one row out — (n_drifted, n_dims, decision)
    * with decision `recluster` iff at least `minDriftedDims`
    * dimensions moved more than `toleranceMicro`. A drifted embedding
    * distribution makes the frozen centroids a bad partition of the
    * new data (assignment cosines sag, posting lists skew) — that is
    * the moment to pay the O(corpus) [[recluster]], and not before.
    */
  def reclusterDecision(spark: SparkSession, store: String, batch: DataFrame,
                        vecCol: String, toleranceMicro: Long,
                        minDriftedDims: Long = 1L): DataFrame = {
    val ref = spark.read.parquet(profilePath(store))
      .select(col("dim_i"), col("n").as("n_ref"), col("s").as("s_ref"))
    dimStats(batch, vecCol)
      .join(broadcast(ref), Seq("dim_i"))
      .select(col("dim_i"),
        expr("(s_ref * 100L) div greatest(n_ref, 1L)").as("mean_ref_micro"),
        expr("(s * 100L) div greatest(n, 1L)").as("mean_cur_micro"))
      .withColumn("drifted",
        (abs(col("mean_ref_micro") - col("mean_cur_micro")) > toleranceMicro)
          .cast("long"))
      .agg(sum(col("drifted")).as("n_drifted"), count(lit(1)).as("n_dims"))
      .select(col("n_drifted"), col("n_dims"),
        when(col("n_drifted") >= minDriftedDims, "recluster")
          .otherwise("keep").as("decision"))
  }

  /** Top-k search over the PERSISTED index — [[Similarity.ivfTopK]]'s
    * search half against the store instead of a per-run derivation:
    * queries rank the broadcast persisted centroids (|q|×K rows, one
    * window partitioned by query id), and ONLY the probed centroids'
    * posting lists are read — bucket-dir-confined I/O through
    * [[probe]], exact cosine rerank from the vectors the postings
    * carry, rank ties to the smallest neighbor id. The corpus is
    * never rescanned, never shuffled: the |q|·nProbe probe table
    * broadcasts onto the posting read (the in-plan pin the r9 AQE
    * adjudication established for ivfTopK).
    */
  def searchTopK(spark: SparkSession, store: String, queries: DataFrame,
                 vecCol: String, idCol: String, k: Int, nProbe: Int,
                 dim: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cents = centroids(spark, store)
    val qc = prepared(queries, vecCol, idCol)
      .crossJoin(broadcast(cents))
      .withColumn("ccos",
        when(col("cn2") === 0 || col("n2") === 0, lit(-2.0))
          .otherwise(qdot(col("qv"), col("cqv"), Some(dim)).cast("double") /
            (sqrt(col("n2").cast("double")) * sqrt(col("cn2").cast("double")))))
    val probeW = Window.partitionBy(col("id"))
      .orderBy(col("ccos").desc, col("cid").asc)
    val probes = qc.withColumn("pr", row_number().over(probeW))
      .filter(col("pr") <= nProbe)
      .select(col("id").as("qid"), col("qv").as("qqv"),
        col("n2").as("qn2"), col("cid"))
    // probed centroid ids: ≤ K rows (the bounded-collect doctrine)
    val cids = probes.select("cid").distinct()
      .collect().map(_.getLong(0)).toSeq
    // pending deletions filter at query time (the tombstone set is
    // bounded between vacuums — broadcast anti-join)
    val posting = tombstones(spark, store) match {
      case Some(t) => probe(spark, store, cids)
        .join(broadcast(t), Seq("id"), "left_anti")
      case None => probe(spark, store, cids)
    }
    val rankW = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    broadcast(probes).join(posting, Seq("cid"))
      .filter(col("id") =!= col("qid"))
      .select(col("qid").as("query_id"), col("id").as("neighbor_id"),
        when(col("qn2") === 0 || col("n2") === 0, lit(-2.0))
          .otherwise(qdot(col("qqv"), col("qv"), Some(dim)).cast("double") /
            (sqrt(col("qn2").cast("double")) * sqrt(col("n2").cast("double"))))
          .as("cosine"))
      .withColumn("rank", row_number().over(rankW))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        round(col("cosine"), 6).as("cosine"))
  }

  /** Posting-list balance report over the persisted index — the
    * recall/latency predictor an IVF deployment watches: a cell
    * holding 10× its fair share makes every probe that hits it 10×
    * slower, and starved cells waste nProbe. Per centroid (EMPTY
    * cells included — a dead cell is a finding): vector count,
    * corpus share, and load vs perfect balance (`load_ppm` =
    * n·K·10⁶ div total; 10⁶ = exactly fair). One partial agg over
    * the inverted file + a broadcast join onto the K-row centroid
    * table; all-integer output.
    */
  def stats(spark: SparkSession, store: String): DataFrame = {
    val perCell = assignments(spark, store)
      .groupBy("cid").agg(count(lit(1)).as("n_vectors"))
    val cells = centroids(spark, store).select(col("cid"))
      .join(perCell, Seq("cid"), "left")
      .select(col("cid"), coalesce(col("n_vectors"), lit(0L)).as("n_vectors"))
    val tot = cells.agg(sum("n_vectors").as("total"),
      count(lit(1)).as("k"))
    cells.crossJoin(broadcast(tot))
      .select(col("cid"), col("n_vectors"),
        expr("n_vectors * 1000000 DIV greatest(total, 1)").as("share_ppm"),
        expr("n_vectors * k * 1000000 DIV greatest(total, 1)").as("load_ppm"))
  }

  /** Register deletions as ID TOMBSTONES (`tombs/batch=<id>`, one dir
    * per deletion batch — replay-idempotent: a re-delivered batch
    * overwrites its own dir). Deleting by id costs O(batch): the
    * inverted file is bucketed by CENTROID, so a physical per-id
    * delete would need an id→cid lookup the store doesn't carry —
    * the FAISS/Milvus answer is query-time tombstone filtering
    * ([[searchTopK]] anti-joins the broadcast tombstone set) plus a
    * periodic [[vacuum]]. Returns the batch's distinct id count.
    */
  def delete(spark: SparkSession, ids: DataFrame, idCol: String,
             store: String, batchId: Long): Long = {
    val d = ids.select(col(idCol).cast("long").as("id")).distinct()
      .persist()
    d.coalesce(1).write.mode("overwrite")
      .parquet(s"${tombsPath(store)}/batch=$batchId")
    val n = d.count(); d.unpersist(); n
  }

  /** The live tombstone set, if any deletions are pending. */
  def tombstones(spark: SparkSession, store: String): Option[DataFrame] = {
    val p = tombsPath(store)
    if (graft.util.Fs.existsNonEmpty(spark, p))
      Some(spark.read.parquet(p).select("id").distinct())
    else None
  }

  /** Physically fold pending tombstones into the inverted file —
    * offline maintenance (the VACUUM slot): affected buckets are
    * found by a column-pruned id scan, each folds ALL its `batch=`
    * dirs into one `batch=-(batchId+2)` base dir WITHOUT the
    * tombstoned ids (exact-duplicate rows collapse, so the fold is
    * safe even over a crash-overlapped base), then the tombstone dir
    * drops. Crash recovery = re-run with the SAME batchId (the
    * maintenance cycle id): an existing base dir skips its rebuild
    * and the replay finishes the source deletes — the CdcStream
    * replay-idempotence doctrine.
    *
    * @return per-bucket (bucket, rows_remaining)
    */
  /** Test-injectable failpoint (the A40 compactor's crash-drill
    * discipline applied to [[vacuum]]): invoked with a named point at
    * every crash-relevant boundary — `staged:<gb>` (fold written,
    * rename pending), `based:<gb>` (base renamed in, source dirs
    * still live), `bucket-done:<gb>` (between buckets),
    * `before-tombs-clear` (all buckets folded, tombstones pending).
    * Production leaves the no-op; the spec installs a throwing hook
    * and proves a re-run with the SAME batchId heals every window. */
  private[graft] var vacuumFailpoint: String => Unit = _ => ()

  def vacuum(spark: SparkSession, store: String, batchId: Long)
      : Seq[(Int, Long)] = {
    import org.apache.hadoop.fs.Path
    val f = graft.util.Fs.fs(spark, store)
    val tombs = tombstones(spark, store).getOrElse(return Nil)
    val affected = assignments(spark, store)
      .join(broadcast(tombs), Seq("id"))
      .select(col("gb")).distinct().collect().map(_.getInt(0)).toSeq.sorted
    val baseId = -batchId - 2
    val out = affected.map { k =>
      val bucketDir = s"${assignPath(store)}/gb=$k"
      val basePath = s"$bucketDir/batch=$baseId"
      val staging = s"$bucketDir/__staging_vacuum"
      val srcIds = f.listStatus(new Path(bucketDir)).map(_.getPath.getName)
        .filter(_.startsWith("batch=")).map(_.stripPrefix("batch=").toLong)
        .filter(_ != baseId)
      if (!f.exists(new Path(basePath))) {
        spark.read.option("basePath", bucketDir)
          .parquet(srcIds.map(id => s"$bucketDir/batch=$id").toIndexedSeq: _*)
          .join(broadcast(tombs), Seq("id"), "left_anti")
          .drop("batch").dropDuplicates()
          .coalesce(1).write.mode("overwrite").parquet(staging)
        vacuumFailpoint(s"staged:$k")
        if (!f.rename(new Path(staging), new Path(basePath)))
          throw new java.io.IOException(s"rename $staging -> $basePath failed")
      }
      vacuumFailpoint(s"based:$k")
      srcIds.foreach(id =>
        graft.util.Fs.delete(spark, s"$bucketDir/batch=$id"))
      graft.util.Fs.delete(spark, staging)
      vacuumFailpoint(s"bucket-done:$k")
      (k, spark.read.parquet(basePath).count())
    }
    vacuumFailpoint("before-tombs-clear")
    graft.util.Fs.delete(spark, tombsPath(store))
    out
  }

  /** Retrain the quantizer over the CURRENT corpus and rebuild the
    * inverted file from scratch (assign dir cleared first — stale
    * `batch=` dirs under old centroid ids must not survive a
    * re-partitioning of the space). The O(corpus) operation
    * [[reclusterDecision]] gates.
    */
  def recluster(spark: SparkSession, corpus: DataFrame, vecCol: String,
                idCol: String, k: Int, iters: Int, dim: Int, store: String,
                nStoreBuckets: Int): Unit =
    build(spark, corpus, vecCol, idCol, k, iters, dim, store, nStoreBuckets)
}
