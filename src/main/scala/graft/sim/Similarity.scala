package graft.sim

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Embedding similarity search (SURVEY §2 C5–C7): exact cosine
  * near-dup pairs, brute-force top-k ANN baseline, and seeded
  * random-hyperplane LSH bucketing as the scale path.
  *
  * Determinism across engines: floats are quantized to integers
  * (floor(x·10⁴)) first, so dot products and squared norms are exact
  * integer sums — order-independent, partial-aggregatable, and
  * bit-identical in DuckDB. The only floating-point steps are one
  * division and one sqrt over exact operands, which IEEE 754 defines
  * exactly on both engines.
  *
  * All expressions are Spark higher-order functions (transform /
  * zip_with / aggregate) — codegen'd, no UDFs, no Python.
  */
object Similarity {

  /** Quantize a float-array embedding column to exact integers. */
  def quantize(vec: Column): Column =
    transform(vec, x => floor(x.cast("double") * 10000).cast("long"))

  /** Exact integer dot product of two quantized vectors.
    *
    * With a known dimension the index range is a FOLDABLE literal and
    * the fold walks both arrays via element_at — no per-row zipped
    * array allocation (measured ~4× cheaper than zip_with in the
    * N²-pair hot path). Unknown dimension falls back to a per-row
    * sequence (still a flat long array, cheaper than zip_with's
    * array-of-structs).
    */
  def qdot(a: Column, b: Column, dim: Option[Int] = None): Column =
    if (SparkSession.active.catalog.functionExists("graft_dot"))
      // Native codegen'd expression (graft.functions.LongArrayDot):
      // tight primitive loop inside whole-stage codegen.
      call_function("graft_dot", a, b)
    else {
      // HOF fallback: interpreted per row; correct but ~10× slower in
      // pair-scan hot paths. Register graft.functions.GraftExtensions.
      val idx = dim.map(d => sequence(lit(0), lit(d - 1)))
        .getOrElse(sequence(lit(0), size(a) - 1))
      aggregate(idx, lit(0L),
        (acc, i) => acc + element_at(a, i + lit(1)) * element_at(b, i + lit(1)))
    }

  /** (id, qvec, norm2) — precomputed quantized vectors + squared norms. */
  def prepared(df: DataFrame, vecCol: String, idCol: String): DataFrame =
    df.select(col(idCol).as("id"), quantize(col(vecCol)).as("qv"))
      .withColumn("n2", qdot(col("qv"), col("qv")))

  private[sim] def cosine(dotC: Column, n2a: Column, n2b: Column): Column =
    dotC.cast("double") / (sqrt(n2a.cast("double")) * sqrt(n2b.cast("double")))

  /** All pairs with cosine ≥ threshold (embedding near-dup dedup).
    * Brute-force N²/2 pair scan — the CORRECTNESS baseline. At 100 TB
    * vector counts, use `hyperplaneBuckets` first and run this only
    * within buckets (see `annLshPairs`).
    */
  def cosinePairs(df: DataFrame, vecCol: String, idCol: String,
                  threshold: Double, dim: Option[Int] = None): DataFrame = {
    val p = prepared(df, vecCol, idCol)
    // The non-equi pair join plans as a nested-loop join that streams
    // the left side; a small parquet input arrives as ONE split, which
    // would serialize the whole N²/2 scan onto one core. Spread the
    // streamed side across the cluster first — each partition then
    // scans the broadcast side independently (block nested loop).
    val parallelism = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val a = p.select(col("id").as("id_a"), col("qv").as("qv_a"), col("n2").as("n2_a"))
      .repartition(parallelism, col("id_a"))
    val b = p.select(col("id").as("id_b"), col("qv").as("qv_b"), col("n2").as("n2_b"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cosine", cosine(qdot(col("qv_a"), col("qv_b"), dim), col("n2_a"), col("n2_b")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
  }

  /** Brute-force top-k cosine neighbors for a query subset (the exact
    * baseline every ANN variant is measured against). The query side
    * is broadcast — it is small by construction — so the big side
    * streams through one codegen stage with no shuffle before the
    * per-query top-k window.
    */
  def bruteForceTopK(df: DataFrame, vecCol: String, idCol: String,
                     queryPred: Column, k: Int, dim: Option[Int] = None): DataFrame = {
    val p = prepared(df, vecCol, idCol)
    val q = p.filter(queryPred)
      .select(col("id").as("query_id"), col("qv").as("qv_q"), col("n2").as("n2_q"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("id").asc)
    p.crossJoin(broadcast(q))
      .filter(col("id") =!= col("query_id"))
      .withColumn("cosine", cosine(qdot(col("qv"), col("qv_q"), dim), col("n2"), col("n2_q")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("id").as("neighbor_id"), col("rank"),
        round(col("cosine"), 6).as("cosine"))
  }

  /** FILTERED vector search — the multi-tenant / faceted shape every
    * deployed ANN system grows ("nearest neighbors WHERE tenant = X"):
    * top-k cosine neighbors restricted to candidates sharing the
    * query's `attrCol` value. The predicate applies BEFORE scoring
    * (join condition, not post-filter), so the scan prunes
    * non-matching candidates without paying their dot products and —
    * unlike post-filtering a plain top-k — the result can never come
    * back short because the unfiltered top-k happened to be all
    * other-tenant vectors. Same broadcast-query / map-side-scan shape
    * as [[bruteForceTopK]].
    */
  def bruteForceTopKFiltered(df: DataFrame, vecCol: String, idCol: String,
                             attrCol: String, queryPred: Column, k: Int,
                             dim: Option[Int] = None): DataFrame = {
    val p = df.select(col(idCol).as("id"), quantize(col(vecCol)).as("qv"),
        col(attrCol).as("attr"))
      .withColumn("n2", qdot(col("qv"), col("qv"), dim))
    val q = p.filter(queryPred)
      .select(col("id").as("query_id"), col("qv").as("qv_q"),
        col("n2").as("n2_q"), col("attr").as("attr_q"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("id").asc)
    p.join(broadcast(q), col("attr") <=> col("attr_q"))
      .filter(col("id") =!= col("query_id"))
      .withColumn("cosine",
        cosine(qdot(col("qv"), col("qv_q"), dim), col("n2"), col("n2_q")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("id").as("neighbor_id"),
        col("rank").cast("long").as("rank"), round(col("cosine"), 6).as("cosine"))
  }

  /** Seeded random-hyperplane LSH: `planes` pseudo-hyperplanes with
    * INTEGER weights w(p,i) = portableHash(seed:p:i) mod 2001 − 1000 ∈
    * [−1000, 1000]; bucket bit p = sign⟨qv, w(p)⟩. The dot product is
    * an exact integer sum — order-independent and bit-identical in the
    * DuckDB oracle — and deterministic given the seed. Bucket join
    * replaces the N² pair scan at scale.
    *
    * Index convention: i is 1-based (sequence(1, size)) to match SQL
    * engines whose lambda ordinality is 1-based.
    */
  def hyperplaneBuckets(df: DataFrame, vecCol: String, idCol: String,
                        planes: Int = 8, seed: Int = 42,
                        dim: Option[Int] = None): DataFrame = {
    val weight = (pCol: String, iCol: String) =>
      s"cast(conv(substr(md5(concat('$seed', ':', cast($pCol as string), ':', cast($iCol as string))), 1, 15), 16, 10) as bigint) % 2001 - 1000"
    val p = prepared(df, vecCol, idCol)
    dim match {
      case Some(d) =>
        // Known dimension: materialize each plane's weight VECTOR once
        // in a `planes`-row broadcast table, so the per-row path is a
        // pure integer element_at walk — zero md5 calls per data row
        // (vs planes×dim md5s per vector inline).
        val planesDf = df.sparkSession.range(planes).toDF("p")
          .withColumn("w", expr(
            s"transform(sequence(1, $d), i -> ${weight("p", "i")})"))
        p.crossJoin(broadcast(planesDf))
          .withColumn("dot", qdot(col("qv"), col("w"), Some(d)))
          .withColumn("bit", expr("case when dot >= 0 then 1L else 0L end"))
          .groupBy("id")
          .agg(sum(expr("bit * cast(pow(2, p) as bigint)")).as("bucket"))
      case None =>
        val dot =
          s"""aggregate(zip_with(qv, sequence(1, size(qv)),
             |  (x, i) -> x * (${weight("p", "i")})),
             |  0L, (acc, x) -> acc + x)""".stripMargin
        p.crossJoin(df.sparkSession.range(planes).toDF("p"))
          .withColumn("bit", expr(s"case when ($dot) >= 0 then 1L else 0L end"))
          .groupBy("id")
          .agg(sum(expr("bit * cast(pow(2, p) as bigint)")).as("bucket"))
    }
  }

  /** IVF-style ANN top-k: a coarse quantizer partitions the corpus
    * into centroid buckets; queries probe only the `nProbe` nearest
    * buckets. The 100 TB inverted-file path: search cost scales with
    * |probed buckets|, not |corpus|, and the bucket join is an
    * equi-join on centroid id (shuffle by bucket, AQE-skew-safe) —
    * never a global scan per query.
    *
    * Determinism (oracle-replayable): centroids are every
    * `centroidStep`-th vector; assignment is argmax cosine with
    * smallest-centroid-id tie-break, computed as a partial-aggregatable
    * struct-max (no N×K window sort); ranks tie-break on neighbor id.
    *
    * Sizing: K = N/centroidStep centroids; pick centroidStep ≈ √N so
    * both the assignment fan-out (N·K) and the probed-bucket size
    * (N/K·nProbe) stay ~N^1.5 / N^0.5 — the standard IVF balance. The
    * centroid table must fit in a broadcast; for K beyond that, IVF
    * becomes hierarchical (coarse-quantize the centroids themselves).
    */
  def ivfTopK(df: DataFrame, vecCol: String, idCol: String,
              queryPred: Column, k: Int, centroidStep: Long, nProbe: Int,
              dim: Option[Int] = None): DataFrame = {
    val p = prepared(df, vecCol, idCol)
    val cents = p.filter(pmod(col("id"), lit(centroidStep)) === 0)
      .select(col("id").as("cid"), col("qv").as("cqv"), col("n2").as("cn2"))
    val withCos = p.crossJoin(broadcast(cents))
      .withColumn("ccos", cosine(qdot(col("qv"), col("cqv"), dim), col("n2"), col("cn2")))
    // argmax(ccos), ties → smallest cid: max of (ccos, -cid) struct
    val assigned = withCos
      .groupBy("id")
      .agg(max(struct(col("ccos"), (-col("cid")).as("ncid"))).as("m"),
        first(col("qv")).as("qv"), first(col("n2")).as("n2"))
      .select(col("id"), col("qv"), col("n2"), (-col("m.ncid")).as("cid"))
    // queries probe their nProbe nearest centroids; reuse the
    // vector×centroid cosine scan rather than recomputing it
    val probeW = Window.partitionBy(col("id")).orderBy(col("ccos").desc, col("cid").asc)
    val probes = withCos.filter(queryPred)
      .withColumn("pr", row_number().over(probeW))
      .filter(col("pr") <= nProbe)
      .select(col("id").as("qid"), col("qv").as("qqv"), col("n2").as("qn2"), col("cid"))
    // search only the probed buckets: the probe table is |queries|·
    // nProbe rows and BROADCASTS onto the corpus-sized assignment —
    // without the hint AQE sometimes picks a sort-merge join here,
    // shuffling the whole corpus on cid (r9 bench regression, ~1.3 s
    // vs 0.76; adjudicated round 10). The corpus side never shuffles.
    val rankW = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    broadcast(probes).join(assigned, Seq("cid"))
      .filter(col("id") =!= col("qid"))
      .select(col("qid").as("query_id"), col("id").as("neighbor_id"),
        cosine(qdot(col("qqv"), col("qv"), dim), col("qn2"), col("n2")).as("cosine"))
      .withColumn("rank", row_number().over(rankW))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        round(col("cosine"), 6).as("cosine"))
  }

  /** Lloyd's k-means over quantized embeddings — the clustering stage
    * of SemDeDup-style semantic dedup ([[semanticDupPairs]]) and of
    * cluster-balanced data mixing. Assignment metric is cosine
    * (consistent with [[ivfTopK]]).
    *
    * Deterministic end-to-end: centroids initialize from the k vectors
    * with the smallest portable id-hash (TakeOrdered — per-partition
    * heaps, never a global sort), assignment ties break to the
    * smallest centroid index, and each centroid update is an exact
    * integer sum divided once then floored — identical across runs,
    * partitionings, and engines.
    *
    * Scale shape per iteration: broadcast the k×dim centroid table,
    * ONE map-side assignment (partial-aggregatable struct-max, no
    * window), and one update shuffle carrying k×dim rows; k×dim longs
    * collect to the driver (tiny). 100 TB corpora run the same loop
    * with k in the thousands; beyond broadcast range the assignment
    * becomes hierarchical exactly like IVF's quantizer.
    */
  def kmeans(df: DataFrame, vecCol: String, idCol: String,
             k: Int, iters: Int = 5, dim: Option[Int] = None): DataFrame = {
    val (assigned, _) = kmeansFull(df, vecCol, idCol, k, iters, dim)
    assigned.select(col("id"), col("cluster"),
      round(col("ccos"), 6).as("centroid_cosine"))
  }

  /** Assignments (id, qv, n2, cluster, ccos) + final centroids — the
    * full form [[semanticDupPairs]] and the specs build on.
    */
  private[graft] def kmeansFull(df: DataFrame, vecCol: String, idCol: String,
                                k: Int, iters: Int, dim: Option[Int])
      : (DataFrame, Array[(Long, Seq[Long])]) = {
    val spark = df.sparkSession
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val p = prepared(df, vecCol, idCol).persist(MEMORY_AND_DISK)
    p.count() // materialize before the iteration fans out
    var cents: Array[(Long, Seq[Long])] = p
      .withColumn("hk", graft.util.Hashing.portableHash64(col("id").cast("string")))
      .orderBy(col("hk"), col("id"))
      .select(col("qv")).limit(k)
      .collect().zipWithIndex
      .map { case (r, i) => (i.toLong, r.getSeq[Long](0)) }
    require(cents.nonEmpty, "kmeans needs a non-empty input")
    val dimN = dim.getOrElse(cents.head._2.length)

    def assign(): DataFrame = {
      val centDf = spark.createDataFrame(cents.toSeq.map { case (cid, v) =>
        (cid, v.toArray)
      }).toDF("cid", "cqv")
        .withColumn("cn2", qdot(col("cqv"), col("cqv"), Some(dimN)))
      p.crossJoin(broadcast(centDf))
        // zero-norm vectors/centroids score -2 everywhere → the tie
        // break (smallest cid) decides deterministically, no NaNs
        .withColumn("ccos", when(col("cn2") === 0 || col("n2") === 0, lit(-2.0))
          .otherwise(cosine(qdot(col("qv"), col("cqv"), Some(dimN)), col("n2"), col("cn2"))))
        .groupBy("id")
        .agg(max(struct(col("ccos"), (-col("cid")).as("ncid"))).as("m"),
          first(col("qv")).as("qv"), first(col("n2")).as("n2"))
        .select(col("id"), col("qv"), col("n2"),
          (-col("m.ncid")).as("cluster"), col("m.ccos").as("ccos"))
    }

    for (_ <- 0 until iters) {
      val sums = assign()
        .select(col("cluster"), posexplode(col("qv")).as(Seq("pos", "x")))
        .groupBy("cluster", "pos")
        .agg(sum(col("x")).as("s"), count(lit(1)).as("c"))
        .collect()
      val byCluster = sums.groupBy(_.getLong(0))
      cents = cents.map { case (cid, old) =>
        byCluster.get(cid) match {
          case Some(rows) => (cid, rows.sortBy(_.getInt(1)).toSeq
            // floorDiv on longs: the exact integer sum floored once —
            // a Double quotient is no longer exact past 2^53 (counts
            // are positive, so floorDiv == the floored rational)
            .map(r => Math.floorDiv(r.getLong(2), r.getLong(3))))
          case None => (cid, old) // empty cluster keeps its centroid
        }
      }
    }
    // final assignment under the converged centroids; truncated so the
    // vector cache can be released (same hygiene as the dedup family)
    val finalAssign = graft.util.Lineage.truncate(assign())
    p.unpersist()
    (finalAssign, cents)
  }

  /** SemDeDup-style semantic near-dup pairs: exact cosine, but only
    * WITHIN k-means clusters — like [[annLshPairs]] with learned
    * buckets instead of random hyperplanes, which concentrates true
    * near-dups into far fewer candidate pairs on clustered corpora.
    * Same verified-cosine output contract as [[cosinePairs]].
    */
  def semanticDupPairs(df: DataFrame, vecCol: String, idCol: String,
                       threshold: Double, k: Int, iters: Int = 5,
                       dim: Option[Int] = None): DataFrame = {
    val (assigned, _) = kmeansFull(df, vecCol, idCol, k, iters, dim)
    val a = assigned.select(col("cluster"), col("id").as("id_a"),
      col("qv").as("qv_a"), col("n2").as("n2_a"))
    val b = assigned.select(col("cluster"), col("id").as("id_b"),
      col("qv").as("qv_b"), col("n2").as("n2_b"))
    // no trailing distinct: each id has exactly ONE cluster row, so a
    // pair can't be emitted twice — a dedup here would be a pure
    // shuffle of the whole pair output
    a.join(b, Seq("cluster")).filter(col("id_a") < col("id_b"))
      .withColumn("cosine", cosine(qdot(col("qv_a"), col("qv_b"), dim), col("n2_a"), col("n2_b")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
  }

  /** Product-quantization ANN top-k — the memory-compressed 100 TB
    * path: each vector is encoded as `m` small codes (one per
    * subspace), so the searchable corpus shrinks from dim×4 bytes to
    * m bytes per vector (64-dim float → 8 bytes at m=8) and fits the
    * cluster's memory at vector counts where raw floats cannot.
    * Search is asymmetric distance computation (ADC): per query, an
    * m×`codes` lookup table of exact subspace distances is built
    * against the codebooks, broadcast, and each encoded vector's
    * approximate distance is the sum of m table lookups — a map-side
    * hash join + partial-aggregatable sum, never a full-precision scan.
    *
    * Deterministic and integer-exact end-to-end (oracle-replayable at
    * iters=0): codebooks initialize from the `codes` vectors with the
    * smallest portable id-hash, sliced per subspace; `iters` rounds of
    * Lloyd refinement under squared-L2 (exact integer sums,
    * floor-quantized centroid updates — same contract as [[kmeans]],
    * but all m subspaces train inside the SAME shuffles, keyed by
    * (sub, cid), so refinement cost does not grow with m); assignment
    * ties break to the smallest code id; ranks tie-break on neighbor
    * id. Approximate distances are exact BIGINTs.
    */
  def pqTopK(df: DataFrame, vecCol: String, idCol: String,
             queryPred: Column, k: Int, m: Int = 8, codes: Int = 16,
             iters: Int = 0, dim: Option[Int] = None): DataFrame = {
    val spark = df.sparkSession
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val p = prepared(df, vecCol, idCol)
    val dimN = dim.getOrElse(p.select(size(col("qv"))).head().getInt(0))
    require(dimN % m == 0, s"dim $dimN not divisible into $m subspaces")
    val w = dimN / m

    // (id, sub, sv, sn2): one row per vector per subspace
    val subs = p
      .select(col("id"), posexplode(expr(
        s"transform(sequence(0, ${m - 1}), s -> slice(qv, s * $w + 1, $w))"))
        .as(Seq("sub", "sv")))
      .withColumn("sn2", qdot(col("sv"), col("sv"), Some(w)))
      .persist(MEMORY_AND_DISK)
    subs.count() // materialize once: init, refinement, and encode all read it

    // Codebook init: subspace slices of the `codes` hash-ranked vectors
    // (TakeOrdered — per-partition heaps, no global sort).
    var cb: Seq[(Int, Int, Seq[Long])] = p
      .withColumn("hk", graft.util.Hashing.portableHash64(col("id").cast("string")))
      .orderBy(col("hk"), col("id"))
      .select(col("qv")).limit(codes)
      .collect().toSeq.zipWithIndex
      .flatMap { case (r, ci) =>
        val v = r.getSeq[Long](0)
        (0 until m).map(s => (s, ci, v.slice(s * w, s * w + w)))
      }
    require(cb.nonEmpty, "pqTopK needs a non-empty input")

    def cbDf() = spark.createDataFrame(
      cb.map { case (s, ci, v) => (s, ci.toLong, v.toArray) })
      .toDF("sub", "cid", "cqv")
      .withColumn("cn2", qdot(col("cqv"), col("cqv"), Some(w)))

    // argmin_{cid} ||sv - cqv||² = sn2 + cn2 - 2·⟨sv,cqv⟩ (exact ints),
    // ties → smallest cid: min of (dist, cid) struct, partial-agg'd.
    def assign(): DataFrame = subs
      .join(broadcast(cbDf()), Seq("sub"))
      .withColumn("dist",
        col("sn2") + col("cn2") - lit(2L) * qdot(col("sv"), col("cqv"), Some(w)))
      .groupBy("id", "sub")
      .agg(min(struct(col("dist"), col("cid"))).as("a"), first(col("sv")).as("sv"))
      .select(col("id"), col("sub"), col("a.cid").as("code"), col("sv"))

    for (_ <- 0 until iters) {
      // k×m×w longs to the driver — tiny at any corpus size
      val sums = assign()
        .select(col("sub"), col("code"), posexplode(col("sv")).as(Seq("pos", "x")))
        .groupBy("sub", "code", "pos")
        .agg(sum(col("x")).as("s"), count(lit(1)).as("c"))
        .collect()
      val byKey = sums.groupBy(r => (r.getInt(0), r.getLong(1)))
      cb = cb.map { case (s, ci, old) =>
        byKey.get((s, ci.toLong)) match {
          case Some(rows) => (s, ci, rows.sortBy(_.getInt(2)).toSeq
            // same floorDiv-on-longs exactness as the kmeansFull update
            .map(r => Math.floorDiv(r.getLong(3), r.getLong(4))))
          case None => (s, ci, old) // empty code keeps its centroid
        }
      }
    }

    val encoded = assign().select(col("id"), col("sub"), col("code"))

    // ADC lookup table: exact subspace distance of every (query, sub,
    // code) triple — |queries|·m·codes rows, broadcast.
    val qtab = subs.filter(queryPred)
      .select(col("id").as("query_id"), col("sub"),
        col("sv").as("qsv"), col("sn2").as("qsn2"))
      .join(broadcast(cbDf()), Seq("sub"))
      .select(col("query_id"), col("sub"), col("cid").as("code"),
        (col("qsn2") + col("cn2") - lit(2L) * qdot(col("qsv"), col("cqv"), Some(w)))
          .as("qdist"))

    val rankW = Window.partitionBy(col("query_id"))
      .orderBy(col("adist").asc, col("neighbor_id").asc)
    val out = encoded
      .join(broadcast(qtab), Seq("sub", "code"))
      .filter(col("id") =!= col("query_id"))
      .groupBy(col("query_id"), col("id").as("neighbor_id"))
      .agg(sum(col("qdist")).as("adist"))
      .withColumn("rank", row_number().over(rankW))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("adist"))
    val outM = graft.util.Lineage.truncate(out) // release the subspace cache eagerly
    subs.unpersist()
    outM
  }

  /** Cascade ANN — the deployed two-stage retrieval shape: a cheap
    * PQ/ADC pass shortlists `shortlist` candidates per query, then
    * EXACT cosine reranks ONLY the shortlisted pairs and keeps the
    * top `k`. PQ's compressed distances order candidates well but
    * rank poorly near the top (quantization error ~ codebook cell
    * size); the rerank restores exact top-k precision while reading
    * full-precision vectors for just |queries|·shortlist rows instead
    * of the whole corpus — the recall/precision split every
    * production vector store runs (FAISS IVFADC + refine, ScaNN's
    * reorder stage).
    *
    * Scale shape: the shortlist (|queries|·shortlist id pairs) and
    * the query vectors broadcast; the corpus contributes exactly one
    * scan, map-side — the rerank never shuffles the corpus. With
    * iters=0 the whole cascade is deterministic integer/md5
    * arithmetic + one double cosine per surviving pair, so the
    * DuckDB oracle replays it end-to-end.
    */
  /** Hard-negative mining for contrastive retrieval training — the
    * training-pair factory: for every labeled (query, positive) pair,
    * the top-k most-similar corpus vectors that are NOT the query and
    * NOT among its labeled positives (the "hard" negatives a bi-encoder
    * actually learns from; random negatives are too easy to move the
    * loss). Composes [[ivfTopK]]: the candidate shortlist comes from
    * the probed-bucket search at k + `slack` (slack ≥ the max
    * positives a query carries, so dropping them can't starve the
    * top-k), positives leave via one broadcast anti-join on
    * (query, neighbor), survivors re-rank to k. Scale cost = the IVF
    * search + an O(pairs) broadcast — the corpus still never shuffles.
    */
  def hardNegatives(df: DataFrame, vecCol: String, idCol: String,
                    pairs: DataFrame, queryPred: Column, k: Int,
                    slack: Int, centroidStep: Long, nProbe: Int,
                    dim: Option[Int] = None): DataFrame = {
    require(k >= 1 && slack >= 0, "need k >= 1, slack >= 0")
    val cand = ivfTopK(df, vecCol, idCol, queryPred, k + slack,
      centroidStep, nProbe, dim)
    val pos = pairs.select(col("query_id"), col("positive_id").as("neighbor_id"))
    val rankW = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    cand.join(broadcast(pos), Seq("query_id", "neighbor_id"), "left_anti")
      .withColumn("rank", row_number().over(rankW))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("cosine"))
  }

  /** Retrieval-quality evaluation against labeled (query, positive)
    * pairs — [[hardNegatives]]' measuring twin and the index-quality
    * gate an ANN deployment watches: for each labeled pair, the rank
    * of the positive in the top-k search results; aggregated to
    * MRR@k in exact micro units (Σ 10⁶ div rank, then div n — integer
    * end-to-end, so both engines agree bit-for-bit) and recall@k in
    * ppm. A positive outside the top-k contributes reciprocal rank 0
    * (the standard MRR@k convention). One row out.
    *
    * Scale: the search dominates (probed buckets); the label join is
    * an O(pairs) broadcast onto the k·|queries| result rows.
    */
  def retrievalEval(df: DataFrame, vecCol: String, idCol: String,
                    pairs: DataFrame, queryPred: Column, k: Int,
                    centroidStep: Long, nProbe: Int,
                    dim: Option[Int] = None): DataFrame = {
    val cand = ivfTopK(df, vecCol, idCol, queryPred, k, centroidStep,
      nProbe, dim)
    val hit = broadcast(pairs
        .select(col("query_id"), col("positive_id").as("neighbor_id")))
      .join(cand, Seq("query_id", "neighbor_id"), "left")
      .select(col("query_id"),
        coalesce(expr("1000000L div rank"), lit(0L)).as("rr_micro"),
        when(col("rank").isNotNull, 1L).otherwise(0L).as("hit"))
    hit.agg(count(lit(1)).as("n_queries"),
        sum(col("rr_micro")).as("srr"), sum(col("hit")).as("nhit"))
      .select(col("n_queries"),
        expr("srr div n_queries").as("mrr_micro"),
        expr("(nhit * 1000000L) div n_queries").as("recall_ppm"))
  }

  def cascadeTopK(df: DataFrame, vecCol: String, idCol: String,
                  queryPred: Column, k: Int, shortlist: Int,
                  m: Int = 8, codes: Int = 16, iters: Int = 0,
                  dim: Option[Int] = None): DataFrame = {
    require(shortlist >= k, s"shortlist $shortlist must be >= k $k")
    val short = pqTopK(df, vecCol, idCol, queryPred, shortlist, m, codes,
        iters, dim)
      .select(col("query_id"), col("neighbor_id"))
    val p = prepared(df, vecCol, idCol)
    val qs = p.filter(queryPred)
      .select(col("id").as("query_id"), col("qv").as("qqv"), col("n2").as("qn2"))
    broadcast(short)
      .join(p, col("neighbor_id") === col("id")) // fetch shortlist vectors only
      .join(broadcast(qs), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(qdot(col("qqv"), col("qv"), dim), col("qn2"), col("n2")).as("c"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("c").desc, col("neighbor_id").asc)))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        round(col("c"), 6).as("cosine"))
  }

  /** LSH-accelerated near-dup pairs: exact cosine, but only within
    * hyperplane buckets (candidate recall traded for the elimination
    * of the global N² join — the 100 TB path).
    */
  def annLshPairs(df: DataFrame, vecCol: String, idCol: String,
                  threshold: Double, planes: Int = 8, seed: Int = 42,
                  dim: Option[Int] = None): DataFrame = {
    val p = prepared(df, vecCol, idCol)
      .join(hyperplaneBuckets(df, vecCol, idCol, planes, seed, dim), "id")
    val a = p.select(col("bucket"), col("id").as("id_a"), col("qv").as("qv_a"), col("n2").as("n2_a"))
    val b = p.select(col("bucket"), col("id").as("id_b"), col("qv").as("qv_b"), col("n2").as("n2_b"))
    // no trailing distinct: hyperplaneBuckets emits ONE bucket row per
    // id, so a pair can't be emitted twice (a multi-probe layout would
    // need the dedup back)
    a.join(b, Seq("bucket")).filter(col("id_a") < col("id_b"))
      .withColumn("cosine", cosine(qdot(col("qv_a"), col("qv_b"), dim), col("n2_a"), col("n2_b")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
  }

  /** Deterministic ±1 sign matrix for [[project]]: sign(j, i) from the
    * parity of the portable md5 hash of "proj:j:i" — driver-side
    * constants that the DuckDB oracle re-derives from the identical
    * SQL md5 arithmetic.
    */
  def signMatrix(k: Int, dim: Int): Seq[Seq[Long]] =
    (0 until k).map { j =>
      (0 until dim).map { i =>
        if (graft.util.Hashing.portableHash64Const(s"proj:$j:$i") % 2 == 0) 1L else -1L
      }
    }

  /** Random-projection (Achlioptas ±1 / Johnson–Lindenstrauss)
    * dimensionality reduction: each quantized input vector maps to k
    * exact-integer components out_j = Σ_i qv_i · sign(j, i). The
    * standard cheap pre-step before ANN indexing or near-dup search
    * when embeddings are wider than the index wants — JL says pairwise
    * distances survive to within ε at k = O(log n / ε²), and the ±1
    * family (Achlioptas 2003) needs no floats at all, so the output is
    * engine- and order-exact (DuckDB hash-gateable), unlike a Gaussian
    * matrix.
    *
    * Scale shape: the sign matrix is a PLAN-TIME literal (k·dim
    * values, ~1 KB — the same trick as the MinHash coefficient
    * literals), so projection is a pure per-row codegen'd fold: zero
    * shuffles, zero joins, output partitioned like the input. k·dim
    * multiply-adds per row is the same work the first ANN probe would
    * do anyway, paid once.
    */
  def project(df: DataFrame, vecCol: String, idCol: String,
              k: Int, dim: Int): DataFrame = {
    // One qdot per output component against a LITERAL sign vector —
    // with GraftExtensions registered each is the codegen'd primitive
    // loop (graft_dot), so the whole projection stays inside
    // whole-stage codegen. The nested-HOF alternative (transform ×
    // aggregate × element_at into a 2-D literal) evaluates every
    // multiply through the interpreted lambda path — measured ~50×
    // slower at k=16, dim=64.
    val signs = signMatrix(k, dim)
    val comps = (0 until k).map(j => qdot(col("qv"), typedlit(signs(j)), Some(dim)))
    df.select(col(idCol).as("id"), quantize(col(vecCol)).as("qv"))
      .select(col("id"), array(comps: _*).as("proj"))
  }

  /** Symmetric int8 quantization of an embedding column — the
    * storage/bandwidth form a 100 TB vector corpus actually ships
    * (4× smaller than float32, SIMD-friendly dot products): per
    * vector, scale = max|x| and code_j = round(x_j·127/scale) ∈
    * [−127, 127], with the scale kept in micro-units for exact
    * round-tripping of the dequant factor. Zero vectors quantize to
    * all-zero codes with scale 0. Reconstruction error is bounded by
    * scale/254 per component (spec-pinned).
    *
    * Engine-exact: one double multiply + divide per component in a
    * fixed order, and `round` is half-away-from-zero on BOTH engines,
    * so codes hash-gate; output explodes to (vec_id, j, code) scalars
    * (the emb_project gate convention). Pure per-row arithmetic, zero
    * shuffles — scan speed at any corpus size.
    */
  def quantizeInt8(df: DataFrame, vecCol: String, idCol: String): DataFrame =
    df.select(col(idCol).as("vec_id"), col(vecCol).as("v"))
      .filter(col("v").isNotNull)
      .withColumn("amax",
        expr("array_max(transform(v, x -> abs(cast(x as double))))"))
      .withColumn("j", explode(expr("sequence(1, size(v))")))
      .select(col("vec_id"), col("j").cast("long").as("j"),
        when(col("amax") > 0,
          expr("round(cast(element_at(v, j) as double) * 127 / amax)"))
          .otherwise(lit(0)).cast("int").as("code"),
        round(col("amax") * 1e6).cast("long").as("scale_micro"))

  /** Embedding-table health profile — the pre-ANN QA gate every
    * similarity deployment runs before trusting cosine arithmetic:
    * null vectors, wrong-width vectors and all-zero vectors (each of
    * which silently poisons cosine: 0-norm divides, truncated dots),
    * plus the squared-norm distribution (quantized-integer n2, the
    * exact quantity every op in this file scores with): p50/p95
    * percentiles and the exact total. An embedding dump whose n2_p50
    * drifts between snapshots was re-normalized or re-trained —
    * re-cluster before reusing centroids/codebooks.
    *
    * Exactness: n2 is the exact integer Σ(floor(x·10⁴))²; counts are
    * longs; the percentiles are the LOWER exact quantiles — the n2
    * value at 0-based rank floor(p·(m−1)) of the ascending non-null
    * order, i.e. an actual sampled long, computed with integer
    * arithmetic end-to-end (rank thresholds via `div`, never a
    * double). Interpolated percentiles (round 8) hash-FAILED the
    * driver's gate: Spark `percentile` and DuckDB `quantile_cont`
    * interpolate in different ulp paths across builds, and
    * round(double, k) is not a stable output contract. A sampled long
    * is. The total `sum_n2` is a BIGINT (round 9's decimal(38,0)
    * hash-FAILED the driver's type-sensitive compare against DuckDB's
    * HUGEINT — the q_changepoint lesson, PERF.md). Headroom: a
    * unit-norm vector has n2 ≈ 1e8 regardless of dim (Σ(floor(x·1e4))²
    * ≤ 1e8·‖x‖²), so the long total overflows only past ~9.2e10
    * vectors; for unnormalized corpora with max‖x‖² = B the bound is
    * 2⁶³/(1e8·B) rows — document B when profiling such a dump.
    *
    * Scale shape: one map-side-combined stats aggregate, plus the
    * exact-quantile side plan — a per-value count aggregate (partial,
    * |distinct n2| rows), then a BUCKETED rank walk: distinct n2
    * values are range-bucketed into ≤4097 width-`(hi−lo) div 4096 + 1`
    * buckets, per-bucket counts collapse to a ≤4097-row table whose
    * cumulative offsets come from a broadcast triangular self-join
    * (bounded by construction), and the in-bucket cumulative window is
    * PARTITIONED by bucket — no partition-less WindowExec over
    * unbounded distinct norms anywhere in the plan (the round-9 plan
    * ran one global `Window.orderBy(n2)`: fine at sf scale where
    * distinct norms are few, a single-task bottleneck on a real
    * unnormalized corpus where they are ~N).
    */
  def embProfile(df: DataFrame, vecCol: String, idCol: String,
                 dim: Int): DataFrame = {
    val base = df.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("ok", col("v").isNotNull && size(col("v")) === dim)
      .withColumn("qv", when(col("ok"), quantize(col("v"))))
      .withColumn("n2", when(col("ok"), qdot(col("qv"), col("qv"), Some(dim))))
    val stats = base.agg(
      count(lit(1)).as("n_vecs"),
      sum(when(col("v").isNull, 1L).otherwise(0L)).as("n_null"),
      sum(when(col("v").isNotNull && size(col("v")) =!= dim, 1L)
        .otherwise(0L)).as("n_bad_dim"),
      sum(when(col("n2") === 0L, 1L).otherwise(0L)).as("n_zero"),
      sum(col("n2")).as("sum_n2"))
    val counts = base.filter(col("n2").isNotNull)
      .groupBy("n2").agg(count(lit(1)).as("cnt"))
    // Range-bucket the distinct norms so the rank walk never needs a
    // global window: bucket width keeps the bucket table ≤4097 rows.
    val range = counts.agg(min(col("n2")).as("lo"), max(col("n2")).as("hi"),
      sum(col("cnt")).as("m"))
    val bucketed = counts.crossJoin(broadcast(range))
      .withColumn("w", expr("(hi - lo) div 4096 + 1"))
      .withColumn("bkt", expr("(n2 - lo) div w"))
    val bcnt = bucketed.groupBy("bkt").agg(sum(col("cnt")).as("bc"))
    // Cumulative count of all buckets strictly below each bucket —
    // a triangular self-join over a ≤4097-row broadcast table.
    val boff = bcnt.as("a")
      .join(broadcast(bcnt.as("b")), col("b.bkt") < col("a.bkt"), "left")
      .groupBy(col("a.bkt").as("bkt"))
      .agg(coalesce(sum(col("b.bc")), lit(0L)).as("off"))
    val wCum = Window.partitionBy(col("bkt")).orderBy(col("n2"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // rank k is covered once the cumulative count reaches k+1; the
    // smallest such n2 is the quantile. p95 threshold 19/20 in exact
    // integer division — no float ever touches the rank math.
    val qs = bucketed.join(broadcast(boff), Seq("bkt"))
      .withColumn("cum", col("off") + sum(col("cnt")).over(wCum))
      .agg(
        min(when(col("cum") >= expr("(m - 1) div 2 + 1"), col("n2")))
          .as("n2_p50"),
        min(when(col("cum") >= expr("((m - 1) * 19) div 20 + 1"), col("n2")))
          .as("n2_p95"))
    stats.crossJoin(qs)
      .select(col("n_vecs"), col("n_null"), col("n_bad_dim"), col("n_zero"),
        col("n2_p50"), col("n2_p95"), col("sum_n2"))
  }

  /** Per-dimension drift between two embedding snapshots — the
    * embedding twin of `profile_diff` (which watches numeric COLUMNS;
    * an embedding column is d numeric columns hiding in an array):
    * a re-embedding with a different model, an unnormalized writer
    * batch, or a preprocessing change shifts per-dimension means and
    * magnitudes long before any retrieval metric notices. Reports, per
    * dimension: side counts, means (micro-units) and mean squared
    * magnitudes (1e-8 units), plus an integer drift flag at
    * `toleranceMicro` on the mean delta.
    *
    * Integer-exact: components quantize floor(x·10⁴) (the file-wide
    * convention), all sums long and order-independent, means via
    * matched-truncation division — byte-identical on both engines.
    *
    * Scale shape: ONE union scan, posexplode to (side, i, q) narrow
    * rows, ONE partial-aggregatable groupBy(i) — map-side combine
    * collapses every partition to ≤ 2d rows, so the shuffle carries
    * O(partitions·d) tiny rows at any corpus size; d rows out. The
    * snapshots are never joined row-to-row.
    */
  def embDrift(ref: DataFrame, cur: DataFrame, vecCol: String,
               toleranceMicro: Long): DataFrame = {
    def side(df: DataFrame, s: String) =
      df.select(lit(s).as("side"),
        posexplode(quantize(col(vecCol))).as(Seq("i", "q")))
    val agg = side(ref, "ref").unionByName(side(cur, "cur"))
      .groupBy("i").agg(
        sum(when(col("side") === "ref", 1L).otherwise(0L)).as("n_ref"),
        sum(when(col("side") === "cur", 1L).otherwise(0L)).as("n_cur"),
        sum(when(col("side") === "ref", col("q")).otherwise(0L)).as("s_ref"),
        sum(when(col("side") === "cur", col("q")).otherwise(0L)).as("s_cur"),
        sum(when(col("side") === "ref", col("q") * col("q")).otherwise(0L))
          .as("ss_ref"),
        sum(when(col("side") === "cur", col("q") * col("q")).otherwise(0L))
          .as("ss_cur"))
    // greatest(n, 1): a missing side reads mean 0 with its honest
    // n = 0 — never a null that breaks the tuple-hash gate
    agg.select(col("i").cast("long").as("dim_i"),
        col("n_ref"), col("n_cur"),
        expr("(s_ref * 100L) div greatest(n_ref, 1L)").as("mean_ref_micro"),
        expr("(s_cur * 100L) div greatest(n_cur, 1L)").as("mean_cur_micro"),
        expr("ss_ref div greatest(n_ref, 1L)").as("msq_ref_e8"),
        expr("ss_cur div greatest(n_cur, 1L)").as("msq_cur_e8"))
      .withColumn("delta_micro",
        abs(col("mean_ref_micro") - col("mean_cur_micro")))
      .withColumn("drifted",
        (col("delta_micro") > toleranceMicro).cast("int"))
  }

  /** Exact covariance sufficient statistics of the embedding corpus —
    * the distributed-linear-algebra primitive under PCA, whitening and
    * Mahalanobis outlier scoring: the full second-moment (Gram)
    * matrix Σxᵢxⱼ, the first-moment vector Σxᵢ, and the row count, in
    * ONE pass. Everything downstream (covariance, eigenvectors) is
    * driver-side d×d arithmetic on these d(d+1)/2 + d + 1 numbers.
    *
    * Exactness: components quantize to integers (floor(x·10⁴), the
    * file-wide convention), so every sum is an order-independent
    * integer total — bit-identical in DuckDB regardless of partition
    * or join order; no float ever accumulates.
    *
    * Scale shape: the upper-triangle products are built per row as
    * ONE flat struct array (nested transform over a foldable index
    * sequence — no self-join, no per-(i,j) array re-allocation) and
    * exploded straight into a partial-aggregatable groupBy: map-side
    * combine collapses every partition to ≤ d(d+1)/2 rows, so the
    * shuffle carries O(partitions·d²) tiny rows no matter how many
    * vectors the corpus holds — the same reduction treeAggregate-based
    * Gramians perform, expressed declaratively. The d× explode factor
    * is the honest per-row cost (d²/2 products must be computed
    * somewhere); nothing wide ever crosses the wire.
    *
    * Output rows: (i, j, g) with 0 ≤ i ≤ j < d the second moments;
    * (i, -1, Σxᵢ) the first moments; (-1, -1, n) the count.
    */
  def gramStats(df: DataFrame, vecCol: String, dim: Int): DataFrame = {
    val q = df.select(quantize(col(vecCol)).as("qv"))
      .filter(col("qv").isNotNull && size(col("qv")) === dim)
    val pairs = flatten(transform(sequence(lit(0), lit(dim - 1)), i =>
      transform(sequence(i, lit(dim - 1)), j =>
        struct(i.as("i"), j.as("j"),
          (element_at(col("qv"), i + lit(1)) *
            element_at(col("qv"), j + lit(1))).as("p")))))
    val second = q.select(explode(pairs).as("s"))
      .groupBy(col("s.i").as("i"), col("s.j").as("j"))
      .agg(sum(col("s.p")).as("g"))
    val first = q.select(posexplode(col("qv")).as(Seq("i", "qi")))
      .groupBy("i").agg(sum(col("qi")).as("g"))
      .select(col("i"), lit(-1).as("j"), col("g"))
    val cnt = q.agg(count(lit(1)).as("g"))
      .select(lit(-1).as("i"), lit(-1).as("j"), col("g"))
    second.select(col("i"), col("j"), col("g"))
      .unionAll(first).unionAll(cnt)
      .select(col("i").cast("long").as("i"), col("j").cast("long").as("j"),
        col("g").cast("long").as("g"))
  }

  /** Embedding outlier scan — corrupted-vector detection for a
    * training corpus (a truncated write, a wrong-model batch, a
    * zeroed row): per-vector diagonal Mahalanobis score against the
    * corpus' own exact moments, top-k by score. The diagonal form is
    * the deliberate scale choice: it needs only d variances (one
    * [[gramStats]]-style aggregate), catches the per-dimension
    * excursions corruption actually produces, and never inverts a
    * d×d matrix per row.
    *
    * Integer-exact contract: with n, s_i = Σq_i, g_i = Σq_i² exact
    * longs, the mean and variance are floored to the quantized unit
    * first — μ̂_i = s_i div n, σ̂²_i = (n·g_i − s_i²) div n² (matched
    * toward-zero truncation on both engines) — and each dimension's
    * term is (q_i − μ̂_i)²·10⁶ div σ̂²_i: per-dim z² in micro units
    * with every intermediate product bounded by ~4·10¹⁴ (deviation ≤
    * 2·10⁴ quanta), far inside a signed 64-bit. The integer division
    * per dimension makes the per-vector sum a sum of longs —
    * order-independent, bit-identical cross-engine. Dimensions whose
    * floored variance is ≤ 0 (constant to within one quantum)
    * contribute 0 — no signal, no division. At n beyond ~10⁹ rows the
    * moment sums move to decimal(38,0) (the embProfile convention);
    * the per-row arithmetic is unchanged.
    *
    * Scale shape: ONE wide moment aggregate (2d+1 partial-aggregated
    * sums, |1| row) broadcast back onto the scan; per-row scoring is
    * a d-step fold fused into the projection; top-k is
    * TakeOrderedAndProject (never a global sort). Two passes over the
    * corpus, both linear, no shuffle of vector rows.
    */
  def embOutliers(df: DataFrame, vecCol: String, idCol: String,
                  dim: Int, topK: Int = 25): DataFrame = {
    val q = df.select(col(idCol).as("id"), quantize(col(vecCol)).as("qv"))
      .filter(col("qv").isNotNull && size(col("qv")) === dim)
    val statAggs = Seq(count(lit(1)).as("n")) ++
      (0 until dim).flatMap { i =>
        Seq(sum(element_at(col("qv"), i + 1)).as(s"s$i"),
          sum(element_at(col("qv"), i + 1) * element_at(col("qv"), i + 1))
            .as(s"g$i"))
      }
    val stats = q.agg(statAggs.head, statAggs.tail: _*)
      .select(col("n"),
        array((0 until dim).map(i => col(s"s$i")): _*).as("sv"),
        array((0 until dim).map(i => col(s"g$i")): _*).as("gv"))
    // the per-dim term needs integer `div` INSIDE the fold lambda;
    // `div` has no Column-API form and expr() can't see lambda
    // variables, so the whole fold is one SQL lambda expression
    val scored = q.crossJoin(broadcast(stats))
      .select(col("id").as("vec_id"),
        expr(s"""aggregate(sequence(0, ${dim - 1}), 0L, (acc, i) ->
          acc + (CASE WHEN (n * element_at(gv, i + 1)
                            - element_at(sv, i + 1) * element_at(sv, i + 1))
                           div (n * n) > 0
            THEN ((element_at(qv, i + 1) - (element_at(sv, i + 1) div n))
                  * (element_at(qv, i + 1) - (element_at(sv, i + 1) div n))
                  * 1000000L)
              div ((n * element_at(gv, i + 1)
                    - element_at(sv, i + 1) * element_at(sv, i + 1))
                   div (n * n))
            ELSE 0L END))""").as("score_micro"))
    scored
      .orderBy(col("score_micro").desc, col("vec_id").asc)
      .limit(topK)
  }

  /** Top principal component by power iteration over [[gramStats]]'
    * exact moments — embedding-drift/structure analysis at corpus
    * scale: ONE distributed pass collects the d(d+1)/2+d+1 sufficient
    * statistics, then the eigen-solve is a driver-side d×d loop (d is
    * the embedding width — 64 here — so the driver work is microscopic
    * and the cluster never iterates).
    *
    * Determinism (spec-pinned, rows-only gate — the kmeans/bpe_merges
    * convention, with [[gramStats]] as the hash-gated distributed
    * twin): covariance entries derive from exact integer moments; the
    * start vector is the standard basis vector of the LARGEST diagonal
    * variance (ties → lowest index — a data-derived deterministic
    * seed, never RNG); a FIXED iteration count (no float-threshold
    * convergence test to flip across platforms); and the sign is
    * normalized so the largest-|loading| component is positive.
    * Returns one row per dimension: (i, loading_micro, ev_share_micro)
    * — loadings of the unit eigenvector in micro units, plus the
    * explained-variance share λ₁/trace (same value on every row).
    */
  def pca1(df: DataFrame, vecCol: String, dim: Int,
           iters: Int = 24): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val spark = df.sparkSession
    val rows = gramStats(df, vecCol, dim).collect()
    var n = 0.0
    val s = new Array[Double](dim)
    val g = Array.ofDim[Double](dim, dim)
    rows.foreach { r =>
      val (i, j, v) = (r.getLong(0).toInt, r.getLong(1).toInt, r.getLong(2).toDouble)
      if (i == -1) n = v
      else if (j == -1) s(i) = v
      else { g(i)(j) = v; g(j)(i) = v }
    }
    require(n > 1, s"pca1 needs at least 2 valid vectors, got ${n.toLong}")
    // covariance (population): C = G/n − (s/n)(s/n)ᵀ
    val c = Array.tabulate(dim, dim)((i, j) => g(i)(j) / n - (s(i) / n) * (s(j) / n))
    var v = new Array[Double](dim)
    val seed = (0 until dim).maxBy(i => (c(i)(i), -i))
    v(seed) = 1.0
    for (_ <- 0 until iters) {
      val w = Array.tabulate(dim)(i => (0 until dim).map(j => c(i)(j) * v(j)).sum)
      val norm = math.sqrt(w.map(x => x * x).sum)
      v = if (norm == 0.0) v else w.map(_ / norm)
    }
    val lambda = (0 until dim).map(i => (0 until dim).map(j => v(i) * c(i)(j) * v(j)).sum).sum
    val trace = (0 until dim).map(i => c(i)(i)).sum
    val flip = if (v(v.indices.maxBy(i => (math.abs(v(i)), -i))) < 0) -1.0 else 1.0
    val share = math.floor(lambda / trace * 1e6).toLong
    import spark.implicits._
    v.indices.map(i => (i.toLong, math.floor(v(i) * flip * 1e6).toLong, share))
      .toDF("i", "loading_micro", "ev_share_micro")
  }

  /** SEMANTIC eval-set contamination scan — the embedding-level
    * decontamination check n-gram matching can't do (text_contamination
    * catches verbatim and near-verbatim leakage; a paraphrased or
    * translated eval item shares no 8-grams but sits right next to its
    * source in embedding space): for every probe (eval) vector, the
    * number of corpus vectors with cosine ≥ `threshold`, plus the top
    * match (cosine in floored micro units — an integer output, no
    * cross-engine double contract — ties to the smallest corpus id;
    * −2 000 000 sentinel when nothing clears the threshold). Probes
    * with ZERO hits still report — the absence of contamination is the
    * result the release sign-off reads.
    *
    * Scale shape: the probe set broadcasts (an eval set is small by
    * construction) and the corpus never shuffles — one scan, one
    * partial-agg per-probe fold. This is the brute per-pair baseline
    * (the dedup_embedding convention); at corpus scales where even one
    * broadcast scan per release is too slow, run the probes through
    * [[hyperplaneBuckets]] and scan only shared buckets — the
    * `ann_lsh_pairs` path with probes as one side.
    */
  def semanticContamination(df: DataFrame, vecCol: String, idCol: String,
                            probePred: Column, threshold: Double,
                            dim: Option[Int] = None): DataFrame = {
    val p = prepared(df.filter(col(vecCol).isNotNull), vecCol, idCol)
    val probes = p.filter(probePred)
      .select(col("id").as("eval_id"), col("qv").as("pqv"),
        col("n2").as("pn2"))
    val hits = p.filter(!probePred)
      .crossJoin(broadcast(probes))
      .withColumn("cos",
        cosine(qdot(col("qv"), col("pqv"), dim), col("n2"), col("pn2")))
      .filter(col("cos") >= threshold)
      .groupBy("eval_id")
      .agg(count(lit(1)).as("n_hits"),
        max(struct(floor(col("cos") * 1e6).cast("long").as("cm"),
          (-col("id")).as("nid"))).as("m"))
    probes.select("eval_id").join(broadcast(hits), Seq("eval_id"), "left")
      .select(col("eval_id"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        coalesce(col("m.cm"), lit(-2000000L)).as("top_cos_micro"),
        coalesce((-col("m.nid")), lit(-1L)).as("top_id"))
  }

  /** NN-descent k-NN graph construction (Dong et al., WWW 2011) — the
    * build stage of graph-based ANN (HNSW/NSG lineage), the modern
    * default where IVF/PQ's cell boundaries cost recall: start from an
    * arbitrary k-neighbor graph and repeatedly let every node meet its
    * neighbors' neighbors, keeping the best k — converges toward the
    * true k-NN graph in O(log n)-ish rounds because "a neighbor of my
    * neighbor is likely my neighbor" on real metric data.
    *
    * Deterministic, oracle-replayable construction:
    *  - init: hash-ring — nodes bucket by portable-hash(id) mod
    *    `buckets`; each node's seed neighbors are its bucket's k
    *    smallest (hash, id) peers. No global rank, no randomness, and
    *    the same md5 arithmetic replays in DuckDB. (Production NN-
    *    descent inits uniformly at random; any arbitrary graph works —
    *    the hash ring is the deterministic choice.)
    *  - one round: candidates = current ∪ reversed ∪ two-hop
    *    (neighbor-of-neighbor) edges, dedup'd, scored exactly
    *    (integer qdot, the file-wide convention), merged with the
    *    incumbents, top-k by (cosine desc, id asc) per node. This is
    *    the textbook local join; the published sampling knob ρ (score
    *    only a ρ-fraction of candidates per round) is the production
    *    lever against the k² candidate factor — the gated variant
    *    scores all candidates so both engines replay bit-for-bit.
    *
    * Scale shape per round: candidate generation is one self-join of
    * the k·N edge table on the shared key (~k²·N rows out), candidate
    * dedup and the top-k window both partition by node id — every
    * shuffle is id-keyed and partial-aggregatable, nothing global,
    * no broadcast of anything corpus-sized; lineage truncated per
    * round (the Graph.pageRank discipline). Output k·N rows.
    *
    * `diversify = true` turns on α-RNG neighbor diversification (see
    * the inline note at the prune): the rounds carry a 3k candidate
    * pool and the final per-node edge list keeps, in cosine order,
    * only candidates not occluded by a better-ranked one — same ≤ k
    * out-degree, more of the budget spent on edges that reach NEW
    * neighborhoods, which is what the beam search pays for. Off by
    * default: every existing gate replays the raw top-k construction.
    */
  def nnDescent(df: DataFrame, vecCol: String, idCol: String,
                k: Int, iters: Int, buckets: Int,
                dim: Option[Int] = None,
                diversify: Boolean = false): DataFrame = {
    require(k >= 1 && iters >= 0 && buckets >= 1,
      s"bad k=$k iters=$iters buckets=$buckets")
    val p = prepared(
      df.filter(col(vecCol).isNotNull &&
        dim.map(d => size(col(vecCol)) === d).getOrElse(lit(true))),
      vecCol, idCol)
    // diversification needs material to choose from: carry a 3k pool
    // through the rounds, prune to k edges at the end
    val poolK = if (diversify) 3 * k else k
    val hid = graft.util.Hashing.portableHash64(col("id").cast("string"))
    val ids = p.select(col("id"), pmod(hid, lit(buckets.toLong)).as("bkt"),
      hid.as("hid"))
    val wSeed = Window.partitionBy(col("id")).orderBy(col("nhid"), col("nid"))
    var cur: DataFrame = ids.as("a")
      .join(ids.as("b"),
        col("a.bkt") === col("b.bkt") && col("a.id") =!= col("b.id"))
      .select(col("a.id").as("id"), col("b.id").as("nid"),
        col("b.hid").as("nhid"))
      .withColumn("rn", row_number().over(wSeed)).filter(col("rn") <= poolK)
      .select(col("id"), col("nid"))
    def score(cand: DataFrame): DataFrame =
      cand.join(p.select(col("id"), col("qv").as("qv_a"), col("n2").as("n2_a")),
          Seq("id"))
        .join(p.select(col("id").as("nid"), col("qv").as("qv_b"),
          col("n2").as("n2_b")), Seq("nid"))
        .select(col("id"), col("nid"),
          cosine(qdot(col("qv_a"), col("qv_b"), dim),
            col("n2_a"), col("n2_b")).as("cos"))
    var scored = score(cur)
    val wTop = Window.partitionBy(col("id"))
      .orderBy(col("cos").desc, col("nid").asc)
    (1 to iters).foreach { _ =>
      val edges = scored.select(col("id"), col("nid"))
      val rev = edges.select(col("nid").as("id"), col("id").as("nid"))
      val two = edges.as("x")
        .join(edges.select(col("id").as("nid"), col("nid").as("far")).as("y"),
          Seq("nid"))
        .select(col("id"), col("far").as("nid"))
        .filter(col("id") =!= col("nid"))
      val cand = edges.unionByName(rev).unionByName(two).distinct()
        .join(scored.select(col("id"), col("nid")), Seq("id", "nid"),
          "left_anti")
      // lazy: fixed-iter loop, no per-round driver probe — the plan is
      // cut per round, blocks materialize in the caller's one action
      scored = graft.util.Lineage.truncateLazy(
        score(cand).unionByName(scored)
          .withColumn("rn", row_number().over(wTop)).filter(col("rn") <= poolK)
          .drop("rn"))
    }
    val edgesOut =
      if (!diversify) scored
      else {
        // α-RNG neighbor diversification (the HNSW select-neighbors
        // idea; DiskANN's occlusion rule): a candidate c is PRUNED
        // when some better-ranked candidate b sits closer to c than
        // the node itself does — cos(b,c) > cos(node,c) — because the
        // b-edge already routes the beam into c's neighborhood, and a
        // k-budget spent on c's near-twin buys no new reachability.
        // This is the non-recursive variant (c is tested against ALL
        // better-ranked candidates, kept or pruned — a strictly more
        // aggressive prune than HNSW's sequential one) because it is
        // a pure self-join + aggregate: no per-node sequential fold,
        // so it stays plan-shaped and deterministic. Strict >: a tie
        // keeps the candidate (favors retaining cross-cluster edges,
        // whose cosines tie around the between-cluster baseline).
        // Cost: one poolK²-per-node pair join at build time, O(N·k²·d)
        // — the build-time price for recall-per-edge at search time.
        val pool = graft.util.Lineage.truncate(
          scored.withColumn("rn", row_number().over(wTop)))
        // all (candidate c, better-ranked b) occlusion pairs, scored once
        val occPairs = graft.util.Lineage.truncate(pool.as("c")
          .join(pool.as("b"),
            col("c.id") === col("b.id") && col("b.rn") < col("c.rn"))
          .join(p.select(col("id").as("__cn"), col("qv").as("qv_c"),
            col("n2").as("n2_c")), col("c.nid") === col("__cn"))
          .join(p.select(col("id").as("__bn"), col("qv").as("qv_b"),
            col("n2").as("n2_b")), col("b.nid") === col("__bn"))
          .filter(cosine(qdot(col("qv_c"), col("qv_b"), dim),
            col("n2_c"), col("n2_b")) > col("c.cos"))
          .select(col("c.id").as("id"), col("c.nid").as("nid"),
            col("b.nid").as("bnid")))
        // two-round fixed-point toward HNSW's sequential rule: pass 1
        // prunes c occluded by ANY better candidate (over-prunes —
        // the occluder may itself be pruned); pass 2 re-admits c
        // whose every occluder died in pass 1, i.e. only pass-1
        // SURVIVORS get to occlude. Still one deterministic plan —
        // two anti-joins instead of a per-node sequential fold.
        val occ1 = occPairs.select(col("id"), col("nid")).distinct()
        val kept1 = pool.select(col("id"), col("nid"))
          .join(occ1, Seq("id", "nid"), "left_anti")
        val occ2 = occPairs
          .join(kept1.select(col("id"), col("nid").as("bnid")),
            Seq("id", "bnid"), "left_semi")
          .select(col("id"), col("nid")).distinct()
        pool.drop("rn")
          .join(occ2, Seq("id", "nid"), "left_anti")
          .withColumn("rn", row_number().over(wTop)).filter(col("rn") <= k)
          .drop("rn")
      }
    edgesOut.withColumn("rank", row_number().over(wTop))
      .select(col("id").as("vec_id"), col("nid").as("neighbor_id"),
        col("rank"), round(col("cos"), 6).as("cosine"))
  }

  /** Graph-based near-dup candidate pairs — the loop closed between
    * the ANN and dedup families (the SemDeDup alternative that needs
    * no frozen k-means): MUTUAL edges of the [[nnDescent]] k-NN graph
    * (a→b AND b→a — mutuality is the classic precision filter: a hub
    * that merely appears in many neighbor lists is not mutual with
    * them) whose exact verified cosine clears `threshold`. Every
    * emitted pair carries the same exact-integer cosine as
    * [[cosinePairs]], so the output is by construction a SUBSET of
    * the brute-force ≥ threshold pair set — the graph only bounds
    * RECALL, never correctness. Feed the pairs to
    * [[graft.ops.Dedup.connectedComponents]] for cluster/keeper
    * selection (the dedup_clusters convention).
    *
    * Scale shape: one nnDescent build (id-keyed shuffles, k·N edge
    * rows) + one self-join of the edge table on the (id_a, id_b) pair
    * key — O(N·k), never a corpus pair join; with a persisted
    * [[GraphAnnIndex]] graph the build cost amortizes across runs.
    */
  def graphDupPairs(df: DataFrame, vecCol: String, idCol: String,
                    threshold: Double, k: Int, iters: Int, buckets: Int,
                    dim: Option[Int] = None): DataFrame = {
    val g = nnDescent(df, vecCol, idCol, k, iters, buckets, dim)
      .select(col("vec_id").as("id_a"), col("neighbor_id").as("id_b"),
        col("cosine"))
    val fwd = g.filter(col("id_a") < col("id_b"))
    val bwd = g.filter(col("id_a") > col("id_b"))
      .select(col("id_b").as("id_a"), col("id_a").as("id_b"))
    fwd.join(bwd, Seq("id_a", "id_b"), "left_semi")
      .filter(col("cosine") >= threshold)
  }

  /** Greedy beam SEARCH over a k-NN graph — the query half of
    * graph-based ANN ([[nnDescent]] is the build half; HNSW/NSG
    * lineage: navigate the neighborhood graph instead of scanning
    * cells or the corpus). Each probe starts from a fixed hash-seeded
    * entry set, and for `rounds` fixed expansions: take its `beam`
    * best visited nodes (exact rounded cosine, ties to smaller id),
    * walk their out-edges, score the newly reached nodes. The answer
    * is the exact-cosine top-k RERANK of everything visited — the
    * graph only decides WHICH nodes get scored, never how they rank,
    * so precision is exact over the visited set and recall is the
    * only approximation (measured by `ann_graph_recall` against the
    * brute-force truth, the ann_recall harness convention).
    *
    * Deterministic and oracle-replayable (the nnDescent convention):
    * entry set = the `entries` smallest (portable-hash("gs:"+id), id)
    * nodes — a fixed pseudo-random sample shared by every probe, no
    * RNG; expansions run a FIXED `rounds` count (no convergence
    * check), so DuckDB replays the search as `rounds` chained CTEs;
    * every tie breaks on id. Larger `beam` explores more of the graph
    * per round — the HNSW efSearch knob.
    *
    * Scale shape per round: the beam is |probes|·beam rows — it
    * BROADCASTS against the k·N edge table (one scan, no edge
    * shuffle), the newly reached frontier joins the vector table on
    * its id key for scoring, and the visited set stays
    * |probes|·(entries + rounds·beam·k) — probe-grain, never
    * corpus-grain. The corpus is never self-joined and never
    * broadcast; total scored pairs are O(|probes|·rounds·beam·k)
    * versus brute force's |probes|·N.
    */
  def graphSearch(df: DataFrame, graph: DataFrame, vecCol: String,
                  idCol: String, probePred: Column,
                  entries: Int, beam: Int, rounds: Int, topK: Int,
                  dim: Option[Int] = None,
                  truncate: Boolean = true): DataFrame = {
    require(entries >= 1 && beam >= 1 && rounds >= 0 && topK >= 1,
      s"bad entries=$entries beam=$beam rounds=$rounds topK=$topK")
    val p = prepared(df.filter(col(vecCol).isNotNull), vecCol, idCol)
    val probes = p.filter(probePred)
      .select(col("id").as("qid"), col("qv").as("pqv"),
        col("n2").as("pn2"))
    // fixed entry set: TakeOrdered (orderBy+limit), not a global
    // window — no single-partition exchange over the corpus
    val ent = entrySet(p, entries)
    val entryPairs = probes.select(col("qid")).crossJoin(broadcast(ent))
    beamSearch(p, probes, graph, entryPairs, beam, rounds, dim, truncate)
      .withColumn("rank", row_number().over(Window.partitionBy(col("qid"))
        .orderBy(col("cos").desc, col("id").asc)))
      .filter(col("rank") <= topK)
      .select(col("qid").as("query_id"), col("id").as("neighbor_id"),
        col("rank"), round(col("cos"), 6).as("cosine"))
  }

  /** Hash-seeded fixed entry set over a prepared node table — ONE
    * oracle arithmetic shared by the in-memory search and the
    * persisted store ([[GraphAnnIndex]]); the gates' DuckDB replays
    * pin both, so the two paths must never diverge.
    */
  private[sim] def entrySet(nodes: DataFrame, entries: Int): DataFrame =
    nodes.select(col("id"),
        graft.util.Hashing.portableHash64(
          concat(lit("gs:"), col("id").cast("string"))).as("ehid"))
      .orderBy(col("ehid"), col("id")).limit(entries).select("id")

  /** The beam core shared by [[graphSearch]] and [[hierSearch]]: from
    * per-probe entry pairs (qid, id), run `rounds` fixed expansions
    * over `graph` and return the full visited set (qid, id, cos) for
    * the caller's rerank. Entry pairs equal to the probe itself are
    * dropped; every cosine is exact. */
  private[sim] def beamSearch(p: DataFrame, probes: DataFrame,
                         graph: DataFrame, entryPairs: DataFrame,
                         beam: Int, rounds: Int,
                         dim: Option[Int],
                         truncate: Boolean = true): DataFrame = {
    // truncate=false exists for the plan audit only (the pageRank
    // checkpoint=false pattern): per-round lineage cuts hide the
    // expansion's join shapes from explain, so the audit rebuilds one
    // un-truncated round; every production caller keeps the default
    // lazy truncation: the expansion loop is fixed-round with no
    // per-round driver probe, so the plan is cut every round but the
    // blocks materialize inside the caller's one downstream action —
    // `rounds` materialization jobs collapse into it (guide §1: job
    // latency, not data, dominated the profiled lifecycle gates)
    def cut(df: DataFrame): DataFrame =
      if (truncate) graft.util.Lineage.truncateLazy(df) else df
    val edges = graph.select(col("vec_id").as("id"),
      col("neighbor_id").as("nid"))
    def scoreQ(cand: DataFrame): DataFrame =
      cand.join(p.select(col("id"), col("qv"), col("n2")), Seq("id"))
        .join(broadcast(probes), Seq("qid"))
        .select(col("qid"), col("id"),
          cosine(qdot(col("qv"), col("pqv"), dim),
            col("n2"), col("pn2")).as("cos"))
    var visited = cut(
      scoreQ(entryPairs.select(col("qid"), col("id")).distinct()
        .filter(col("qid") =!= col("id"))))
    val wBeam = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("id").asc)
    (1 to rounds).foreach { _ =>
      val beamDf = visited.withColumn("rn", row_number().over(wBeam))
        .filter(col("rn") <= beam).select(col("qid"), col("id"))
      val fresh = broadcast(beamDf).join(edges, Seq("id"))
        .select(col("qid"), col("nid").as("id")).distinct()
        .filter(col("qid") =!= col("id"))
        .join(visited.select(col("qid"), col("id")),
          Seq("qid", "id"), "left_anti")
      visited = cut(scoreQ(fresh).unionByName(visited))
    }
    visited
  }

  /** Two-sample embedding-distribution DRIFT via the degree-2
    * polynomial-kernel MMD (Gretton et al., JMLR 2012) — the
    * distribution-level test [[gramStats]]' moments can't give and a
    * mean-vector drift check misses (two corpora can share a mean
    * while their covariance structure diverges — a re-embedding with
    * a different model does exactly that): with kernel
    * k(x,y) = (x·y)², the pair sums factor through the GRAM matrices,
    *
    *   Σ_{x∈X, y∈Y} (x·y)² = Σ_{a,b} Gx[a,b]·Gy[a,b],
    *
    * so MMD²'s three pair terms need one d²/2-explode aggregate per
    * group and a d²-row contraction — NEVER a pair join: O(N·d²)
    * where the naive test is O(N²·d). Output is ONE row of exact
    * sufficient statistics: group sizes and the three contraction
    * sums (Σkxx, Σkxy, Σkyy over ALL ordered pairs incl. self-pairs,
    * as decimal-exact digit strings — products reach ~10²⁰ and sums
    * ~10²¹, past int64), from which
    * MMD²_biased = Σkxx/n² + Σkyy/m² − 2·Σkxy/(nm). The division is
    * deliberately left to the reader: emitting exact integers is the
    * file-wide convention (cross-engine decimal division rounds).
    *
    * Group contract: `groupExpr` must evaluate to 0 (sample X) or 1
    * (sample Y); other values are ignored rows.
    */
  def mmdPoly2(df: DataFrame, vecCol: String, groupExpr: Column,
               dim: Int): DataFrame = {
    val q = df
      .select(quantize(col(vecCol)).as("qv"),
        groupExpr.cast("int").as("grp"))
      .filter(col("qv").isNotNull && size(col("qv")) === dim &&
        col("grp").isin(0, 1))
    val pairs = flatten(transform(sequence(lit(0), lit(dim - 1)), i =>
      transform(sequence(i, lit(dim - 1)), j =>
        struct(i.as("i"), j.as("j"),
          (element_at(col("qv"), i + lit(1)) *
            element_at(col("qv"), j + lit(1))).as("p")))))
    // gram entries accumulate as DECIMAL, not long: DuckDB sums the
    // same entries in HUGEINT, and a silent int64 wrap at extreme row
    // counts would be an undetectable cross-engine divergence
    val gram = q.select(col("grp"), explode(pairs).as("s"))
      .groupBy(col("grp"), col("s.i").as("i"), col("s.j").as("j"))
      .agg(sum(col("s.p").cast("decimal(28,0)")).as("g"))
    val gx = gram.filter(col("grp") === 0)
      .select(col("i"), col("j"), col("g").as("gxv"))
    val gy = gram.filter(col("grp") === 1)
      .select(col("i"), col("j"), col("g").as("gyv"))
    // full outer: a dimension pair absent from one group's gram is an
    // exact zero there, not a dropped term
    val zero = lit(0).cast("decimal(38,0)")
    val w = when(col("i") === col("j"), lit(1L)).otherwise(lit(2L))
    val sums = gx.join(gy, Seq("i", "j"), "full_outer")
      .select(w.as("w"),
        coalesce(col("gxv"), zero).as("dx"),
        coalesce(col("gyv"), zero).as("dy"))
      .agg(sum(col("w") * col("dx") * col("dx")).as("sxx"),
        sum(col("w") * col("dx") * col("dy")).as("sxy"),
        sum(col("w") * col("dy") * col("dy")).as("syy"))
    // counts as ONE always-one-row conditional aggregate (the oracle's
    // shape): an empty group yields a NULL count, never zero rows —
    // the degenerate-input contract matches DuckDB instead of
    // vanishing through an empty-side cross join
    val counts = q.agg(
      sum(when(col("grp") === 0, 1L)).cast("long").as("n_x"),
      sum(when(col("grp") === 1, 1L)).cast("long").as("n_y"))
    counts.crossJoin(broadcast(sums))
      .select(col("n_x"), col("n_y"),
        col("sxx").cast("decimal(38,0)").cast("string").as("sxx"),
        col("sxy").cast("decimal(38,0)").cast("string").as("sxy"),
        col("syy").cast("decimal(38,0)").cast("string").as("syy"))
  }

  /** HIERARCHICAL graph search — the HNSW two-layer shape completing
    * [[graphSearch]]: a sparse UPPER layer (every node whose portable
    * hash of "hl:"+id is ≡ 0 mod `upperMod` — the deterministic stand-
    * in for HNSW's geometric layer assignment) carries its own k-NN
    * graph; each probe first beam-searches the upper layer from the
    * global hash-seeded entries, and its top-`baseEntries` upper
    * results become its PERSONAL entry points into the base-layer
    * search — the long-range hops that let a probe land near its
    * neighborhood in O(log n) instead of walking there, so the base
    * search needs fewer rounds at the same recall. Both layers use
    * the same deterministic fixed-round machinery; the DuckDB oracle
    * replays upper build + upper search + handoff + base search as
    * one CTE chain.
    *
    * Scale shape: the upper layer is corpus/upperMod nodes (its build
    * cost is the nnDescent of a small subset), the handoff is
    * |probes|·baseEntries rows, and the base search is exactly
    * [[graphSearch]]'s probe-grain cost — nothing new shuffles at
    * corpus grain.
    */
  def hierSearch(df: DataFrame, baseGraph: DataFrame, vecCol: String,
                 idCol: String, probePred: Column, upperMod: Int,
                 upperK: Int, upperIters: Int, upperBuckets: Int,
                 entries: Int, upperBeam: Int, upperRounds: Int,
                 baseEntries: Int, beam: Int, rounds: Int, topK: Int,
                 dim: Option[Int] = None): DataFrame = {
    require(upperMod >= 2 && upperK >= 1 && baseEntries >= 1,
      s"bad upperMod=$upperMod upperK=$upperK baseEntries=$baseEntries")
    val nn = df.filter(col(vecCol).isNotNull)
    val isUpper = pmod(graft.util.Hashing.portableHash64(
      concat(lit("hl:"), col(idCol).cast("string"))),
      lit(upperMod.toLong)) === 0L
    val upper = nn.filter(isUpper)
    val upperGraph = nnDescent(upper, vecCol, idCol, upperK, upperIters,
      upperBuckets, dim)
    val p = prepared(nn, vecCol, idCol)
    val probes = p.filter(probePred)
      .select(col("id").as("qid"), col("qv").as("pqv"),
        col("n2").as("pn2"))
    val pUpper = prepared(upper, vecCol, idCol)
    val entUp = pUpper.select(col("id"),
        graft.util.Hashing.portableHash64(
          concat(lit("gs:"), col("id").cast("string"))).as("ehid"))
      .orderBy(col("ehid"), col("id")).limit(entries).select("id")
    val wBeam = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("id").asc)
    // upper search: global entries, the sparse graph
    val upVisited = beamSearch(pUpper, probes, upperGraph,
      probes.select(col("qid")).crossJoin(broadcast(entUp)),
      upperBeam, upperRounds, dim)
    // handoff: each probe's best upper results seed the base search
    val handoff = upVisited.withColumn("rn", row_number().over(wBeam))
      .filter(col("rn") <= baseEntries).select(col("qid"), col("id"))
    beamSearch(p, probes, baseGraph, handoff, beam, rounds, dim)
      .withColumn("rank", row_number().over(wBeam))
      .filter(col("rank") <= topK)
      .select(col("qid").as("query_id"), col("id").as("neighbor_id"),
        col("rank"), round(col("cos"), 6).as("cosine"))
  }
}
