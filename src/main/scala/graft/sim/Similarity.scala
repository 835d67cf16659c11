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

  private def cosine(dotC: Column, n2a: Column, n2b: Column): Column =
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
    // search only the probed buckets
    val rankW = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    probes.join(assigned, Seq("cid"))
      .filter(col("id") =!= col("qid"))
      .select(col("qid").as("query_id"), col("id").as("neighbor_id"),
        cosine(qdot(col("qqv"), col("qv"), dim), col("qn2"), col("n2")).as("cosine"))
      .withColumn("rank", row_number().over(rankW))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        round(col("cosine"), 6).as("cosine"))
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
    a.join(b, Seq("bucket")).filter(col("id_a") < col("id_b"))
      .withColumn("cosine", cosine(qdot(col("qv_a"), col("qv_b"), dim), col("n2_a"), col("n2_b")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
      .distinct()
  }
}
