package graft

import org.apache.spark.sql.functions._

import graft.ops.Sketch
import graft.util.Hashing

/** KMV bottom-k sketches: exactness of the sketch itself against a
  * driver-side reference, equality of the salted two-stage k-min with
  * the direct window, estimator accuracy on a known cardinality,
  * partition independence, and the unsaturated-case equivalence of
  * the sketched overlap matrix with the exact self-join operator.
  */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  test("kmv sketch is exactly the k smallest distinct hashes") {
    val vals = (0 until 300).map(i => s"v$i")
    // duplicates must not change the sketch
    val df = (vals ++ vals.take(50)).toDF("v").withColumn("g", lit("x"))
    val got = Sketch.kmv(df, "g", col("v"), k = 16)
      .orderBy("pos").select("h").as[Long].collect().toSeq
    val want = vals.map(Hashing.portableHash64Const).distinct.sorted.take(16)
    assert(got == want)
  }

  test("salted two-stage k-min equals the direct per-group window") {
    val df = (0 until 2000).map(i => (s"g${i % 3}", s"v$i")).toDF("g", "v")
    val direct = df
      .select(col("g"), Hashing.portableHash64(col("v")).as("h")).distinct()
      .withColumn("pos", expr(
        "row_number() over (partition by g order by h) - 1").cast("long"))
      .filter(col("pos") < 32)
    val salted = Sketch.kmv(df, "g", col("v"), k = 32, salts = 16)
    assert(salted.exceptAll(direct).isEmpty && direct.exceptAll(salted).isEmpty)
  }

  test("distinct estimate lands within KMV error bounds at k=256") {
    val n = 5000
    val df = (0 until n).flatMap(i => Seq.fill(1 + i % 3)(s"item$i"))
      .toDF("v").withColumn("g", lit("corpus"))
    val est = Sketch.distinctCount(df, "g", col("v"), k = 256)
      .select("est_distinct").as[Long].head()
    // 1/sqrt(256) = 6.25% standard error; 4 sigma = 25%
    assert(math.abs(est - n) < n / 4, s"est $est vs true $n")
  }

  test("unsaturated sketch reports the exact distinct count") {
    val df = (0 until 40).map(i => ("g", s"v$i")).toDF("g", "v")
    val row = Sketch.distinctCount(df, "g", col("v"), k = 64)
      .select("k_eff", "est_distinct").as[(Long, Long)].head()
    assert(row == ((40L, 40L)))
  }

  test("sketch skips nulls like count(col) does") {
    val df = Seq(Some("a"), Some("b"), None, Some("a"))
      .toDF("v").withColumn("g", lit("x"))
    assert(Sketch.distinctCount(df, "g", col("v"), k = 8)
      .select("est_distinct").as[Long].head() == 2L)
  }

  test("sketch output is partition-independent") {
    val df = (0 until 500).map(i => (s"g${i % 2}", s"v$i")).toDF("g", "v")
    val a = Sketch.kmv(df.repartition(1), "g", col("v"), k = 20)
    val b = Sketch.kmv(df.repartition(13, col("v")), "g", col("v"), k = 20)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("overlap estimate recovers a planted 50% intersection") {
    // A = 0..3999, B = 2000..5999 → |A∩B| = 2000, |A∪B| = 6000
    val df = ((0 until 4000).map(i => ("a", s"item$i")) ++
      (2000 until 6000).map(i => ("b", s"item$i"))).toDF("g", "v")
    val r = Sketch.overlap(df, "g", col("v"), k = 256)
      .select("est_union", "est_shared").as[(Long, Long)].head()
    assert(math.abs(r._1 - 6000) < 1500, s"union ${r._1}")
    assert(math.abs(r._2 - 2000) < 700, s"shared ${r._2}")
  }

  implicit class Tup3Ops(rows: Array[(String, String, Long)]) {
    def toMap2: Map[(String, String), Long] =
      rows.map { case (a, b, n) => (a, b) -> n }.toMap
  }

  test("unsaturated overlap equals the exact self-join operator") {
    // 50-doc corpus: every per-source sketch holds ALL its hashes, so
    // est_shared must EQUAL dedup_source_overlap's n_shared pair for
    // pair, and pairs absent from the exact matrix must read 0
    val sketch = graft.queries.PipelineQueries
      .dedupOverlapSketchQ(spark, sfDir)
    assert(sketch.filter(col("k_eff") >= 64).isEmpty)
    val got = sketch.filter(col("est_shared") > 0)
      .select("source_a", "source_b", "est_shared")
      .as[(String, String, Long)].collect().toMap2
    val want = graft.queries.PipelineQueries
      .dedupSourceOverlapQ(spark, sfDir)
      .select("source_a", "source_b", "n_shared")
      .as[(String, String, Long)].collect().toMap2
    assert(got == want)
  }

  test("profile_sketch exercises both estimator branches at sf0.001") {
    val rows = graft.queries.PipelineQueries.profileSketchQ(spark, sfDir)
      .select("col_name", "k_eff", "est_distinct")
      .as[(String, Long, Long)].collect()
      .map { case (c, kEff, est) => c -> (kEff, est) }.toMap
    // 50 docs: lang/source under k=64 (exact), doc_id has 50 distinct
    val exact = graft.queries.PipelineQueries.profileTableQ(spark, sfDir)
      .select("col_name", "n_distinct").as[(String, Long)].collect().toMap
    for ((c, (kEff, est)) <- rows if kEff < 64)
      assert(est == exact(c), s"unsaturated $c: est $est vs ${exact(c)}")
  }
}
