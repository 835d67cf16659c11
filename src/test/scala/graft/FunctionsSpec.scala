package graft

import org.apache.spark.sql.functions._
import graft.sim.Similarity

/** Native Catalyst expressions (graft_dot, graft_intersect_size) vs
  * their built-in higher-order-function formulations: identical
  * results, since operators silently prefer the native path when the
  * extension is registered.
  */
class FunctionsSpec extends SparkSpec {

  test("graft extensions are registered in the session") {
    assert(spark.catalog.functionExists("graft_dot"))
    assert(spark.catalog.functionExists("graft_intersect_size"))
  }

  test("graft_dot matches the zip_with/aggregate dot product") {
    val df = spark.range(200).selectExpr(
      "id",
      "transform(sequence(0, 63), i -> (id * 31 + i * 17) % 1000 - 500) as a",
      "transform(sequence(0, 63), i -> (id * 13 + i * 7) % 800 - 400) as b")
    val mismatches = df.selectExpr(
      "graft_dot(a, b) as native",
      "aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, x) -> acc + x) as hof")
      .filter("native <> hof").count()
    assert(mismatches == 0)
  }

  test("graft_dot handles nulls and length mismatch") {
    val r = spark.sql(
      """select graft_dot(array(1L, 2L, 3L), array(10L, 20L)) as shorter,
        |       graft_dot(cast(null as array<bigint>), array(1L)) as leftnull""".stripMargin)
      .head()
    assert(r.getLong(0) == 50L) // min-length semantics
    assert(r.isNullAt(1))
  }

  test("graft_intersect_size matches size(array_intersect()) on sorted sets") {
    val df = spark.range(300).selectExpr(
      "id",
      "array_sort(array_distinct(transform(sequence(0, 20), i -> (id * 7 + i * 3) % 40))) as a",
      "array_sort(array_distinct(transform(sequence(0, 20), i -> (id * 5 + i * 11) % 40))) as b")
    val mismatches = df.selectExpr(
      "graft_intersect_size(a, b) as native",
      "size(array_intersect(a, b)) as builtin")
      .filter("native <> builtin").count()
    assert(mismatches == 0)
  }

  test("qdot falls back to identical results without the native function") {
    // dim-provided and dim-free HOF paths agree with the native path
    val df = spark.range(50).selectExpr(
      "transform(sequence(0, 63), i -> (id * 3 + i) % 100) as a",
      "transform(sequence(0, 63), i -> (id * 9 + i * 2) % 100) as b")
    val viaNative = df.select(Similarity.qdot(col("a"), col("b"), Some(64)).as("d"))
      .agg(sum("d")).head().getLong(0)
    val viaHof = df.selectExpr(
      "aggregate(sequence(0, 63), 0L, (acc, i) -> acc + element_at(a, i + 1) * element_at(b, i + 1)) as d")
      .agg(sum("d")).head().getLong(0)
    assert(viaNative == viaHof)
  }

  test("affineCoefConst equals the Column-side md5 coefficient family") {
    import graft.util.Hashing
    val viaCol = spark.range(32)
      .select(Hashing.affineCoef("a", col("id")).as("a"),
        Hashing.affineCoef("b", col("id")).as("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val viaConst = (0 until 32)
      .map(j => (Hashing.affineCoefConst("a", j), Hashing.affineCoefConst("b", j)))
    assert(viaCol.toSeq === viaConst)
  }

  test("wide MinHash bands are bit-identical to the long signature form") {
    import graft.ops.Dedup
    import spark.implicits._
    val docs = (0L until 60L).map(i =>
      (i, s"word${i % 7} token${i % 11} item${i % 5} thing${i % 3} extra$i common words"))
      .toDF("doc_id", "text")
    val toks = Dedup.tokenSet(docs, "text", "doc_id")
    val long = Dedup.bandSignatures(Dedup.minHashSignatures(toks, 16), 16, 4)
    val wide = Dedup.minHashBandsWide(toks, 16, 4)
    assert(wide.count() === long.count())
    assert(wide.exceptAll(long).isEmpty && long.exceptAll(wide).isEmpty)
  }
}
