package graft

import org.apache.spark.sql.functions._

import graft.ops.{Kll, KllAgg, KllState}

/** KLL mergeable quantile sketch: weight conservation, the rank-error
  * bound from-scratch across distribution shapes (uniform, zipf-ish,
  * heavy ties, adversarially sorted both ways), bound preservation
  * under arbitrary merge trees (linear fold and balanced tree over a
  * 16-way split), byte-determinism of identical folds, exactness below
  * first compaction, and the typed-Aggregator path under 1-vs-16
  * partitionings — the "merge ≡ from-scratch under partitioning"
  * contract: ANY merge order satisfies the same bound the from-scratch
  * sketch does (the object itself is merge-order-dependent, like every
  * order-sensitive sketch; the bound is what the paper guarantees and
  * what the gate checks).
  */
class KllSpec extends SparkSpec {

  private val K = 256
  /** Test bound 2% of n — tighter than the gate's 2.5%, looser than
    * the ~1.3% typical at k=256 (the DataSketches k=200 ≈ 1.65%
    * calibration scaled by 200/256). */
  private val EPS_PPM = 20000L
  private val PCTS = Seq(1L, 10L, 25L, 50L, 75L, 90L, 99L)

  private def fromScratch(vs: Seq[Double], k: Int = K): KllState =
    vs.foldLeft(Kll.empty(k))(Kll.update)

  private def retainedWeight(s: KllState): Long =
    s.levels.zipWithIndex.map { case (b, l) => b.size.toLong << l }.sum

  /** Max rank-interval violation over the pct grid, in rows: 0 means
    * every estimate's true-rank span intersects [target ± tol]. */
  private def maxViolation(s: KllState, sorted: IndexedSeq[Double],
                           tol: Long): Long = {
    val n = sorted.size.toLong
    PCTS.map { p =>
      val target = (p * n + 99) / 100
      val q = Kll.quantile(s, p).get
      val lt = sorted.count(_ < q).toLong
      val le = sorted.count(_ <= q).toLong
      // distance of the interval (lt, le] from [target-tol, target+tol]
      math.max(0L, math.max((lt + 1) - (target + tol), (target - tol) - le))
    }.max
  }

  private def streams(n: Int): Map[String, Seq[Double]] = {
    // deterministic shuffle: order by portable-ish hash of the index
    def shuffled(vs: IndexedSeq[Double]): Seq[Double] =
      vs.indices.sortBy(i => scala.util.hashing.MurmurHash3
        .stringHash(s"kll:$i")).map(vs)
    val uniform = (0 until n).map(_.toDouble)
    val zipf = (0 until n).map(i => math.floor(n.toDouble / (1 + i % 1000)))
    val ties = (0 until n).map(i => (i % 20).toDouble)
    Map(
      "uniform-shuffled" -> shuffled(uniform),
      "zipf-shuffled" -> shuffled(zipf),
      "ties-shuffled" -> shuffled(ties),
      "sorted-asc" -> uniform,
      "sorted-desc" -> uniform.reverse)
  }

  test("weight is conserved exactly: sum of 2^level over retained == count") {
    val s = fromScratch((0 until 30000).map(i => (i * 37 % 1000).toDouble))
    assert(s.count == 30000L)
    assert(retainedWeight(s) == 30000L)
    // and through a merge
    val a = fromScratch((0 until 7000).map(_.toDouble))
    val m = Kll.merge(a, s)
    assert(m.count == 37000L && retainedWeight(m) == 37000L)
  }

  test("retained size stays bounded (~3k) while count grows unbounded") {
    val s = fromScratch((0 until 120000).map(i => (i % 997).toDouble))
    assert(s.totalRetained <= 3 * K + 64,
      s"retained ${s.totalRetained} exceeds the capacity envelope")
  }

  test("rank-error bound holds from-scratch across distribution shapes") {
    val n = 100000
    for ((name, vs) <- streams(n)) {
      val s = fromScratch(vs)
      val tol = n.toLong * EPS_PPM / 1000000L
      val viol = maxViolation(s, vs.sorted.toIndexedSeq, tol)
      assert(viol == 0L, s"$name: worst rank-interval miss $viol rows past ±$tol")
    }
  }

  test("bound survives arbitrary merge trees over a 16-way split") {
    val n = 100000
    val vs = streams(n)("uniform-shuffled")
    val tol = n.toLong * EPS_PPM / 1000000L
    val sorted = vs.sorted.toIndexedSeq
    val parts = vs.grouped((n + 15) / 16).map(c => fromScratch(c)).toVector
    val linear = parts.reduceLeft(Kll.merge)
    def tree(ps: Vector[KllState]): KllState =
      if (ps.size == 1) ps.head
      else tree(ps.grouped(2).map(g => g.reduceLeft(Kll.merge)).toVector)
    val balanced = tree(parts)
    for ((how, m) <- Seq("linear" -> linear, "tree" -> balanced)) {
      assert(m.count == n.toLong && retainedWeight(m) == n.toLong)
      assert(maxViolation(m, sorted, tol) == 0L, s"merge-$how broke the bound")
    }
  }

  test("identical folds are byte-identical (deterministic coins)") {
    val vs = streams(50000)("zipf-shuffled")
    assert(fromScratch(vs) == fromScratch(vs))
    val (a, b) = vs.splitAt(20000)
    val m1 = Kll.merge(fromScratch(a), fromScratch(b))
    val m2 = Kll.merge(fromScratch(a), fromScratch(b))
    assert(m1 == m2)
  }

  test("below first compaction the sketch is exact") {
    // 60 values < level-0 capacity at k=256: no information loss, the
    // lower quantile equals the exact lower quantile
    val vs = (0 until 60).map(i => ((i * 31) % 60).toDouble)
    val s = fromScratch(vs)
    assert(s.compactions == 0L)
    val sorted = vs.sorted
    for (p <- PCTS) {
      val exact = sorted((((p * 60 + 99) / 100).toInt - 1).max(0))
      assert(Kll.quantile(s, p).contains(exact), s"p$p")
    }
  }

  test("typed Aggregator: 1-partition and 16-partition builds both hold the bound") {
    import spark.implicits._
    import org.apache.spark.sql.Encoders
    val n = 60000
    val vs = streams(n)("zipf-shuffled")
    val sorted = vs.sorted.toIndexedSeq
    val tol = n.toLong * EPS_PPM / 1000000L
    val kllUdaf = udaf(new KllAgg(K), Encoders.scalaDouble)
    for (parts <- Seq(1, 16)) {
      val row = vs.toDF("v").repartition(parts)
        .agg(kllUdaf(col("v")).as("sk"))
        .select("sk.k", "sk.count", "sk.compactions", "sk.levels")
        .head()
      val s = KllState(row.getInt(0), row.getLong(1), row.getLong(2),
        row.getSeq[scala.collection.Seq[Double]](3).map(_.toVector).toVector)
      assert(s.count == n.toLong && retainedWeight(s) == n.toLong,
        s"parts=$parts lost weight")
      assert(maxViolation(s, sorted, tol) == 0L, s"parts=$parts broke the bound")
    }
  }

  test("native graft_kll: single-partition content is bit-identical to " +
      "the Kll.update fold; 16-partition build holds the bound") {
    import spark.implicits._
    val n = 60000
    val vs = streams(n)("uniform-shuffled")
    val sorted = vs.sorted.toIndexedSeq
    val tol = n.toLong * EPS_PPM / 1000000L
    assert(spark.catalog.functionExists("graft_kll"),
      "test session must register GraftExtensions")
    def build(parts: Int): KllState = {
      val row = vs.toDF("v").repartition(parts)
        .agg(call_function("graft_kll", col("v"), lit(K)).as("sk"))
        .select("sk.k", "sk.count", "sk.compactions", "sk.levels")
        .head()
      KllState(row.getInt(0), row.getLong(1), row.getLong(2),
        row.getSeq[scala.collection.Seq[Double]](3).map(_.toVector).toVector)
    }
    // the raw expression's update order over one sequence == Kll.update
    // fold — the native path changes the HARNESS, never the arithmetic
    val direct = graft.functions.KllSketchAgg.foldForSpec(K, vs)
    assert(direct == fromScratch(vs), "native update diverged from Kll.update")
    // through Spark: weight conservation + bound at 1 and 16 partitions
    for (parts <- Seq(1, 16)) {
      val s = build(parts)
      assert(s.count == n.toLong && retainedWeight(s) == n.toLong,
        s"parts=$parts lost weight")
      assert(maxViolation(s, sorted, tol) == 0L, s"parts=$parts broke the bound")
    }
    // serialize/deserialize round trip is identity on the buffer
    val agg = graft.functions.KllSketchAgg(
      org.apache.spark.sql.catalyst.expressions.BoundReference(
        0, org.apache.spark.sql.types.DoubleType, nullable = true), K)
    val buf = vs.take(5000).foldLeft(agg.createAggregationBuffer()) { (b, v) =>
      agg.update(b, org.apache.spark.sql.catalyst.InternalRow(v))
    }
    assert(agg.deserialize(agg.serialize(buf)).toState == buf.toState)
  }

  test("empty and degenerate sketches") {
    assert(Kll.quantile(Kll.empty(64), 50L).isEmpty)
    val one = Kll.update(Kll.empty(64), 42.0)
    for (p <- PCTS) assert(Kll.quantile(one, p).contains(42.0))
    intercept[IllegalArgumentException](Kll.empty(4))
    intercept[IllegalArgumentException](
      Kll.merge(Kll.empty(64), Kll.empty(128)))
  }
}
