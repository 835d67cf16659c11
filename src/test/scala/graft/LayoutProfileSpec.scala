package graft

import org.apache.spark.sql.functions._
import graft.ops.{Profile, ZOrder}

class LayoutProfileSpec extends SparkSpec {
  import spark.implicits._

  test("zorder: zkey matches the reference bit-interleave") {
    def ref(x: Long, y: Long, bits: Int): Long =
      (0 until bits).map { b =>
        (((x >> b) & 1L) << (2 * b)) | (((y >> b) & 1L) << (2 * b + 1))
      }.sum
    val rnd = new scala.util.Random(3)
    val rows = (1 to 200).map(_ => (rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    val got = rows.toDF("x", "y")
      .select($"x", $"y", ZOrder.zkey(Seq($"x", $"y"), 16).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) => assert(z === ref(x, y, 16), s"($x,$y)") }
  }

  test("zorder: SQL text computes the identical key") {
    val rows = Seq((7L, 11L), (0L, 65535L), (43210L, 1L)).toDF("x", "y")
    rows.createOrReplaceTempView("zt")
    val viaSql = sql(s"SELECT ${ZOrder.zkeySql(Seq("x", "y"), 16)} AS z FROM zt")
      .as[Long].collect().toSeq
    val viaCol = rows.select(ZOrder.zkey(Seq($"x", $"y"), 16)).as[Long].collect().toSeq
    assert(viaSql === viaCol)
  }

  test("zorder: clustered layout makes BOTH dimensions prunable by file min/max") {
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString
    val grid = for { x <- 0 until 64; y <- 0 until 64 } yield (x.toLong, y.toLong)
    val df = grid.toDF("x", "y")
    ZOrder.writeClustered(df, Seq("x", "y"), 6, s"$dir/z", numFiles = 16)
    df.repartitionByRange(16, $"x").sortWithinPartitions("x")
      .write.parquet(s"$dir/linear")
    // a file can serve `y BETWEEN 8 AND 15` only if its [min,max] on y
    // overlaps — count prunable files under each layout
    def overlapping(path: String): Int = {
      val files = new java.io.File(path).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.toString)
      assert(files.length >= 12, s"expected ~16 files, got ${files.length}")
      files.count { f =>
        val r = spark.read.parquet(f).agg(min("y"), max("y")).first()
        r.getLong(0) <= 15L && r.getLong(1) >= 8L
      }
    }
    val z = overlapping(s"$dir/z")
    val lin = overlapping(s"$dir/linear")
    assert(lin >= 12, s"x-sorted layout should be unprunable on y (got $lin)")
    assert(z <= lin / 2, s"z-order should prune y ranges: $z vs $lin")
    // and the clustered copy still holds exactly the input rows
    val back = spark.read.parquet(s"$dir/z")
    assert(back.count() === 4096 && back.exceptAll(df).isEmpty)
  }

  test("profile: heavyHitters ranks by count with corpus share") {
    val df = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq("c", "d")).toDF("k")
    val top = Profile.heavyHitters(df, "k", 2)
      .as[(String, Long, Double)].collect().toSeq
    assert(top === Seq(("a", 5L, 0.5), ("b", 3L, 0.3)))
  }

  test("profile: heavyHitters breaks count ties by key ascending") {
    val df = Seq("z", "y", "y", "x", "x").toDF("k")
    val top = Profile.heavyHitters(df, "k", 3).as[(String, Long, Double)].collect().toSeq
    assert(top.map(_._1) === Seq("x", "y", "z"))
  }

  test("profile: keyDistribution buckets by frequency decade") {
    val df = (Seq.fill(1)("k1") ++ Seq.fill(5)("k2") ++ Seq.fill(10)("k3") ++
      Seq.fill(100)("k4")).toDF("k")
    val got = Profile.keyDistribution(df, "k").as[(Long, Long)].collect().toMap
    assert(got === Map(0L -> 2L, 1L -> 1L, 2L -> 1L))
  }

  test("profile: madOutliers keeps its breakdown point where the z-score collapses") {
    // 20 clean values at 10.0 + FIVE spikes at 1000.0: the spikes drag
    // the mean/σ enough that z-score misses them at z>3 on this shape,
    // while the median (10) and MAD are untouched (50% breakdown)
    val rows = (1 to 20).map(i => (i.toLong, "g", 10.0 + (i % 3) * 0.1)) ++
      (21 to 25).map(i => (i.toLong, "g", 1000.0))
    val df = rows.toDF("event_id", "event_type", "value")
    val mad = Profile.madOutliers(df, "event_type", "value", 5.0)
      .select("event_id").as[Long].collect().toSet
    assert(mad == (21L to 25L).toSet,
      "MAD must flag exactly the five spikes and nothing else")
    val z = Profile.zscoreOutliers(df, "event_type", "value", 3.0)
      .select("event_id").as[Long].collect().toSet
    assert(z.size < 5, "the contaminated σ lets some spikes hide from the z-score")
    // zero-MAD guard: a > 50%-constant group is excluded, not flagged
    val const = (1 to 9).map(i => (i.toLong, "h", 5.0)) ++ Seq((10L, "h", 500.0))
    assert(Profile.madOutliers(const.toDF("event_id", "event_type", "value"),
      "event_type", "value", 5.0).count() == 0)
  }

  test("profile: zscoreOutliers flags exactly the driver-recomputed tail") {
    // group g: 20 values at 10.0 plus one at 1000.0 → the spike is the
    // only |z| > 3; group h is uniform → no outliers (sd 0 gives z NaN,
    // which must NOT be flagged)
    val rows = (1 to 20).map(i => (i.toLong, "g", 10.0)) ++
      Seq((21L, "g", 1000.0)) ++ (22 to 30).map(i => (i.toLong, "h", 5.0))
    val df = rows.toDF("event_id", "event_type", "value")
    val got = Profile.zscoreOutliers(df, "event_type", "value", 3.0)
      .select("event_id", "z_milli").as[(Long, Long)].collect().toMap
    // driver recompute with the identical exact-integer moments
    val q = rows.filter(_._2 == "g").map(r => math.round(r._3 * 100))
    val (n, s1, s2) = (q.size.toLong, q.sum, q.map(x => x * x).sum)
    val zSpike = (1000 * 100.0 * n - s1) / math.sqrt(n.toDouble * s2 - s1.toDouble * s1)
    assert(got == Map(21L -> math.round(zSpike * 1000)))
  }

  test("profile: corrMatrix is ±1 on linear columns, NULL on zero variance, listwise-complete") {
    import graft.ops.Profile
    val df = Seq(
      (Some(1.0), Some(2.0), Some(-1.0), Some(5.0)),
      (Some(2.0), Some(4.0), Some(-2.0), Some(5.0)),
      (Some(3.0), Some(6.0), Some(-3.0), Some(5.0)),
      (Some(4.0), Some(8.0), Some(-4.0), Some(5.0)),
      (Some(9.0), None, Some(9.0), Some(9.0)) // any-null row drops everywhere
    ).toDF("x", "y", "z", "w")
    def run(d: org.apache.spark.sql.DataFrame) =
      Profile.corrMatrix(d, Seq("x", "y", "z", "w")).collect()
        .map(r => (r.getString(0), r.getString(1)) ->
          ((r.getLong(2), if (r.isNullAt(3)) None else Some(r.getDouble(3)))))
        .toMap
    val got = run(df)
    assert(got.size == 6)
    assert(got.values.forall(_._1 == 4L), "listwise deletion: one shared n")
    assert(got(("x", "y")) == ((4L, Some(1.0))))
    assert(got(("x", "z")) == ((4L, Some(-1.0))))
    assert(got(("y", "z")) == ((4L, Some(-1.0))))
    assert(got(("x", "w"))._2.isEmpty, "zero-variance column has no correlation")
    assert(got(("z", "w"))._2.isEmpty)
    // a non-degenerate value against a driver recompute on cents
    val xs = Seq(1L, 2L, 3L, 4L).map(_ * 100)
    val ys = Seq(2L, 4L, 6L, 8L).map(_ * 100)
    val (n, sx, sy) = (4L, xs.sum, ys.sum)
    val num = (xs, ys).zipped.map(_ * _).sum * n - sx * sy
    val d1 = xs.map(v => v * v).sum * n - sx * sx
    val d2 = ys.map(v => v * v).sum * n - sy * sy
    val ref = BigDecimal(num.toDouble / (math.sqrt(d1.toDouble) * math.sqrt(d2.toDouble)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(("x", "y"))._2.contains(ref))
    assert(run(df.repartition(5)) == got, "moments owe nothing to the layout")
  }
}
