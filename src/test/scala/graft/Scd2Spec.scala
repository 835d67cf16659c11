package graft

import org.apache.spark.sql.functions._
import graft.cdc.Scd2

class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private val PK = Seq("pk")
  private val PAY = Seq("payload")

  test("scd2: buildHistory collapses no-ops and closes intervals in version order") {
    val feed = Seq(
      (1L, 1L, "A"), (1L, 2L, "A"), (1L, 3L, "B"), (1L, 5L, "A"),
      (2L, 4L, "X")
    ).toDF("pk", "ver", "payload")
    val h = Scd2.buildHistory(feed, PK, "ver", PAY)
      .select("pk", "payload", "valid_from", "valid_to", "is_current")
      .as[(Long, String, Long, Long, Boolean)].collect().toSet
    val M = Scd2.OpenSentinel
    assert(h === Set(
      (1L, "A", 1L, 3L, false),  // the (2,"A") no-op collapsed away
      (1L, "B", 3L, 5L, false),
      (1L, "A", 5L, M, true),    // same payload resurfacing reopens
      (2L, "X", 4L, M, true)))
  }

  test("scd2: asOf returns the payload in force at the version") {
    val feed = Seq((1L, 1L, "A"), (1L, 3L, "B"), (1L, 5L, "A")).toDF("pk", "ver", "payload")
    val h = Scd2.buildHistory(feed, PK, "ver", PAY)
    def at(v: Long) =
      Scd2.asOf(h, v).select("pk", "payload").as[(Long, String)].collect().toSet
    assert(at(1) === Set((1L, "A")))
    assert(at(2) === Set((1L, "A")))
    assert(at(3) === Set((1L, "B")))
    assert(at(4) === Set((1L, "B")))
    assert(at(9) === Set((1L, "A")))
    assert(at(0) === Set.empty)
  }

  test("scd2: maintain equals full rebuild on random change feeds") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 3) {
      val n = 400
      val feed = (0 until n).map { v =>
        (rnd.nextInt(12).toLong, v.toLong, s"p${rnd.nextInt(4)}")
      }.toDF("pk", "ver", "payload")
      val cut = (100 + rnd.nextInt(200)).toLong
      val base = Scd2.buildHistory(feed.filter($"ver" <= cut), PK, "ver", PAY)
      val got = Scd2.maintain(base, feed.filter($"ver" > cut), PK, "ver", PAY)
      val want = Scd2.buildHistory(feed, PK, "ver", PAY)
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
        s"maintain(cut=$cut) diverged from full rebuild")
    }
  }

  test("scd2: history composes across SEQUENTIAL maintain cycles") {
    val rnd = new scala.util.Random(23)
    val n = 600
    val feed = (0 until n).map { v =>
      (rnd.nextInt(15).toLong, v.toLong, s"p${rnd.nextInt(3)}")
    }.toDF("pk", "ver", "payload")
    // fold the tail through 4 successive batches on top of a base build
    val cuts = Seq(150L, 300L, 420L, 500L, n.toLong)
    var h = Scd2.buildHistory(feed.filter($"ver" < cuts.head), PK, "ver", PAY)
    for (Seq(lo, hi) <- cuts.sliding(2)) {
      h = Scd2.maintain(h, feed.filter($"ver" >= lo && $"ver" < hi), PK, "ver", PAY)
        .localCheckpoint() // cycles compound; keep lineage flat like a real store
    }
    val want = Scd2.buildHistory(feed, PK, "ver", PAY)
    assert(h.exceptAll(want).isEmpty && want.exceptAll(h).isEmpty,
      "4 sequential folds must equal the one-shot rebuild")
  }

  test("scd2: maintain handles brand-new keys and a no-op-only batch") {
    val base = Scd2.buildHistory(
      Seq((1L, 1L, "A")).toDF("pk", "ver", "payload"), PK, "ver", PAY)
    // batch: key 1 repeats its current payload (pure no-op), key 9 is new
    val batch = Seq((1L, 10L, "A"), (9L, 11L, "Z")).toDF("pk", "ver", "payload")
    val got = Scd2.maintain(base, batch, PK, "ver", PAY)
      .select("pk", "payload", "valid_from", "valid_to", "is_current")
      .as[(Long, String, Long, Long, Boolean)].collect().toSet
    val M = Scd2.OpenSentinel
    assert(got === Set((1L, "A", 1L, M, true), (9L, "Z", 11L, M, true)))
  }
}
