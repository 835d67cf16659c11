package graft

import org.apache.spark.sql.functions._
import graft.ops.{SkewJoin, TextAnalysis}

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  private def sortedRows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).sortBy(_.mkString("|"))

  test("salted join is row-identical to the plain join on skewed data") {
    val rnd = new scala.util.Random(7)
    // 90% of big rows pile onto key 0 — the straggler shape
    val big = (0 until 5000).map { i =>
      (if (rnd.nextInt(10) < 9) 0L else rnd.nextInt(50).toLong, i.toLong)
    }.toDF("k", "payload").repartition(8)
    // small side misses some keys (41..49) so non-matches are exercised
    val small = (0L to 40L).map(k => (k, s"dim$k")).toDF("k", "attr")

    for (jt <- Seq("inner", "left_outer")) {
      val plain = big.join(small, Seq("k"), jt)
      val salted = SkewJoin.salted(big, small, "k", nSalts = 8, joinType = jt)
      assert(salted.columns.toSeq == plain.columns.toSeq)
      assert(sortedRows(salted).sameElements(sortedRows(plain)), s"joinType=$jt")
    }
  }

  test("salted join spreads a heavy key across salt partitions") {
    val big = (0 until 1000).map(i => (1L, i.toLong)).toDF("k", "payload")
    val small = Seq((1L, "x")).toDF("k", "attr")
    // distinct salts actually assigned to the heavy key's rows
    val nSalts = big
      .withColumn("s", pmod(hash(col("k"), col("payload")), lit(8)))
      .select("s").distinct().count()
    assert(nSalts >= 6, s"row-hash salt must spread a heavy key, got $nSalts/8")
    assert(SkewJoin.salted(big, small, "k", 8).count() == 1000)
  }

  test("salted join rejects unsupported join types") {
    val df = Seq((1L, "a")).toDF("k", "v")
    intercept[IllegalArgumentException](SkewJoin.salted(df, df, "k", 4, "right_outer"))
    intercept[IllegalArgumentException](SkewJoin.salted(df, df, "k", 0))
  }

  test("bloom-pruned join equals the exact join (long and string keys)") {
    val fact = (0L until 3000L).map(i => (i % 500, i)).toDF("fk", "payload")
    val dim = (0L until 500L by 7L).map(k => (k, s"d$k")).toDF("dk", "attr")
    val pruned = SkewJoin.bloomPruned(fact, dim, "fk", "dk", expectedItems = 1000)
    val exact = fact.join(dim, $"fk" === $"dk")
    assert(sortedRows(pruned).sameElements(sortedRows(exact)))

    val factS = fact.withColumn("fk", concat(lit("k"), $"fk")).drop("payload")
    val dimS = dim.withColumn("dk", concat(lit("k"), $"dk"))
    val prunedS = SkewJoin.bloomPruned(factS, dimS, "fk", "dk", expectedItems = 1000)
    assert(prunedS.count() == factS.join(dimS, $"fk" === $"dk").count())
  }

  test("bloom prune drops most non-matching rows before the join") {
    val fact = (0L until 10000L).map(i => (i, i)).toDF("fk", "payload")
    val dim = (0L until 100L).map(k => (k, s"d$k")).toDF("dk", "attr")
    val kept = fact.filter(SkewJoin.bloomProbe(dim, "dk", $"fk", 100)).count()
    // 100 true keys + ~3% fp on the other 9900 — far below the 10000 a
    // plain shuffle would move
    assert(kept < 1000, s"bloom should prune ~97% of misses, kept $kept")
    assert(kept >= 100)
  }

  test("bloom-pruned join rejects unsupported key types") {
    val fact = Seq((1.5, 1L)).toDF("fk", "p")
    val dim = Seq((1.5, "a")).toDF("dk", "a")
    intercept[IllegalArgumentException](
      SkewJoin.bloomPruned(fact, dim, "fk", "dk", 10))
  }

  test("join advisor picks each strategy from the stats that justify it") {
    def strat(big: org.apache.spark.sql.DataFrame,
              small: org.apache.spark.sql.DataFrame) =
      SkewJoin.advise(big, small, "k", "k",
        broadcastRows = 3, skewRowsPerTask = 50, bloomCoverage = 0.5)
        .head().getString(4)

    val uniform = (0L until 200L).map(k => (k, k)).toDF("k", "v")
    // 2 distinct small keys <= 3 → broadcast wins regardless of shape
    assert(strat(uniform, Seq(1L, 2L).map(Tuple1(_)).toDF("k")) == "broadcast")
    // heavy key: 100 of 200 rows on k=0 > 50-row task budget → salt
    val skewed = ((0 until 100).map(_ => (0L, 0L)) ++
      (1L until 101L).map(k => (k, k))).toDF("k", "v")
    val small = (0L until 10L).map(Tuple1(_)).toDF("k")
    assert(strat(skewed, small) == "salt")
    // 10 of 200 uniform keys match → 5% coverage < 50% → bloom
    assert(strat(uniform, small) == "bloom")
    // every big row matches → no pathology → shuffle
    assert(strat(uniform, (0L until 200L).map(Tuple1(_)).toDF("k")) == "shuffle")
  }

  test("chunk covers every token, respects overlap, and is deterministic") {
    val size = 8; val overlap = 3; val step = size - overlap
    val docs = Seq(
      (1L, (1 to 30).map(i => s"t$i").mkString(" ")),  // multi-chunk
      (2L, (1 to 8).map(i => s"s$i").mkString(" ")),   // exactly one window
      (3L, "short doc"),                               // under size
      (4L, (1 to 9).map(i => s"u$i").mkString(" "))    // one token past
    ).toDF("doc_id", "text")
    val out = TextAnalysis.chunk(docs, "text", "doc_id", size, overlap)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getString(3)))

    // doc 1: nch = 1 + ceil((30-8)/5) = 6; chunk i starts at token i*5
    val d1 = out.filter(_._1 == 1L).sortBy(_._2)
    assert(d1.length == 6)
    for ((_, cid, n, chunk) <- d1) {
      val toks = chunk.split(" ")
      assert(toks.head == s"t${cid * step + 1}", s"chunk $cid starts wrong")
      assert(n == toks.length && n <= size)
    }
    // consecutive chunks share exactly `overlap` tokens (full windows)
    for (Seq(a, b) <- d1.toSeq.sliding(2) if b._3 == size)
      assert(a._4.split(" ").takeRight(overlap).sameElements(
        b._4.split(" ").take(overlap)))
    // every token of doc 1 appears in some chunk
    assert(d1.flatMap(_._4.split(" ")).toSet == (1 to 30).map(i => s"t$i").toSet)
    // docs at or under the window yield exactly one chunk
    assert(out.count(_._1 == 2L) == 1 && out.count(_._1 == 3L) == 1)
    assert(out.filter(_._1 == 3L).head._3 == 2)
    // 9 tokens, size 8: second chunk holds tokens 6..9
    val d4 = out.filter(_._1 == 4L).sortBy(_._2)
    assert(d4.length == 2 && d4(1)._4 == "u6 u7 u8 u9")
  }

  test("chunk validates window geometry") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](TextAnalysis.chunk(docs, "text", "doc_id", 4, 4))
    intercept[IllegalArgumentException](TextAnalysis.chunk(docs, "text", "doc_id", 0, 0))
  }
}
