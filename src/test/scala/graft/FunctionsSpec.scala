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

  test("graft_h64/graft_h32 are bit-identical to the md5 conv chain") {
    assert(spark.catalog.functionExists("graft_h64"))
    assert(spark.catalog.functionExists("graft_h32"))
    // random-ish strings incl. multi-byte UTF-8, empties, long runs
    val df = spark.range(500).selectExpr(
      """concat(
        |  repeat(char(97 + id % 26), cast(id % 37 as int)),
        |  case when id % 5 = 0 then 'λπ☃日本語' else '' end,
        |  ':', cast(id * 2654435761 as string),
        |  case when id % 7 = 0 then '' else ' tail|seg ' end) as s""".stripMargin)
    val mismatches = df.selectExpr(
      "graft_h64(s) = cast(conv(substr(md5(s), 1, 15), 16, 10) as bigint) as ok64",
      "graft_h32(s) = cast(conv(substr(md5(s), 1, 8), 16, 10) as bigint) as ok32")
      .filter("not ok64 or not ok32").count()
    assert(mismatches == 0)
    // empty string and NULL behave like the builtin chain
    val r = spark.sql(
      """select graft_h64('') = cast(conv(substr(md5(''), 1, 15), 16, 10) as bigint) as emp,
        |       graft_h64(cast(null as string)) as nul""".stripMargin).head()
    assert(r.getBoolean(0))
    assert(r.isNullAt(1))
  }

  test("portableHash64 column form routes native and matches the chain") {
    val df = spark.range(300)
      .selectExpr("concat('k:', cast(id as string)) as s")
    val mismatches = df.select(
        graft.util.Hashing.portableHash64(col("s")).as("h"),
        expr("cast(conv(substr(md5(s), 1, 15), 16, 10) as bigint)").as("ref"))
      .filter("h <> ref").count()
    assert(mismatches == 0)
    // the routed plan actually uses the native expression
    val plan = df.select(graft.util.Hashing.portableHash64(col("s")))
      .queryExecution.analyzed.toString()
    assert(plan.contains("graft_h64"), s"expected native routing, got:\n$plan")
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

  test("graft_unigram_encode: min-cost segmentation vs exhaustive reference, ties and fallback pinned") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val vocab = Seq(("a", 100L), ("b", 150L), ("ab", 120L), ("ba", 120L),
      ("aba", 260L), ("bab", 500L), ("abab", 460L))
    val tab = array(vocab.map { case (p, c) =>
      struct(lit(p).as("piece"), lit(c).as("cost")) }: _*)
    val costs = vocab.toMap
    val unk = vocab.map(_._2).max + 1000000L
    // exhaustive reference: all segmentations, min cost, tie -> the
    // one whose REVERSED piece-length list is lexicographically
    // smallest (shortest last piece at every decision point)
    def segs(s: String): Seq[Seq[String]] =
      if (s.isEmpty) Seq(Seq())
      else (1 to s.length).flatMap { l =>
        val p = s.take(l)
        if (costs.contains(p) || l == 1)
          segs(s.drop(l)).map(p +: _)
        else Seq()
      }
    def cost(seg: Seq[String]): Long =
      seg.map(p => costs.getOrElse(p, unk)).sum
    import scala.math.Ordering.Implicits._
    def best(s: String): Seq[String] =
      segs(s).minBy(seg => (cost(seg), seg.reverse.map(_.length.toLong).toList))
    val words = Seq("ababab", "abba", "aabba", "bababa", "a", "xax", "")
    val got = words.toDF("w")
      .select(col("w"), call_function("graft_unigram_encode", col("w"), tab)
        .as("pieces"))
      .as[(String, Seq[String])].collect().toMap
    words.filter(_.nonEmpty).foreach { w =>
      assert(cost(got(w)) == cost(best(w)), s"$w: ${got(w)} vs ${best(w)}")
      assert(got(w) == best(w), s"tie-break for $w: ${got(w)} vs ${best(w)}")
      assert(got(w).mkString("") == w, s"pieces must concatenate back to $w")
    }
    assert(got("") == Seq())
    assert(got("xax").contains("x"), "unknown chars fall back to single-symbol pieces")
    // the whole-text count expression equals the sum of per-word
    // encode sizes (same table, same DP)
    val texts = Seq("abab ba xax", "  a  bab ", "", "ababab")
    val cnt = texts.toDF("t")
      .select(col("t"),
        call_function("graft_unigram_count", col("t"), tab).as("cnt"))
      .as[(String, Long)].collect().toMap
    texts.foreach { t =>
      val wantC = t.split(" ").filter(_.nonEmpty)
        .map(w => got.getOrElse(w, best(w)).size.toLong).sum
      assert(cnt(t) == wantC, s"count for '$t'")
    }
  }

  test("unigram train: recovers planted words as pieces, deterministic under layout") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = (0 until 80).map(i =>
      (i.toLong, "hello world " * 4 + s"rare$i")).toDF("doc_id", "text")
    def run(d: org.apache.spark.sql.DataFrame) =
      graft.ops.Unigram.train(d, "text", maxPieceLen = 6, vocabSize = 64,
        iters = 2).as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    val got = run(docs)
    val pieces = got.map(_._1).toSet
    assert(pieces.contains("hello") && pieces.contains("world"),
      s"planted words must become pieces, got $pieces")
    // the dominant words out-count every fragment
    val byCnt = got.sortBy(-_._2).map(_._1)
    assert(Set(byCnt(0), byCnt(1)) == Set("hello", "world"))
    assert(got.size <= 64)
    // every corpus character survives as a piece (coverage rule)
    val chars = docs.as[(Long, String)].collect()
      .flatMap(_._2.split(" ")).flatMap(_.toCharArray).map(_.toString).toSet
    assert(chars.subsetOf(pieces), s"missing chars: ${chars -- pieces}")
    assert(run(docs.repartition(7)) == got,
      "unigram training owes nothing to layout")
  }

  test("graft_wordpiece_encode: longest match, continuation marking, whole-word UNK") {
    import graft.ops.WordPiece
    import spark.implicits._
    val vocab = Seq("un", "unwanted", "want", "##want", "##ed", "##anted",
      "u", "n", "w", "a", "t", "e", "d", "##u", "##n", "##w", "##a",
      "##t", "##e", "##d")
    def enc(w: String): Seq[String] =
      Seq(Tuple1(w)).toDF("word")
        .select(WordPiece.encodeCol(col("word"), vocab).as("p"))
        .as[Seq[String]].head()
    // longest INITIAL match wins over a shorter one plus continuations
    assert(enc("unwanted") == Seq("unwanted"))
    // 'ly' has no continuation pieces: the whole word reports [UNK]
    // even though a prefix segmented — partial segmentations never leak
    assert(enc("unwantedly") == Seq("[UNK]"))
    // continuation pieces only match past position 0: "wanted" cannot
    // use initial "want" at pos 0 then "##ed"; it CAN use w+##anted
    assert(enc("wanted") == Seq("want", "##ed"))
    assert(enc("nud") == Seq("n", "##u", "##d"))
    assert(enc("") == Seq.empty)
    // native and interpreted paths agree (GraftExtensions contract)
    val words = Seq(("unwanted", 3L), ("wanted", 2L), ("nud", 1L),
      ("zzz", 1L)).toDF("word", "freq")
    val nat = WordPiece.encodeWords(words, vocab)
      .collect().map(r => (r.getString(0), r.getString(3))).toSet
    val table = graft.functions.WordPieceEncodeExpr.buildTable(
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
        vocab.map(org.apache.spark.unsafe.types.UTF8String.fromString).toArray))
    val interp = words.collect().map { r =>
      val arr = graft.functions.WordPieceEncodeExpr.encode(
        org.apache.spark.unsafe.types.UTF8String.fromString(r.getString(0)), table)
      (r.getString(0),
        (0 until arr.numElements()).map(arr.getUTF8String(_).toString).mkString(" "))
    }.toSet
    assert(nat == interp)
    assert(interp.toMap.apply("zzz") == "[UNK]")
  }
}
