package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer TRAINING (Sennrich et al. 2016) — the
  * vocabulary-learning step a training-data pipeline runs before token
  * counting, packing and budget sampling can be denominated in real
  * tokens rather than whitespace words.
  *
  * Spark-first shape: BPE iterates on the WORD-FREQUENCY table, not
  * the corpus — one corpus pass builds (word, freq), and every merge
  * round after that is vocab-sized (Zipf: the distinct-word table is
  * orders of magnitude smaller than the corpus, and bounded by it at
  * 100 TB). Per round: one partial-aggregatable pair count, a
  * (batchK+1)-row TakeOrdered argmax to the driver (O(iters) driver
  * state, the same bounded-collect class as the k-means centroid
  * table), and a pure per-row greedy re-segmentation applying up to
  * batchK provably-independent merges at once — so the driver
  * round-trip count, the real cost of a 32k-merge vocabulary, shrinks
  * by ~batchK while the learned table stays EXACTLY the sequential
  * one. Lineage.truncate cuts the per-round lineage exactly like the
  * connected-components loops (reliable-checkpoint aware).
  *
  * Determinism: the winning pair is the TOTAL order (count desc,
  * left asc, right asc), and the greedy left-to-right non-overlapping
  * merge is a pure array fold — results are identical across runs,
  * partitionings and engines (iteration-0 pair counts are DuckDB
  * hash-gated as `bpe_top_pairs`; the merge loop is spec-pinned).
  */
object Bpe {

  /** (word, freq) over normalized whitespace words — the ONE corpus
    * pass; everything after iterates on this aggregate.
    */
  def wordFreq(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(split(TextAnalysis.normalize(col(textCol)), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Character segmentation via substr — NOT split(word, ""), whose
    * Java regex semantics keep a trailing empty string that DuckDB's
    * string_split drops.
    */
  def charSyms(word: Column): Column =
    transform(sequence(lit(1), length(word)), i => word.substr(i, lit(1)))

  /** Adjacent-pair counts weighted by word frequency over a
    * (freq, syms) table: pairs materialize only in the explode of a
    * per-row transform (never a self-join), and the count combines
    * map-side.
    */
  def pairCounts(words: DataFrame): DataFrame =
    words.filter(size(col("syms")) >= 2)
      .select(col("freq"),
        explode(transform(sequence(lit(1), size(col("syms")) - 1),
          i => struct(element_at(col("syms"), i).as("a"),
            element_at(col("syms"), i + lit(1)).as("b")))).as("p"))
      .select(col("freq"), col("p.a").as("a"), col("p.b").as("b"))
      .groupBy("a", "b").agg(sum("freq").as("cnt"))

  /** Greedy left-to-right non-overlapping merge of (a, b) → ab in one
    * symbol array: a pure `aggregate` fold whose accumulator carries
    * the rebuilt array plus a consumed-next flag, so "aaa" under
    * (a, a) becomes ["aa", "a"], never ["aa", "aa"]. Codegen'd per-row
    * arithmetic, no shuffle.
    */
  def mergeOnce(syms: Column, a: String, b: String): Column = {
    val empty = array().cast("array<string>")
    aggregate(
      sequence(lit(1), size(syms)),
      struct(empty.as("out"), lit(false).as("skip")),
      (acc, i) => {
        val out = acc.getField("out")
        val skip = acc.getField("skip")
        val cur = element_at(syms, i)
        // null past the end (plain element_at throws under ANSI)
        val nxt = when(i < size(syms), element_at(syms, i + lit(1)))
        when(skip, struct(out.as("out"), lit(false).as("skip")))
          .when(cur === lit(a) && nxt === lit(b),
            struct(concat(out, array(lit(a + b))).as("out"), lit(true).as("skip")))
          .otherwise(struct(concat(out, array(cur)).as("out"), lit(false).as("skip")))
      },
      acc => acc.getField("out"))
  }

  /** Learn up to `iters` merges; returns the merge table
    * (rank, left, right, pair_count). Stops early when no pair
    * reaches `minCount`.
    *
    * Merges are learned in BATCHED driver rounds ([[trainWithRounds]])
    * — up to `batchK` merges per Spark round-trip instead of one —
    * with the batch rule chosen so the learned table is IDENTICAL to
    * one-merge-at-a-time training (spec-pinned). A production 32k-merge
    * vocabulary at batchK=16 needs ~2k sequential Spark rounds instead
    * of 32k; the data-side cost per round is unchanged (one pair count
    * + one re-segmentation of the vocab-sized word table).
    */
  def train(df: DataFrame, textCol: String, iters: Int,
            minCount: Long = 2L, batchK: Int = 16): DataFrame =
    trainWithRounds(df, textCol, iters, minCount, batchK)._1

  /** [[train]] plus the number of driver round-trips taken — the
    * batching spec asserts the reduction directly.
    *
    * Why a batch can be applied at once AND still equal sequential
    * training: take the maximal pairwise-non-conflicting PREFIX of the
    * candidate list sorted by (count desc, left, right) — stop at the
    * first candidate sharing a symbol with an earlier selection — then
    * keep only members whose count is STRICTLY above the first
    * excluded candidate's count (`floor`). Disjoint merges cannot
    * change each other's pair counts, so sequential training picks
    * exactly this prefix in order; pairs CREATED by a merge (x, ab)
    * are bounded by their pre-merge source pair (x, a), which shares a
    * symbol, is therefore excluded, and so counts ≤ floor — the
    * strict trim means no new or decreased pair can overtake a batch
    * member, ties included. When the trim empties the batch (e.g. two
    * equal-count conflicting candidates), fall back to the top-1
    * merge, which is literally the sequential argmax.
    */
  private[graft] def trainWithRounds(df: DataFrame, textCol: String, iters: Int,
                                     minCount: Long = 2L, batchK: Int = 16)
      : (DataFrame, Int) = {
    require(batchK >= 1, s"batchK must be >= 1, got $batchK")
    val spark = df.sparkSession
    import spark.implicits._
    var words = graft.util.Lineage.truncate(wordFreq(df, textCol)
      .select(col("freq"), charSyms(col("word")).as("syms")))
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var rounds = 0
    var done = false
    while (merges.size < iters && !done) {
      val cand = pairCounts(words)
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(batchK + 1).collect()
        .map(r => (r.getAs[String]("a"), r.getAs[String]("b"), r.getAs[Long]("cnt")))
      if (cand.isEmpty || cand(0)._3 < minCount) done = true
      else {
        // maximal non-conflicting prefix, capped by batchK
        val used = scala.collection.mutable.Set.empty[String]
        val prefix = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
        var stopped = false
        while (!stopped && prefix.size < batchK && prefix.size < cand.length) {
          val (a, b, _) = cand(prefix.size)
          if (used(a) || used(b)) stopped = true
          else { prefix += cand(prefix.size); used += a; used += b }
        }
        // floor = count of the first candidate NOT in the prefix (a
        // conflict, or the batchK+1-th fetched); absent only when the
        // whole pair table fit in the fetch conflict-free
        val floor = if (cand.length > prefix.size) Some(cand(prefix.size)._3) else None
        val eligible = prefix.takeWhile(_._3 >= minCount)
          .take(iters - merges.size)
        val batch = floor match {
          case Some(f) =>
            val strict = eligible.takeWhile(_._3 > f)
            if (strict.isEmpty) eligible.take(1) else strict
          case None => eligible
        }
        if (batch.isEmpty) done = true
        else {
          batch.foreach { case (a, b, c) => merges += ((merges.size, a, b, c)) }
          words = graft.util.Lineage.truncate(words.select(col("freq"),
            batch.foldLeft(col("syms")) { case (s, (a, b, _)) =>
              mergeOnce(s, a, b) }.as("syms")))
          rounds += 1
        }
      }
    }
    (merges.toSeq.toDF("rank", "left", "right", "pair_count"), rounds)
  }

  // ---------------------------------------------------------------- encode

  /** Greedy BPE ENCODE of a word column against a fixed merge table
    * (rank = list index): min-rank leftmost merge to fixpoint, the
    * inference twin of [[train]]. The loop is data-dependent (a fold
    * applies each merge a fixed number of times, the encode must
    * iterate until no pair applies), so built-ins can't express it —
    * this is the native expression `graft_bpe_encode`
    * ([[graft.functions.BpeEncodeExpr]]), a per-row walk inside
    * whole-stage codegen with the table as one plan literal (bounded
    * by the vocabulary, the PQ-codebook class of driver state).
    */
  def encodeCol(word: Column, merges: Seq[(String, String)]): Column = {
    val tableLit = typedLit(merges)
    if (SparkSession.active.catalog.functionExists("graft_bpe_encode"))
      call_function("graft_bpe_encode", word, tableLit)
    else {
      // Identical results through the same helper, interpreted per row
      // — registration affects only speed (GraftExtensions contract).
      val table = {
        val t = new java.util.HashMap[(String, String), Integer]()
        merges.zipWithIndex.foreach { case ((a, b), i) =>
          t.putIfAbsent((a, b), Integer.valueOf(i))
        }
        t
      }
      val f = udf { (w: String) =>
        if (w == null) null
        else {
          val arr = graft.functions.BpeEncodeExpr.encode(
            org.apache.spark.unsafe.types.UTF8String.fromString(w), table)
          (0 until arr.numElements()).map(arr.getUTF8String(_).toString)
        }
      }
      f(word)
    }
  }

  /** Top-k adjacent pairs of a (freq, syms) table by the training
    * total order (count desc, left, right) — rank = position. Bounded
    * k-row collect, the argmax class [[trainWithRounds]] uses.
    */
  private def topPairs(syms: DataFrame, k: Int): Seq[(String, String)] =
    pairCounts(syms)
      .orderBy(col("cnt").desc, col("a"), col("b")).limit(k)
      .collect().map(r => (r.getAs[String]("a"), r.getAs[String]("b"))).toSeq

  /** A merge table derivable in PURE SQL — the oracle-gate twin of a
    * trained table: top-k1 character pairs by (count desc, a, b), then
    * top-k2 pairs of the k1-encoded vocabulary (ranks k1..k1+k2-1).
    * Level 2 makes multi-character symbols participate in ranks, so
    * the gate exercises the same min-rank/leftmost/fixpoint mechanics
    * as a trained table while DuckDB can replay the derivation.
    */
  def twinMerges(words: DataFrame, k1: Int, k2: Int): Seq[(String, String)] = {
    val cs = words.select(col("freq"), charSyms(col("word")).as("syms"))
    val m0 = topPairs(cs, k1)
    val e0 = words.select(col("freq"), encodeCol(col("word"), m0).as("syms"))
    m0 ++ topPairs(e0, k2)
  }

  /** Vocabulary-level encode under a fixed merge table:
    * (word, freq, n_tokens, seg). The corpus pass is [[wordFreq]];
    * everything after is vocab-sized (the Zipf shape every Bpe
    * operator rides).
    */
  def encodeWords(words: DataFrame, merges: Seq[(String, String)]): DataFrame =
    words.select(col("word"), col("freq"),
        encodeCol(col("word"), merges).as("syms"))
      .select(col("word"), col("freq"),
        size(col("syms")).cast("long").as("n_tokens"),
        concat_ws(" ", col("syms")).as("seg"))

  /** Per-document REAL token counts under a fixed merge table — what
    * token-budget sampling and packing should be denominated in once
    * a vocabulary is trained. The corpus explodes to (doc_id, word)
    * once; the encode itself runs on the DISTINCT word table and joins
    * back broadcast (the vocabulary is bounded — Zipf — while the
    * corpus is not, so the big side never re-shuffles).
    */
  def encodeDocs(df: DataFrame, textCol: String, idCol: String,
                 merges: Seq[(String, String)]): DataFrame = {
    val docWords = df.select(col(idCol),
        explode(split(TextAnalysis.normalize(col(textCol)), " ")).as("word"))
      .filter(length(col("word")) > 0)
    val wordTokens = docWords.groupBy("word").agg(count(lit(1)).as("freq"))
      .select(col("word"), size(encodeCol(col("word"), merges))
        .cast("long").as("n_tokens"))
    docWords.join(broadcast(wordTokens), Seq("word"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"), sum("n_tokens").as("bpe_tokens"))
  }

  /** Per-row REAL token count as a single Column — the shape stage
    * plumbing needs (graft.Pipeline's `token_budget` takes a token
    * Column, not a joined table). The per-word encode runs inside a
    * higher-order fold (interpreted per row — fine for an
    * admission-control count; the codegen'd vocab-join path for bulk
    * corpus encoding is [[encodeDocs]]).
    */
  def tokenCountCol(text: Column, merges: Seq[(String, String)]): Column =
    aggregate(
      filter(split(TextAnalysis.normalize(text), " "), w => length(w) > 0),
      lit(0L),
      (acc, w) => acc + size(encodeCol(w, merges)).cast("long"))

  /** Annotate a corpus with per-row real-token counts from a trained
    * merge table stored at `mergesPath` ([[train]] output written as
    * parquet) — the pipeline-stage entry point. The table is read
    * once on the driver (vocab-bounded); rows then price themselves
    * with a pure per-row count, so the stage is streaming-safe.
    */
  def annotateTokens(df: DataFrame, textCol: String, outCol: String,
                     mergesPath: String): DataFrame =
    df.withColumn(outCol, tokenCountCol(col(textCol),
      collectMerges(df.sparkSession.read.parquet(mergesPath))))

  /** Collect a TRAINED merge table ([[train]] output schema
    * rank/left/right) into the Seq form the encoders take — bounded
    * by the learned vocabulary, the centroid-table class of driver
    * state.
    */
  def collectMerges(trained: DataFrame): Seq[(String, String)] =
    trained.orderBy("rank").collect()
      .map(r => (r.getAs[String]("left"), r.getAs[String]("right"))).toSeq

  /** Encode with a TRAINED merge table ([[train]] output): collects
    * the (rank, left, right) rows — bounded by the learned vocabulary,
    * the same driver-state class as the centroid tables — and applies
    * [[encodeCol]]. Not SQL-oracle-expressible (the batched training
    * loop isn't); parity with the column-fold semantics is spec-pinned
    * instead, and the gate covers the encoder itself through
    * [[twinMerges]].
    */
  def encodeWithTrained(words: DataFrame, trained: DataFrame): DataFrame =
    encodeWords(words, collectMerges(trained))
}
