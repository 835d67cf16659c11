package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer training (Kudo 2018, the SentencePiece
  * unigram model) — the second tokenizer family next to [[Bpe]]:
  * instead of learning merges bottom-up, start from a large seed
  * vocabulary of frequent substrings and let EM shrink it, with
  * encoding defined as the MIN-COST (Viterbi) segmentation under
  * piece costs −ln p(piece).
  *
  * Spark-first shape, same doctrine as BPE: everything iterates on
  * the (word, freq) aggregate, never the corpus (Zipf bounds the
  * distinct-word table); the seed-substring count is ONE explode +
  * partial-aggregated groupBy; each EM round is one distributed
  * Viterbi pass over the word table (the native codegen'd
  * `graft_unigram_encode` expression — a data-dependent DP with
  * backtrack, inexpressible as higher-order folds) followed by a
  * piece re-count, with the vocabulary itself the bounded driver
  * state (the k-means-centroid class).
  *
  * Determinism: seed selection is the total order (cnt desc, piece
  * asc) with every single character force-kept (coverage: any word
  * segments via the char fallback); costs are
  * round(ln(total/cnt)·10⁶) micro-nats computed with StrictMath.log
  * (bit-exact by spec on every JVM); Viterbi ties resolve to the
  * shortest last piece (the expression's contract). The whole train
  * is a pure function of the corpus — byte-stable across runs and
  * partitionings (roundgate-checked); the EM loop itself is not one
  * SQL statement, so `unigram_train` is rows-only with the
  * SQL-replayable seed hash-gated as `unigram_init` (the
  * kmeans/_init convention).
  */
object Unigram {

  /** Freq-weighted counts of every substring of length 1..maxPieceLen
    * over the distinct-word table (all positions, overlapping), with
    * the seed selection applied: all single characters, plus the top
    * multi-character pieces by (cnt desc, piece asc) up to
    * `vocabSize` total. One corpus pass for the word table + one
    * explode + one partial-aggregated count.
    */
  def initVocab(df: DataFrame, textCol: String,
                maxPieceLen: Int = 6, vocabSize: Int = 256,
                materialize: Boolean = true): DataFrame = {
    require(maxPieceLen >= 1 && vocabSize >= 1,
      s"bad maxPieceLen=$maxPieceLen / vocabSize=$vocabSize")
    val wf = Bpe.wordFreq(df, textCol)
    val subs = wf.select(col("freq"), explode(flatten(
        transform(sequence(lit(1), length(col("word"))), i =>
          transform(sequence(i, least(length(col("word")),
            i + lit(maxPieceLen - 1))), j =>
            col("word").substr(i, j - i + lit(1)))))).as("piece"))
      .groupBy("piece").agg(sum(col("freq")).as("cnt"))
    // one materialization feeds the single-char slice, its count, and
    // the multi-char top-N (three consumers of the substring count);
    // materialize=false keeps the lazy plan for audits
    val subsT = if (materialize) graft.util.Lineage.truncate(subs) else subs
    val singles = subsT.filter(length(col("piece")) === 1)
    // top-N multis via orderBy+limit (TakeOrderedAndProject — the
    // substring table is corpus-sized, a global rank window is not);
    // the single-char count is a tiny driver scalar
    val ns = singles.count().toInt
    val multis = subsT.filter(length(col("piece")) > 1)
      .orderBy(col("cnt").desc, col("piece").asc)
      .limit(math.max(0, vocabSize - ns))
    singles.unionByName(multis)
  }

  /** Driver-side costs from counts: −ln(cnt/total) in micro-nats.
    * StrictMath.log is bit-exact across JVMs, so the costs (and every
    * segmentation under them) are reproducible anywhere.
    */
  private def costsOf(vocab: Array[(String, Long)]): Array[(String, Long)] = {
    val total = vocab.map(_._2).sum.toDouble
    vocab.map { case (p, c) =>
      (p, math.round(StrictMath.log(total / c.toDouble) * 1e6))
    }
  }

  private def tableLit(costs: Array[(String, Long)]): Column =
    array(costs.sortBy(_._1).map { case (p, c) =>
      struct(lit(p).as("piece"), lit(c).as("cost")) }: _*)

  /** EM-refined unigram vocabulary: seed → `iters` rounds of
    * (distributed Viterbi re-segmentation of the word table under
    * current costs → freq-weighted piece re-count → prune to
    * `vocabSize` keeping all singles). Returns (piece, cnt,
    * cost_micro) of the final vocabulary, driver-sorted by piece.
    * Pieces that lose all their Viterbi traffic in a round drop out
    * (cnt 0 can't be kept — ln diverges); the char fallback keeps
    * every word encodable throughout.
    */
  def train(df: DataFrame, textCol: String,
            maxPieceLen: Int = 6, vocabSize: Int = 256,
            iters: Int = 2): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    val spark = df.sparkSession
    require(spark.catalog.functionExists("graft_unigram_encode"),
      "graft_unigram_encode is not registered: add " +
        "spark.sql.extensions=graft.functions.GraftExtensions " +
        "to the session (the Viterbi DP has no built-in fallback)")
    val wf = graft.util.Lineage.truncate(Bpe.wordFreq(df, textCol))
    var vocab = initVocab(df, textCol, maxPieceLen, vocabSize)
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy(_._1)
    var it = 0
    while (it < iters) {
      val tab = tableLit(costsOf(vocab))
      // two-step select: the analyzer extracts generators before it
      // resolves injected functions, so explode(call_function(...))
      // in ONE projection leaves the Project unresolved
      val counted = wf.select(col("freq"),
          call_function("graft_unigram_encode", col("word"), tab).as("pieces"))
        .select(col("freq"), explode(col("pieces")).as("piece"))
        .groupBy("piece").agg(sum(col("freq")).as("cnt"))
        .collect().map(r => (r.getString(0), r.getLong(1)))
      // prune: singles all kept (incl. fallback-only ones the table
      // didn't carry), top multis by (cnt desc, piece asc)
      // singles are COVERAGE, not candidates: every single-char piece
      // of the previous vocab survives even with zero Viterbi traffic
      // (count floored to 1 — ln needs positivity), the SentencePiece
      // required-character rule; multis live and die by traffic
      val isSingle = (p: String) => p.codePointCount(0, p.length) == 1
      val countMap = counted.toMap
      val singleNames = (vocab.map(_._1).filter(isSingle) ++
        counted.map(_._1).filter(isSingle)).distinct
      val singles = singleNames.map(p => (p, countMap.getOrElse(p, 1L)))
      val multis = counted.filter { case (p, _) => !isSingle(p) }
      vocab = (singles ++ multis.sortBy { case (p, c) => (-c, p) }
        .take(math.max(0, vocabSize - singles.length))).sortBy(_._1)
      it += 1
    }
    val out = costsOf(vocab)
    val rows = vocab.zip(out).map { case ((p, c), (_, cost)) => (p, c, cost) }
    spark.createDataFrame(rows.toSeq)
      .toDF("piece", "cnt", "cost_micro")
  }

  /** Per-row REAL token count under a trained vocabulary stored at
    * `vocabPath` ([[train]] output parquet) — the pipeline-stage
    * entry point, `Bpe.annotateTokens`' unigram sibling: the piece
    * table is read once on the driver (vocab-bounded state), each row
    * then prices itself with one Viterbi pass per word inside a pure
    * per-row fold — no shuffle, streaming-safe.
    */
  def annotateTokens(df: DataFrame, textCol: String, outCol: String,
                     vocabPath: String): DataFrame = {
    val spark = df.sparkSession
    require(spark.catalog.functionExists("graft_unigram_encode"),
      "graft_unigram_encode is not registered: add " +
        "spark.sql.extensions=graft.functions.GraftExtensions")
    val vocab = spark.read.parquet(vocabPath)
      .select(col("piece"), col("cost_micro")).collect()
      .map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    val tab = tableLit(vocab)
    // ONE top-level native call per row (graft_unigram_count walks
    // the words itself): nesting the DP expression inside a
    // higher-order lambda trips the analyzer's function-resolution
    // ordering, a dedicated whole-text expression doesn't
    df.withColumn(outCol, call_function("graft_unigram_count",
      TextAnalysis.normalize(col(textCol)), tab))
  }
}
