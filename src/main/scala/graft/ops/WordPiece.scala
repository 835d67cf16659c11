package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WordPiece tokenizer (the BERT-family third of the tokenizer trio —
  * [[Bpe]] trains/replays greedy merges, [[Unigram]] prunes a Viterbi
  * LM; WordPiece ENCODES by greedy longest-match-first against a
  * vocabulary, with `##`-prefixed continuation pieces and whole-word
  * `[UNK]` on any miss). The data-dependent per-word scan is the
  * native expression `graft_wordpiece_encode`
  * ([[graft.functions.WordPieceEncodeExpr]]); an identical-result
  * interpreted fallback keeps the GraftExtensions contract
  * (registration affects speed only).
  */
object WordPiece {

  /** Deterministic, oracle-replayable vocabulary: every single
    * code-point character of the word table in BOTH initial and
    * continuation form (full coverage — an in-corpus word can never
    * hit `[UNK]`, so the gate exercises real segmentation, not the
    * escape hatch) plus the top-k whole words by (freq desc, word asc)
    * as initial pieces — frequent words encode as one piece, the tail
    * splits. Bounded driver state: |alphabet|·2 + k strings (the BPE
    * merge-table class).
    */
  def vocab(words: DataFrame, k: Int): Seq[String] = {
    val chars = words
      .select(explode(split(col("word"), "")).as("c"))
      .filter(length(col("c")) > 0).distinct()
      .collect().map(_.getString(0)).sorted.toSeq
    val top = words.orderBy(col("freq").desc, col("word").asc)
      .select("word").limit(k).collect().map(_.getString(0)).toSeq
    (chars ++ chars.map("##" + _) ++ top).distinct
  }

  /** Segmentation column: array of pieces (`##` marks continuations),
    * or the one-element `[UNK]` array.
    */
  def encodeCol(word: Column, vocab: Seq[String]): Column = {
    val vocabLit = typedLit(vocab)
    if (SparkSession.active.catalog.functionExists("graft_wordpiece_encode"))
      call_function("graft_wordpiece_encode", word, vocabLit)
    else {
      val table = graft.functions.WordPieceEncodeExpr.buildTable(
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
          vocab.map(org.apache.spark.unsafe.types.UTF8String.fromString).toArray))
      val f = udf { (w: String) =>
        if (w == null) null
        else {
          val arr = graft.functions.WordPieceEncodeExpr.encode(
            org.apache.spark.unsafe.types.UTF8String.fromString(w), table)
          (0 until arr.numElements()).map(arr.getUTF8String(_).toString)
        }
      }
      f(word)
    }
  }

  /** Train-and-persist: derive the [[vocab]] from a corpus and write
    * it as a one-column `piece` parquet — the on-disk handoff
    * [[annotateTokens]] and the pipeline stage read (the Bpe.train /
    * Unigram.train convention: the trained table is a FILE, so a
    * streaming run prices rows against a fixed artifact).
    */
  def trainVocab(docs: DataFrame, textCol: String, k: Int,
                 path: String): Unit = {
    val spark = docs.sparkSession
    val words = Bpe.wordFreq(docs, textCol)
    import scala.jdk.CollectionConverters._
    spark.createDataset(vocab(words, k).asJava)(
        org.apache.spark.sql.Encoders.STRING)
      .toDF("piece").coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Annotation: per-row WordPiece token count from a persisted vocab
    * — `bpe_tokens`/`unigram_tokens`' sibling; fixed table on disk ⇒
    * pure per-row function, streaming-safe.
    */
  def annotateTokens(df: DataFrame, textCol: String, outCol: String,
                     vocabPath: String): DataFrame = {
    val spark = df.sparkSession
    require(spark.catalog.functionExists("graft_wordpiece_count"),
      "graft_wordpiece_count is not registered: add " +
        "spark.sql.extensions=graft.functions.GraftExtensions")
    val pieces = spark.read.parquet(vocabPath)
      .select(col("piece")).collect().map(_.getString(0)).sorted.toSeq
    df.withColumn(outCol, call_function("graft_wordpiece_count",
      TextAnalysis.normalize(col(textCol)), typedLit(pieces)))
  }

  /** (word, freq, n_pieces, seg) over a distinct-word table — the
    * [[Bpe.encodeWords]] output convention, so tokenizer comparisons
    * join on the same shape.
    */
  def encodeWords(words: DataFrame, vocab: Seq[String]): DataFrame =
    words.select(col("word"), col("freq"),
        encodeCol(col("word"), vocab).as("pieces"))
      .select(col("word"), col("freq"),
        size(col("pieces")).cast("long").as("n_pieces"),
        concat_ws(" ", col("pieces")).as("seg"))
}
