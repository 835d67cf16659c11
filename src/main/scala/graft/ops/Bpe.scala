package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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
  * 100 TB). Per round: one partial-aggregatable pair count, a 1-row
  * TakeOrdered argmax to the driver (O(iters) driver state, the same
  * bounded-collect class as the k-means centroid table), and a pure
  * per-row greedy re-segmentation. `localCheckpoint` truncates the
  * per-round lineage exactly like the connected-components loops.
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

  /** Run `iters` merge rounds; returns the learned merge table
    * (rank, left, right, pair_count). Stops early when no pair
    * reaches `minCount`.
    */
  def train(df: DataFrame, textCol: String, iters: Int,
            minCount: Long = 2L): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    var words = graft.util.Lineage.truncate(wordFreq(df, textCol)
      .select(col("freq"), charSyms(col("word")).as("syms")))
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var r = 0
    var done = false
    while (r < iters && !done) {
      val top = pairCounts(words)
        .orderBy(col("cnt").desc, col("a"), col("b")).limit(1).collect()
      if (top.isEmpty || top(0).getAs[Long]("cnt") < minCount) done = true
      else {
        val (a, b, c) = (top(0).getAs[String]("a"), top(0).getAs[String]("b"),
          top(0).getAs[Long]("cnt"))
        merges += ((r, a, b, c))
        words = graft.util.Lineage.truncate(words
          .select(col("freq"), mergeOnce(col("syms"), a, b).as("syms")))
        r += 1
      }
    }
    merges.toSeq.toDF("rank", "left", "right", "pair_count")
  }
}
