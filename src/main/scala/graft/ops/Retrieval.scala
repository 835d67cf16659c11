package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Full-text retrieval over the corpus — BM25 (Robertson/Spärck Jones;
  * the Okapi k1/b form Lucene defaults to) as a batch top-k search.
  * The pipeline use is query-by-document: probe a corpus with a set of
  * query texts (leaked eval sets, suspected duplicates, curated
  * exemplars) and rank the best-matching documents — the lexical
  * complement of the embedding ANN family in graft.sim.
  *
  * Scale shape: the corpus side is ONE tokenize+aggregate chain — the
  * (doc, term, tf) table, truncated once because three consumers
  * derive from it (doc lengths, document frequencies, the probe join;
  * the PMI lesson: exchange reuse is not a contract). The probe side
  * is a bounded query workload: its term table (with per-term idf
  * joined from the corpus df aggregate) broadcasts, so scoring is a
  * broadcast hash join pruning the tf table scan-side — the corpus
  * never self-joins and never re-shuffles for the query set. Top-k is
  * a per-query window over only the matched candidates.
  *
  * Engine-exact scoring: with k1 = 1.2, b = 0.75 the BM25 term weight
  * tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)) is the rational
  * 22·tf·T / (10·T·tf + 3·T + 9·dl·N)  (T = total tokens, N = docs),
  * so numerator and denominator are EXACT integers; idf is quantized
  * to round(ln·10⁶) once per term (the C11q precedent: JVM-vs-DuckDB
  * ln agrees within 1 ulp), and the per-term score is one
  * deterministic double division rounded to integer micro-units —
  * summed as exact longs.
  */
object Retrieval {

  /** (query_id, doc_id, rank, score_micro): BM25 top-k documents for
    * each probe. Probes are (query_id, text) rows — a bounded workload
    * table, not a corpus.
    */
  def bm25(df: DataFrame, textCol: String, idCol: String,
           probes: DataFrame, probeTextCol: String, probeIdCol: String,
           nQueryTerms: Int = 8, topK: Int = 5): DataFrame = {
    val toks = df.select(col(idCol).as("doc_id"),
        explode(split(TextAnalysis.normalize(col(textCol)), " ")).as("term"))
      .filter(length(col("term")) > 0)
    // corpus statistics: one aggregate, three consumers → truncate
    val tf = graft.util.Lineage.truncate(
      toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf")))
    val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
    val dft = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val nt = dl.agg(count(lit(1)).as("n"), sum("dl").as("t"))

    // probe terms: first nQueryTerms distinct tokens of each probe text
    val qt = probes.select(col(probeIdCol).as("query_id"),
        explode(array_distinct(slice(
          filter(split(TextAnalysis.normalize(col(probeTextCol)), " "),
            w => length(w) > 0),
          1, nQueryTerms))).as("term"))
    // per-term idf for probe terms only: the df aggregate is
    // vocab-bounded; the probe-term semi side is broadcast-small
    val qi = dft.join(broadcast(qt), Seq("term"))
      .crossJoin(broadcast(nt))
      .select(col("query_id"), col("term"), col("n"), col("t"),
        round(log((col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5))
          + lit(1)) * lit(1e6)).cast("long").as("qidf"))

    val scored = tf.join(broadcast(qi), Seq("term"))
      .join(dl, Seq("doc_id"))
      .select(col("query_id"), col("doc_id"),
        round((col("qidf") * lit(22L) * col("tf")).cast("double") * col("t") /
          (lit(10L) * col("t") * col("tf") + lit(3L) * col("t") +
            lit(9L) * col("dl") * col("n")).cast("double"))
          .cast("long").as("st"))
      .groupBy("query_id", "doc_id").agg(sum("st").as("score_micro"))

    val w = Window.partitionBy("query_id")
      .orderBy(col("score_micro").desc, col("doc_id"))
    scored.select(col("query_id"), col("doc_id"),
        row_number().over(w).cast("long").as("rank"), col("score_micro"))
      .filter(col("rank") <= topK)
  }

  /** Query-by-document convenience: every doc with `pick` true is a
    * probe against the full corpus (self-hits retained — rank 1 being
    * the query document is itself a useful integrity signal).
    */
  def bm25SelfProbe(df: DataFrame, textCol: String, idCol: String,
                    pick: Column, nQueryTerms: Int = 8,
                    topK: Int = 5): DataFrame =
    bm25(df, textCol, idCol, df.filter(pick), textCol, idCol,
      nQueryTerms, topK)

  /** Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR 2009)
    * of per-query ranked lists — the standard hybrid-retrieval merge
    * of a lexical (BM25) and a semantic (embedding-ANN) ranking, which
    * consistently beats either list alone without ever comparing their
    * incommensurable scores: only RANKS enter the fusion.
    *
    * Each input list is (query_id, doc_id, rank) with ranks dense from
    * 1 per query. A document's fused score is Σ_lists 1/(kConst+rank);
    * kConst = 60 is the paper's constant. Engine-exactness: each
    * contribution is the INTEGER quotient 10⁶ div (kConst + rank) —
    * floor division of positive integers, bit-identical on any engine,
    * order-independent under the long sum (vs summing 1/(60+r) doubles,
    * whose value depends on addition order). Ties broken by doc_id.
    *
    * Scale shape: the inputs are |queries|·k rows — the searches that
    * produced them are the expensive part (each audited on its own);
    * fusion itself is a union + one |queries|·k-row partial agg + a
    * per-query window. At 100 TB of corpus this stage is noise.
    */
  def rrf(lists: Seq[DataFrame], kConst: Int = 60,
          topK: Int = 10): DataFrame = {
    require(lists.nonEmpty, "rrf: need at least one ranked list")
    val tagged = lists.map(_.select(col("query_id"), col("doc_id"),
      expr(s"1000000 DIV (${kConst}L + rank)").as("contrib")))
    val unioned = tagged.reduce(_.unionByName(_))
    val w = Window.partitionBy("query_id")
      .orderBy(col("rrf_micro").desc, col("doc_id").asc)
    unioned.groupBy("query_id", "doc_id")
      .agg(count(lit(1)).as("n_lists"), sum("contrib").as("rrf_micro"))
      .withColumn("fused_rank", row_number().over(w).cast("long"))
      .filter(col("fused_rank") <= topK)
      .select("query_id", "doc_id", "fused_rank", "n_lists", "rrf_micro")
  }
}
