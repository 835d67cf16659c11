package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.util.Hashing

/** In-engine quality-classifier training: logistic regression over
  * hashed bag-of-words features — the fasttext-style "does this look
  * like reference text?" filter (GPT-3/CCNet-lineage) trained and
  * applied WITHOUT leaving Spark or adding an ML dependency.
  *
  * Determinism (the property RNG-seeded ML trainers don't have): all
  * cross-row sums are over INTEGER micro-units —
  *  - per-doc logits z_d = Σ_f x_df·w_f are exact longs,
  *  - σ quantized to σq = round(σ·10⁶),
  *  - per-feature gradients g_f = Σ_d x_df·(10⁶·y_d − σq_d) are exact
  *    long sums (order/partitioning independent),
  *  - the weight step w_f += round(g_f / (2·N)) (η = 0.5/N) is one
  *    double division+round over exact operands.
  * So training is bit-reproducible across runs, partitionings and
  * cluster sizes, and the FIRST iteration (σ ≡ ½ exactly at w = 0) is
  * pure integer arithmetic end-to-end — DuckDB-replayable, which is
  * what the `quality_lr_score` hash gate checks. Later iterations
  * evaluate exp() on exact inputs (JVM-deterministic; cross-engine ≤1
  * ulp — the same accepted envelope as Sampling.importance).
  *
  * Scale shape: features explode once into (id, y, f, x) and are
  * localCheckpointed; each iteration is a broadcast join of the
  * m-row weight table (m ≤ ~10⁴, a config constant), one partial-agg
  * per-doc logit sum, one shuffle of per-doc σq back onto the feature
  * rows (both shuffles hash-partitioned on uniform keys), and one
  * partial-agg per-feature gradient. Driver state is the m-row weight
  * map — the same bounded-collect class as the k-means centroid
  * table. No RDDs, no MLlib, no Python.
  */
object Classifier {

  /** Hashed unigram+bigram feature counts with labels:
    * (id, y, f, x) — same feature derivation as Sampling.importance
    * (portable md5 pmod m) so the two share oracle arithmetic.
    */
  def features(df: DataFrame, textCol: String, idCol: String,
               isTarget: Column, m: Int): DataFrame = {
    val ws = split(TextAnalysis.normalize(col(textCol)), " ")
    val base = df.select(col(idCol).as("id"),
      isTarget.cast("boolean").as("t"), ws.as("__ws"))
    val uni = base.select(col("id"), col("t"), explode(col("__ws")).as("feat"))
    val bi = base.select(col("id"), col("t"),
      explode(when(size(col("__ws")) >= 2,
        transform(sequence(lit(1), size(col("__ws")) - 1),
          i => concat(element_at(col("__ws"), i), lit(" "),
            element_at(col("__ws"), i + 1))))
        .otherwise(array().cast("array<string>"))).as("feat"))
    uni.unionByName(bi)
      .select(col("id"), when(col("t"), 1L).otherwise(0L).as("y"),
        pmod(Hashing.portableHash64(col("feat")), lit(m.toLong)).as("f"))
      .groupBy("id", "y", "f").agg(count(lit(1)).as("x"))
  }

  /** Train `iters` full-batch GD rounds; returns the m-row weight
    * table (f, wq) in micro-units. η = 0.5/N per round.
    */
  def train(df: DataFrame, textCol: String, idCol: String,
            isTarget: Column, m: Int = 1024, iters: Int = 1): DataFrame = {
    val feat = graft.util.Lineage.truncate(features(df, textCol, idCol, isTarget, m))
    trainOnFeatures(df.sparkSession, feat, df.count(), iters)
  }

  /** Train on an already-materialized [[features]] table — lets a
    * train-then-score pipeline featurize the corpus ONCE (the feature
    * explode is the dominant cost; scoring reuses the same rows since
    * the weight sum ignores `y`).
    */
  def trainOnFeatures(spark: SparkSession, feat: DataFrame, nDocs: Long,
                      iters: Int): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    import spark.implicits._
    var w = Map.empty[Long, Long].withDefaultValue(0L)
    for (_ <- 0 until iters) {
      val wDf = w.toSeq match {
        case Seq() => Seq((-1L, 0L)).toDF("f", "wq") // empty stand-in
        case s => s.toDF("f", "wq")
      }
      val sig = feat
        .join(broadcast(wDf), Seq("f"), "left")
        .groupBy("id")
        .agg(sum(col("x") * coalesce(col("wq"), lit(0L))).as("z"))
        .select(col("id"),
          round(lit(1e6) / (lit(1.0) + exp(-col("z").cast("double") / 1e6)))
            .cast("long").as("sq"))
      val grad = feat.join(sig, Seq("id"))
        .groupBy("f")
        .agg(sum(col("x") * (col("y") * 1000000L - col("sq"))).as("g"))
        .collect()
      w = grad.map { r =>
        val f = r.getLong(0)
        f -> (w(f) + math.round(r.getLong(1).toDouble / (2.0 * nDocs)))
      }.toMap.withDefaultValue(0L)
    }
    w.toSeq.toDF("f", "wq")
  }

  /** Exact-integer classifier scores: (id, score) with
    * score = Σ_f x_df·w_f in micro-units — monotone in the logit, so
    * thresholding it IS thresholding the probability.
    */
  def score(df: DataFrame, textCol: String, idCol: String,
            weights: DataFrame, m: Int): DataFrame =
    scoreFeatures(features(df, textCol, idCol, lit(false), m), weights)

  /** Score an already-materialized [[features]] table (the weight sum
    * ignores `y`, so train-time features score as-is).
    */
  def scoreFeatures(feat: DataFrame, weights: DataFrame): DataFrame =
    feat.join(broadcast(weights), Seq("f"), "left")
      .groupBy(col("id"))
      .agg(sum(col("x") * coalesce(col("wq"), lit(0L))).as("score"))
      .select(col("id").as("doc_id"), col("score"))

  /** Train AND score with ONE feature pass — the composed-pipeline
    * entry: featurize, localCheckpoint, run the GD rounds, then score
    * the same materialized rows.
    */
  def trainScored(df: DataFrame, textCol: String, idCol: String,
                  isTarget: Column, m: Int = 1024, iters: Int = 1): DataFrame = {
    val feat = graft.util.Lineage.truncate(features(df, textCol, idCol, isTarget, m))
    val w = trainOnFeatures(df.sparkSession, feat, df.count(), iters)
    scoreFeatures(feat, w)
  }
}
