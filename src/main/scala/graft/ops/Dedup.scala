package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.util.Hashing

/** Deduplication operators for LLM-training-data pipelines
  * (SURVEY §2 C1–C5): exact, MinHash+LSH, SimHash, n-gram Jaccard.
  *
  * Scale shape: every operator is explode → hash → groupBy — the
  * candidate-generation pattern that avoids the N² cross join. Pair
  * outputs are always `id_a < id_b` distinct. Hashes are the portable
  * md5-derived family (util.Hashing) so DuckDB oracles can replay
  * them bit-for-bit.
  */
object Dedup {

  /** (id, token) distinct pairs from normalized text. */
  def tokenSet(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(col(idCol).as("id"), TextAnalysis.normalize(col(textCol)).as("norm"))
      .select(col("id"), explode(split(col("norm"), " ")).as("tok"))
      .distinct()

  /** Exact dedup: group by content hash, keep the smallest id.
    * One hash-partitioned groupBy; at 100 TB the md5 keys distribute
    * uniformly so no skew handling is needed.
    */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(col(idCol).as("id"), md5(TextAnalysis.normalize(col(textCol))).as("content_hash"))
      .groupBy("content_hash")
      .agg(min(col("id")).as("keeper_id"), count(lit(1)).as("n_copies"))

  /** MinHash signatures: `numHashes` seeded min-hashes over the
    * distinct token set. explode(tokens) × seeds → groupBy(id, seed)
    * min — fully partial-aggregatable.
    */
  def minHashSignatures(tokens: DataFrame, numHashes: Int): DataFrame =
    tokens
      .crossJoin(spark_range_seeds(tokens, numHashes))
      .select(col("id"), col("j"),
        Hashing.portableHash64(concat(col("j").cast("string"), lit(":"), col("tok"))).as("h"))
      .groupBy("id", "j").agg(min("h").as("h"))

  private def spark_range_seeds(df: DataFrame, n: Int): DataFrame =
    df.sparkSession.range(n).toDF("j")

  /** LSH banding: group the signature into `numBands` bands and hash
    * each band; docs sharing any (band, signature) bucket are
    * candidate pairs. groupBy buckets + within-bucket join — never a
    * global cross join.
    */
  def lshCandidates(signatures: DataFrame, numHashes: Int, numBands: Int): DataFrame = {
    val bandSize = numHashes / numBands
    val bands = signatures
      .withColumn("band", expr(s"j div $bandSize"))
      .groupBy("id", "band")
      .agg(md5(array_join(transform(array_sort(collect_list(struct(col("j"), col("h")))),
        x => x.getField("h").cast("string")), ",")).as("sig"))
    val a = bands.select(col("band"), col("sig"), col("id").as("id_a"))
    val b = bands.select(col("band"), col("sig"), col("id").as("id_b"))
    a.join(b, Seq("band", "sig"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** Exact Jaccard over distinct token sets for a candidate pair list
    * (the verify stage after LSH candidate generation). Intersection
    * via token join; |A|,|B| joined in; J = inter/(|A|+|B|-inter) as
    * one deterministic double division.
    */
  def verifyJaccard(tokens: DataFrame, candidates: DataFrame): DataFrame = {
    val sizes = tokens.groupBy("id").agg(count(lit(1)).as("n"))
    val inter = candidates
      .join(tokens.withColumnsRenamed(Map("id" -> "id_a", "tok" -> "tok_a")), Seq("id_a"))
      .join(tokens.withColumnsRenamed(Map("id" -> "id_b", "tok" -> "tok_b")), Seq("id_b"))
      .filter(col("tok_a") === col("tok_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnsRenamed(Map("id" -> "id_a", "n" -> "n_a")), Seq("id_a"))
      .join(sizes.withColumnsRenamed(Map("id" -> "id_b", "n" -> "n_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        (col("inter").cast("double") /
          (col("n_a") + col("n_b") - col("inter"))).as("jaccard"))
  }

  /** Full MinHash-LSH near-dup pipeline: signatures → banded
    * candidates → Jaccard-verified pairs ≥ threshold.
    */
  def minHashLsh(df: DataFrame, textCol: String, idCol: String,
                 numHashes: Int = 16, numBands: Int = 2,
                 threshold: Double = 0.7): DataFrame = {
    val toks = tokenSet(df, textCol, idCol)
    val cands = lshCandidates(minHashSignatures(toks, numHashes), numHashes, numBands)
    verifyJaccard(toks, cands)
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** 60-bit SimHash fingerprint over the distinct token set (bit b of
    * the fingerprint = sign of Σ_tokens ±1 by bit b of the token
    * hash). explode × 60 bits → two partial-aggregatable groupBys.
    */
  def simHash(tokens: DataFrame, bits: Int = 60): DataFrame =
    tokens
      .select(col("id"), Hashing.portableHash64(col("tok")).as("h"))
      .crossJoin(tokens.sparkSession.range(bits).toDF("b"))
      .select(col("id"), col("b"),
        (expr("(h div cast(pow(2, b) as bigint)) % 2") * 2 - 1).as("v"))
      .groupBy("id", "b").agg(sum("v").as("s"))
      .select(col("id"), col("b"),
        expr("case when s > 0 then cast(pow(2, b) as bigint) else 0L end").as("bitval"))
      .groupBy("id").agg(sum("bitval").as("simhash"))

  /** SimHash near-dup candidates: split the fingerprint into `bands`
    * bit-bands; fingerprints agreeing on any band are candidates
    * (hamming-distance analog of MinHash banding).
    */
  def simHashCandidates(fingerprints: DataFrame, bits: Int = 60, bands: Int = 4): DataFrame = {
    val width = bits / bands
    val banded = fingerprints
      .crossJoin(fingerprints.sparkSession.range(bands).toDF("band"))
      .select(col("id"), col("band"),
        expr(s"(simhash div cast(pow(2, band * $width) as bigint)) % cast(pow(2, $width) as bigint)").as("piece"))
    val a = banded.select(col("band"), col("piece"), col("id").as("id_a"))
    val b = banded.select(col("band"), col("piece"), col("id").as("id_b"))
    a.join(b, Seq("band", "piece")).filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** (id, shingle) distinct char-n-gram pairs. */
  def shingleSet(df: DataFrame, textCol: String, idCol: String, n: Int): DataFrame =
    df.select(col(idCol).as("id"), TextAnalysis.normalize(col(textCol)).as("norm"))
      .select(col("id"), explode(expr(
        s"array_distinct(transform(sequence(1, greatest(length(norm) - ${n - 1}, 1)), i -> substr(norm, i, $n)))")).as("tok"))
      .distinct()

  /** Char-n-gram Jaccard near-dup pairs ≥ threshold, via the shared
    * shingle inverted index (explode → join → count), never N².
    */
  def ngramJaccard(df: DataFrame, textCol: String, idCol: String,
                   n: Int = 5, threshold: Double = 0.6): DataFrame = {
    val sh = shingleSet(df, textCol, idCol, n)
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("cnt"))
    val inter = sh.select(col("id").as("id_a"), col("tok"))
      .join(sh.select(col("id").as("id_b"), col("tok")), Seq("tok"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnsRenamed(Map("id" -> "id_a", "cnt" -> "n_a")), Seq("id_a"))
      .join(sizes.withColumnsRenamed(Map("id" -> "id_b", "cnt" -> "n_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        (col("inter").cast("double") / (col("n_a") + col("n_b") - col("inter"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }
}
