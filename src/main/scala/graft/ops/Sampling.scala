package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.util.Hashing

/** Deterministic sampling for training-data curation — the data-mixing
  * step that weights strata (languages, sources, quality bands)
  * differently.
  *
  * Hash-threshold Bernoulli instead of `df.sample`: the keep decision
  * is a pure function of (salt, id), so it is reproducible across
  * runs, engines (DuckDB oracle replays it bit-for-bit), partitionings
  * and cluster sizes — none of which hold for RNG-based sampling. One
  * narrow filter, no shuffle; at 100 TB it fuses into the scan.
  */
object Sampling {

  private val BUCKETS = 10000L

  /** keep ⇔ hash(salt:id) mod 10000 < rate·10000 */
  def keepExpr(idCol: Column, rate: Double, salt: String): Column =
    pmod(Hashing.portableHash64(concat(lit(salt + ":"), idCol.cast("string"))),
      lit(BUCKETS)) < lit((rate * BUCKETS).toLong)

  /** Uniform deterministic sample. */
  def uniform(df: DataFrame, idCol: String, rate: Double,
              salt: String = "graft"): DataFrame =
    df.filter(keepExpr(col(idCol), rate, salt))

  /** Per-stratum rates (data mixing). Strata absent from `rates` use
    * `defaultRate`.
    */
  def stratified(df: DataFrame, stratumCol: String, idCol: String,
                 rates: Map[String, Double], defaultRate: Double,
                 salt: String = "graft"): DataFrame = {
    val rateCol = rates.foldLeft(lit(defaultRate)) { case (acc, (stratum, r)) =>
      when(col(stratumCol) === stratum, lit(r)).otherwise(acc)
    }
    df.filter(
      pmod(Hashing.portableHash64(concat(lit(salt + ":"), col(idCol).cast("string"))),
        lit(BUCKETS)) < (rateCol * BUCKETS).cast("long"))
  }

  /** Mixture sampling to a per-stratum TOKEN budget — the actual
    * data-mixing primitive: "at most B_s tokens of stratum s", with
    * the sampling rate derived from the corpus itself
    * (rate_s = min(1, B_s / total_tokens_s)) rather than hand-tuned.
    *
    * Two phases, both scale-flat: ONE partial-aggregatable groupBy
    * computes per-stratum token totals (|strata| rows), which broadcast
    * back onto the scan; the keep decision is then the same
    * deterministic hash threshold as [[stratified]] — reproducible
    * across runs/engines/partitionings, and the big side never
    * shuffles. The realized token count concentrates tightly around
    * the budget (Bernoulli over docs); pipelines wanting an exact cut
    * sort-and-prefix within the ~B_s-token sample, which is then tiny.
    *
    * `tokensCol` is any per-row weight expression (whitespace tokens,
    * BPE counts, chars).
    */
  def tokenBudget(df: DataFrame, stratumCol: String, idCol: String,
                  tokensCol: Column, budgets: Map[String, Long],
                  defaultBudget: Long, salt: String = "graft"): DataFrame = {
    val weighted = df.withColumn("__nt", tokensCol.cast("long"))
    val budgetCol = budgets.foldLeft(lit(defaultBudget)) { case (acc, (s, b)) =>
      when(col(stratumCol) === s, lit(b)).otherwise(acc)
    }
    val rates = weighted.groupBy(col(stratumCol))
      .agg(sum(col("__nt")).as("__tot"))
      .select(col(stratumCol),
        least(lit(1.0), budgetCol.cast("double") / col("__tot").cast("double"))
          .as("__rate"))
    weighted.join(broadcast(rates), Seq(stratumCol))
      .filter(
        pmod(Hashing.portableHash64(concat(lit(salt + ":"), col(idCol).cast("string"))),
          lit(BUCKETS)) < (col("__rate") * BUCKETS).cast("long"))
      .drop("__rate", "__tot")
      .withColumnRenamed("__nt", "n_tokens")
  }

  /** Mixture sampling to target PROPORTIONS — "make the output
    * 50% src0, 30% src1, 10% everything else, totalling ~B tokens".
    * This is the final data-mixing step of a training run (The Pile /
    * LLaMA-style mixture weights), and differs from [[tokenBudget]]
    * in that per-stratum budgets are DERIVED: budget_s =
    * w_s / Σw · B, with Σw taken over the strata actually present —
    * so the weights self-normalize and adding a stratum rescales the
    * rest instead of silently overshooting the total.
    *
    * Weights are integer "parts" on purpose: Σw is then an exact
    * long (no float-summation order sensitivity across engines or
    * partitionings), and every rate is one fixed chain of double
    * ops — w·B / Σw / tokens_s — that DuckDB replays bit-for-bit.
    *
    * Scale shape: one partial-aggregatable groupBy producing |strata|
    * rows, a single-row exact Σw folded in via a broadcast cross
    * join, the rate table broadcast back onto the scan, then the same
    * deterministic hash-threshold keep as [[stratified]] — the big
    * side never shuffles. Strata capped at rate 1.0 (can't upsample
    * by filtering) contribute their full token mass; callers needing
    * true upsampling union repeated hash-disjoint samples.
    */
  def mixture(df: DataFrame, stratumCol: String, idCol: String,
              tokensCol: Column, weights: Map[String, Long],
              defaultWeight: Long, totalBudget: Long,
              salt: String = "graft"): DataFrame = {
    val weighted = df.withColumn("__nt", tokensCol.cast("long"))
    val wCol = weights.foldLeft(lit(defaultWeight)) { case (acc, (s, w)) =>
      when(col(stratumCol) === s, lit(w)).otherwise(acc)
    }
    val totals = weighted.groupBy(col(stratumCol))
      .agg(sum(col("__nt")).as("__tot"))
      .withColumn("__w", wCol)
    val sumW = totals.agg(sum(col("__w")).as("__sw"))
    val rates = totals.crossJoin(broadcast(sumW))
      .select(col(stratumCol),
        least(lit(1.0),
          col("__w").cast("double") * lit(totalBudget.toDouble)
            / col("__sw").cast("double") / col("__tot").cast("double"))
          .as("__rate"))
    weighted.join(broadcast(rates), Seq(stratumCol))
      .filter(
        pmod(Hashing.portableHash64(concat(lit(salt + ":"), col(idCol).cast("string"))),
          lit(BUCKETS)) < (col("__rate") * BUCKETS).cast("long"))
      .drop("__rate")
      .withColumnRenamed("__nt", "n_tokens")
  }

  /** Mixture EPOCH planning — the scheduling REPORT behind [[mixture]]
    * (which samples DOWN): given target weights and a total token
    * budget, each stratum's natural token mass, budgeted target, and
    * repeat factor `epochs_ppm = target·10⁶ div natural`. A value
    * above 10⁶ means the stratum must REPEAT to meet its share — the
    * quantity scaling-law practice bounds (~4 epochs before repeated
    * data stops helping, Muennighoff et al. 2023), so strata tripping
    * `maxEpochsPpm` flag `over_cap`: the mixture wants more of them
    * than exists, and the planner should rebalance rather than loop a
    * small source dozens of times.
    *
    * All integer arithmetic (exact floor quotients), one partial-agg
    * pass over the corpus, |strata| rows out; the weight-sum folds via
    * a broadcast single-row aggregate. Empty strata (0 natural tokens)
    * report epochs_ppm = −1: an infinite repeat factor is a config
    * error, not a big number.
    */
  def epochPlan(df: DataFrame, stratumCol: String, tokensCol: Column,
                weights: Map[String, Long], defaultWeight: Long,
                totalBudget: Long, maxEpochsPpm: Long = 4000000L): DataFrame = {
    require(totalBudget > 0, "totalBudget must be positive")
    val wCol = weights.foldLeft(lit(defaultWeight)) { case (acc, (s, w)) =>
      when(col(stratumCol) === s, lit(w)).otherwise(acc)
    }
    val totals = df.withColumn("__nt", tokensCol.cast("long"))
      .groupBy(col(stratumCol))
      .agg(count(lit(1)).as("n_docs"), sum(col("__nt")).as("natural_tokens"))
      .withColumn("__w", wCol)
    val sumW = totals.agg(sum(col("__w")).as("__sw"))
    totals.crossJoin(broadcast(sumW))
      .withColumn("target_tokens",
        expr(s"${totalBudget}L * __w div __sw"))
      .withColumn("epochs_ppm",
        when(col("natural_tokens") > 0,
          expr("target_tokens * 1000000L div natural_tokens"))
          .otherwise(lit(-1L)))
      .withColumn("over_cap",
        (col("epochs_ppm") > maxEpochsPpm || col("epochs_ppm") === -1L)
          .cast("int"))
      .select(col(stratumCol), col("n_docs"), col("natural_tokens"),
        col("target_tokens"), col("epochs_ppm"), col("over_cap"))
  }

  /** Temperature-scaled mixture sampling (the multilingual/multi-
    * source rebalance rule: p_i ∝ share_i^(1/T), Conneau & Lample's
    * exponent-smoothed sampling) — [[mixture]] with weights DERIVED
    * from the corpus instead of configured: T = 1 reproduces natural
    * proportions, T → ∞ approaches uniform, the standard T ∈ [2, 5]
    * band upsamples low-resource strata. One totals aggregate
    * (|strata| rows) → quantized micro-weights → per-stratum rates →
    * the same deterministic hash-threshold keep as every sampler
    * (big side never shuffles).
    *
    * Engine-exactness: weights quantize to round(·10⁶) integers so
    * the rate chain is exact-long-over-double like [[mixture]]'s. At
    * T = 2 the weight is `sqrt` — correctly rounded by IEEE-754 on
    * BOTH engines, so the gate is exact by construction; other T go
    * through `pow`, where cross-libm last-ulp differences can flip a
    * micro-weight's rounding on adversarial shares (the ln-quantize
    * caveat of C11q, measured-zero in practice).
    */
  def temperatureMixture(df: DataFrame, stratumCol: String, idCol: String,
                         tokensCol: Column, temperature: Double,
                         totalBudget: Long,
                         salt: String = "graft"): DataFrame = {
    require(temperature >= 1.0, s"temperature must be >= 1, got $temperature")
    val weighted = df.withColumn("__nt", tokensCol.cast("long"))
    val totals = weighted.groupBy(col(stratumCol))
      .agg(sum(col("__nt")).as("__tot"))
    val gtot = totals.agg(sum(col("__tot")).as("__g"))
    val share = col("__tot").cast("double") / col("__g").cast("double")
    val w = if (temperature == 2.0) sqrt(share)
      else pow(share, 1.0 / temperature)
    val wq = totals.crossJoin(broadcast(gtot))
      .withColumn("__wq", round(w * lit(1e6)).cast("long"))
    val sumW = wq.agg(sum(col("__wq")).as("__sw"))
    val rates = wq.crossJoin(broadcast(sumW))
      .select(col(stratumCol),
        least(lit(1.0),
          col("__wq").cast("double") * lit(totalBudget.toDouble)
            / col("__sw").cast("double") / col("__tot").cast("double"))
          .as("__rate"))
    weighted.join(broadcast(rates), Seq(stratumCol))
      .filter(
        pmod(Hashing.portableHash64(concat(lit(salt + ":"), col(idCol).cast("string"))),
          lit(BUCKETS)) < (col("__rate") * BUCKETS).cast("long"))
      .drop("__rate")
      .withColumnRenamed("__nt", "n_tokens")
  }

  /** DSIR-style importance scoring (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): hashed n-gram
    * bag-of-words models of a TARGET slice (the data you want more
    * of) and the RAW rest, per-document importance weight
    * w(d) = Σ_feat log p_target(f)/p_raw(f) — the standard
    * domain-selection primitive (used to pick Pile-CC-like slices of
    * Common Crawl). Returns (idCol, score) for every NON-target doc;
    * callers keep score > 0 ("more target-like than raw-like") or
    * top-N.
    *
    * Determinism/oracle design: features are unigrams + bigrams with
    * multiplicity, hashed into `m` buckets via the portable md5 hash;
    * per-bucket add-one-smoothed log-likelihood-ratio weights are
    * QUANTIZED to integers (round(ln·10⁶)) so per-doc scores are
    * exact long sums — order-independent across partitionings and
    * engines. The one ln() per bucket is computed identically from
    * exact-long products (< 2⁵³, so the IEEE chain matches DuckDB;
    * measured: 0/20000 quantized-weight mismatches, raw ln agrees to
    * ≤ 1 ulp).
    *
    * Scale shape: ONE partial-aggregatable feature-count shuffle
    * (bounded at m live buckets by the hash), a 2-row totals
    * broadcast, the ≤ m-row weight table broadcast back onto the
    * feature stream, and one exact-sum groupBy per doc — the corpus
    * never shuffles twice and nothing driver-side grows with the
    * data.
    */
  def importance(df: DataFrame, textCol: String, idCol: String,
                 isTarget: Column, m: Int = 1024): DataFrame = {
    val ws = split(graft.ops.TextAnalysis.normalize(col(textCol)), " ")
    val base = df.select(col(idCol).as("__id"), isTarget.as("__t"), ws.as("__ws"))
    val uni = base.select(col("__id"), col("__t"), explode(col("__ws")).as("feat"))
    val bi = base.select(col("__id"), col("__t"),
      explode(when(size(col("__ws")) >= 2,
        transform(sequence(lit(1), size(col("__ws")) - 1),
          i => concat(element_at(col("__ws"), i), lit(" "),
            element_at(col("__ws"), i + 1))))
        .otherwise(array().cast("array<string>"))).as("feat"))
    val fb = uni.unionByName(bi)
      .select(col("__id"), col("__t"),
        pmod(Hashing.portableHash64(col("feat")), lit(m.toLong)).as("f"))
      // feeds BOTH the bucket counts and the scoring join: cache so
      // the feature explode runs once within the action
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val counts = fb.groupBy("f").agg(
      sum(when(col("__t"), 1L).otherwise(0L)).as("ct"),
      sum(when(!col("__t"), 1L).otherwise(0L)).as("cq"))
    val tot = counts.agg(sum("ct").as("bigT"), sum("cq").as("bigQ"))
    val weights = counts.crossJoin(broadcast(tot)).select(col("f"),
      round(log(
        (col("ct") + 1).cast("double") * (col("bigQ") + m).cast("double")
          / ((col("cq") + 1).cast("double") * (col("bigT") + m).cast("double")))
        * 1e6).cast("long").as("wt"))
    fb.filter(!col("__t"))
      .join(broadcast(weights), Seq("f"))
      .groupBy(col("__id"))
      .agg(sum(col("wt")).as("score"))
      .select(col("__id").as(idCol), col("score"))
  }

  /** Deterministic training-shard assignment — the last step before a
    * corpus is written out for a training run: every doc gets a
    * (shard, pos) address that is a pure function of (salt, id), so
    * the global example order is a reproducible pseudo-random shuffle.
    * Re-running on the same corpus (or on a different cluster size)
    * yields byte-identical shards; changing `salt` reshuffles — the
    * per-epoch reshuffle knob.
    *
    * Shape: shard = hash mod S routes uniformly; pos = rank of the
    * hash WITHIN the shard (ties broken by id for full determinism).
    * One hash-partitioned exchange on shard + an in-partition sort —
    * exactly the physical layout a shard writer needs anyway
    * (`.repartition(S, shard).sortWithinPartitions` is this plan), so
    * the ordering costs nothing extra at 100 TB. No global sort, no
    * driver state; within-shard sort is bounded by corpus/S.
    */
  def shards(df: DataFrame, idCol: String, numShards: Int,
             salt: String = "graft"): DataFrame = {
    require(numShards >= 1, s"numShards must be >= 1, got $numShards")
    import org.apache.spark.sql.expressions.Window
    val key = Hashing.portableHash64(
      concat(lit(salt + ":shard:"), col(idCol).cast("string")))
    val w = Window.partitionBy(col("shard")).orderBy(col("__k"), col(idCol))
    df.withColumn("__k", key)
      .withColumn("shard", pmod(col("__k"), lit(numShards.toLong)))
      .withColumn("pos", row_number().over(w).cast("long") - 1L)
      .drop("__k")
  }

  /** Per-shard export manifest — the integrity record a training-data
    * hand-off ships next to its shards (the corpus-export sibling of
    * the CDC range hash): doc count, char total, id range, and an
    * order-independent content checksum per shard, so the consumer of
    * a copied/moved/re-materialized export can verify every shard
    * without re-reading the producer's copy — re-run the manifest,
    * compare rows.
    *
    * The checksum is bit_xor over per-doc fingerprints
    * hash(id ‖ md5(normalized text)) — XOR is commutative/associative
    * (partition-order independent, partial-aggregatable, no overflow
    * semantics to match across engines), and binding the doc id into
    * the fingerprint keeps exact-duplicate documents from cancelling
    * pairwise. Any flipped byte, dropped doc, or id remap changes the
    * shard's checksum.
    *
    * Shape: shard routing is [[shards]]' hash mod S; ONE
    * partial-aggregatable groupBy to |shards| rows. No window — the
    * manifest doesn't need positions.
    */
  def shardManifest(df: DataFrame, textCol: String, idCol: String,
                    numShards: Int, salt: String = "graft",
                    extraKeys: Seq[String] = Nil): DataFrame = {
    require(numShards >= 1, s"numShards must be >= 1, got $numShards")
    val key = Hashing.portableHash64(
      concat(lit(salt + ":shard:"), col(idCol).cast("string")))
    val fp = Hashing.portableHash64(concat(col(idCol).cast("string"), lit(":"),
      md5(TextAnalysis.normalize(col(textCol)))))
    df.select(extraKeys.map(col) ++ Seq(
        pmod(key, lit(numShards.toLong)).as("shard"),
        col(idCol).as("id"), length(col(textCol)).cast("long").as("nc"),
        fp.as("fp")): _*)
      // extraKeys first: a release manifest addresses (split, shard)
      .groupBy((extraKeys :+ "shard").map(col): _*)
      .agg(count(lit(1)).as("n_docs"), sum(col("nc")).as("n_chars"),
        min(col("id")).as("min_id"), max(col("id")).as("max_id"),
        bit_xor(col("fp")).as("content_xor"))
  }

  /** Shard rebalance plan — the layout-maintenance step AFTER a
    * manifest shows skew (hot shards from a bad key, growth since the
    * original split, a merged corpus): which shard ships how much
    * weight to which, equalizing to ±1 of the exact mean with the
    * MINIMUM total weight moved. The classic cumulative-interval
    * matching: donors (surplus) and receivers (deficit) each lay
    * their deltas end-to-end on one number line — in shard-id order,
    * so the plan is deterministic — and every overlap of a donor
    * interval with a receiver interval is one transfer of the overlap
    * length. Total moved = Σ surplus (no plan moves less; anything
    * crossing the mean must move), transfer count ≤ donors +
    * receivers − 1.
    *
    * Targets: shards ranked by id; the first (total mod n) get
    * ⌈mean⌉, the rest ⌊mean⌋ — exact conservation, no fractional
    * bytes. Pure BIGINT end-to-end.
    *
    * Scale shape: the plan works on the SHARD-grain manifest (|shards|
    * rows, never data), so the rank and cumulative folds are the
    * pplBucket triangular broadcast self-join — no partition-less
    * window — and the donor×receiver overlap join is bounded by the
    * transfer count. Executing the plan is per-move data work this
    * planner never touches (the A39 compaction-plan convention).
    */
  def rebalancePlan(manifest: DataFrame, shardCol: String,
                    weightCol: String): DataFrame = {
    val m = manifest.select(col(shardCol).cast("long").as("s"),
      col(weightCol).cast("long").as("w"))
    val tot = m.agg(sum(col("w")).as("total"), count(lit(1)).as("n"))
    val ranked = m.as("a")
      .join(broadcast(m.as("b")), col("b.s") < col("a.s"), "left")
      .groupBy(col("a.s").as("s"), col("a.w").as("w"))
      .agg(count(col("b.s")).as("rank0"))
    val t = ranked.crossJoin(broadcast(tot))
      .select(col("s"), col("w"),
        (col("w") - expr("total div n")
          - when(col("rank0") < pmod(col("total"), col("n")), 1L)
            .otherwise(0L)).as("delta"))
    val donors = t.filter(col("delta") > 0L)
    val dcum = donors.as("a")
      .join(broadcast(donors.as("b")), col("b.s") < col("a.s"), "left")
      .groupBy(col("a.s").as("ds"), col("a.delta").as("dd"))
      .agg(coalesce(sum(col("b.delta")), lit(0L)).as("dstart"))
    val recv = t.filter(col("delta") < 0L)
      .select(col("s"), (-col("delta")).as("need"))
    val rcum = recv.as("a")
      .join(broadcast(recv.as("b")), col("b.s") < col("a.s"), "left")
      .groupBy(col("a.s").as("rs"), col("a.need").as("rn"))
      .agg(coalesce(sum(col("b.need")), lit(0L)).as("rstart"))
    dcum.join(rcum,
        col("dstart") < col("rstart") + col("rn")
          && col("rstart") < col("dstart") + col("dd"))
      .select(col("ds").as("from_shard"), col("rs").as("to_shard"),
        (least(col("dstart") + col("dd"), col("rstart") + col("rn"))
          - greatest(col("dstart"), col("rstart"))).as("moved"))
  }

  /** Per-shard weight sidecar persisted as `shard=<n>/_WEIGHT` (an
    * underscore name, so Spark's parquet reader skips it): the shard's
    * total weight, max single-doc weight, and doc count, stamped with
    * BOTH the identity of the data it was computed FROM — a
    * listing-only fingerprint of the data files: (count, byteSum)
    * plus a hash over every file's (name, length, mtime), so an
    * equal-size in-place rewrite of a shard still invalidates — and
    * the identity of the definition it was computed UNDER (a hash of
    * the weight expression's SQL and the id column), so a later pass
    * with a different weightExpr rescans instead of silently reusing
    * totals in the old units. A sidecar failing either check is
    * stale and is rescanned, never trusted. */
  private[graft] case class ShardWeight(w: Long, maxw: Long, n: Long,
                                        files: Long, bytes: Long,
                                        fp: Long, wid: Long)

  /** Metadata fingerprint of a shard dir's DATA files (skips `_`/`.`
    * names — sidecars, markers, checksums): (count, total bytes,
    * hash of sorted per-file name:length:mtime entries). Listing
    * only; no file is opened. */
  private def shardFingerprint(f: org.apache.hadoop.fs.FileSystem,
                               dir: org.apache.hadoop.fs.Path): (Long, Long, Long) = {
    val data = f.listStatus(dir).filter { s =>
      val nm = s.getPath.getName
      s.isFile && !nm.startsWith("_") && !nm.startsWith(".")
    }
    val listing = data
      .map(s => s"${s.getPath.getName}:${s.getLen}:${s.getModificationTime}")
      .sorted.mkString("\n")
    (data.length.toLong, data.map(_.getLen).sum,
      graft.util.Hashing.portableHash64Const(listing))
  }

  /** Identity of the weight DEFINITION a sidecar's totals are valid
    * under: the weight expression's canonical string form plus the id
    * column name, hashed. Totals in different weight units must never
    * mix. */
  private def weightDefId(weightExpr: Column, idCol: String): Long =
    graft.util.Hashing.portableHash64Const(s"${weightExpr.toString}|$idCol")

  private[graft] def readShardWeight(spark: org.apache.spark.sql.SparkSession,
                                     dir: String): Option[ShardWeight] =
    graft.util.Fs.readSmallText(spark, dir, "_WEIGHT").flatMap { s =>
      try {
        val m = s.split("\\s+").map(_.split("=", 2))
          .collect { case Array(k, v) => k -> v.toLong }.toMap
        Some(ShardWeight(m("w"), m("maxw"), m("n"), m("files"), m("bytes"),
          m("fp"), m("wid")))
      } catch { case scala.util.control.NonFatal(_) => None }
    }

  private[graft] def writeShardWeight(spark: org.apache.spark.sql.SparkSession,
                                      dir: String, e: ShardWeight): Unit =
    graft.util.Fs.writeSmallText(spark, dir, "_WEIGHT",
      s"w=${e.w} maxw=${e.maxw} n=${e.n} files=${e.files} bytes=${e.bytes} " +
        s"fp=${e.fp} wid=${e.wid}")

  /** Test-injectable failpoint for [[rebalanceExecute]] (the
    * Retention/Compaction/IVF-vacuum crash-drill discipline): invoked
    * at `staged`, `before-commit`, `committed`,
    * `before-swap:<n>` / `swapped:<n>` per shard, and
    * `before-cleanup`. Production leaves the no-op. */
  private[graft] var rbFailpoint: String => Unit = _ => ()

  /** EXECUTE a [[rebalancePlan]] against a sharded corpus store laid
    * out as `root/shard=<n>/…` (one parquet dataset per shard) — the
    * plan/executor parity step (the A39→A40 compaction convention):
    * the planner computes who ships how much, this runs it.
    *
    * Which docs move is a pure function of the store: each donor
    * orders its docs by (portable hash of "rb:"+id, id) — a
    * deterministic pseudo-random shuffle, so the exported prefix is
    * an unbiased sample, not "the oldest docs" — lays their weights
    * end-to-end, and the doc whose cumulative start falls inside
    * receiver r's interval of the donor's plan span moves to r. Doc
    * granularity means boundaries overshoot by less than one maximum
    * doc weight, so the post-state is balanced to ±maxDocWeight (and
    * the executor is a NO-OP when every shard already sits within
    * maxDocWeight of its target — which makes a re-run after a
    * completed pass converge instead of ping-ponging sub-doc
    * residues).
    *
    * Durability discipline (single-writer offline slot): all affected
    * shards' new contents stage under `root/__rb_stage/shard=<n>`,
    * then a `_COMMIT` marker lands, then each shard swaps (old dir →
    * `__rb_trash`, staged dir in), then stage+trash purge. Crash
    * windows, healed by [[recoverRebalance]] (runs first on every
    * invocation):
    *  - pre-commit (staging partial or complete, no marker): the
    *    stage is discarded — originals untouched, the re-run replans
    *    from scratch.
    *  - post-commit (marker present, swaps partial): the swaps
    *    complete from the stage — per shard, idempotently (an
    *    already-swapped shard is left alone; a half-swapped shard —
    *    old in trash, staged not yet in — moves the staged dir in).
    *  - post-swap (cleanup partial): stage remnants and trash purge.
    *
    * Scale shape: the manifest, the no-op check, and the plan are
    * METADATA-grain — per-shard totals come from a tiny `_WEIGHT`
    * sidecar inside each `shard=<n>` dir (Spark ignores
    * underscore-prefixed files), validated against a listing-only
    * (fileCount, byteSum) fingerprint of the data files so a sidecar
    * left by anything other than the current bytes is rejected, not
    * trusted. Only a shard with a missing/stale sidecar pays a
    * (one-off, that-shard-only) bootstrap scan, which rewrites its
    * sidecar — so a steady-state pass, and in particular a NO-OP
    * pass, opens ZERO data files. Data reads start only once a plan
    * exists and touch AFFECTED shards only: donors for move
    * selection (the one step that genuinely needs per-doc weights)
    * plus receivers for the staged union rewrite; every staged dir
    * gets an exact fresh sidecar before commit so the swap keeps the
    * store metadata-grain for the next pass. Untouched shards are
    * never opened and never rewritten.
    *
    * Id discipline: a donor's kept set is "its docs minus its moved
    * ids" (a donor-scoped anti-join), so `idCol` must be non-NULL and
    * unique WITHIN each donor — NULL never equals itself (the doc
    * would be kept AND shipped: duplication) and a duplicate would
    * drop an innocent sibling of a moved doc (loss). The executor
    * validates both over the donors it already scans and aborts
    * loudly before any rewrite.
    *
    * @return (docs moved, weight moved) — (0, 0) for a no-op pass
    */
  def rebalanceExecute(spark: org.apache.spark.sql.SparkSession,
                       root: String, idCol: String = "doc_id",
                       weightExpr: Column = length(col("text")).cast("long"))
      : (Long, Long) = {
    import org.apache.hadoop.fs.Path
    import graft.util.Fs
    val f = Fs.fs(spark, root)
    recoverRebalance(spark, root)
    val PFX = "shard="
    val shardIds =
      if (!f.exists(new Path(root))) Seq.empty[Long]
      else f.listStatus(new Path(root)).map(_.getPath.getName)
        .filter(_.startsWith(PFX)).map(_.stripPrefix(PFX).toLong).toSeq.sorted
    if (shardIds.size < 2) return (0L, 0L)
    // MANIFEST — metadata-grain: fingerprint-checked sidecar totals;
    // only a missing/stale sidecar bootstraps from a scan of THAT
    // shard (and rewrites it). Steady-state opens zero data files.
    val wid = weightDefId(weightExpr, idCol)
    val weights: Seq[(Long, ShardWeight)] = shardIds.map { n =>
      val dir = s"$root/$PFX$n"
      val fp = shardFingerprint(f, new Path(dir))
      val e = readShardWeight(spark, dir)
        .filter(sw => sw.files == fp._1 && sw.bytes == fp._2 &&
          sw.fp == fp._3 && sw.wid == wid)
        .getOrElse {
          val r = spark.read.parquet(dir).select(weightExpr.as("__w"))
            .agg(sum(col("__w")), max(col("__w")), count(lit(1))).first()
          val sw = ShardWeight(
            if (r.isNullAt(0)) 0L else r.getLong(0),
            if (r.isNullAt(1)) 0L else r.getLong(1),
            r.getLong(2), fp._1, fp._2, fp._3, wid)
          writeShardWeight(spark, dir, sw)
          sw
        }
      (n, e)
    }
    val maxW = weights.map(_._2.maxw).max
    val target = weights.map(_._2.w).sum / weights.size
    // no-op tolerance: within one doc weight of target everywhere,
    // moving anything would just shuttle sub-doc residues forever
    if (weights.map(e => math.abs(e._2.w - target)).max <= maxW)
      return (0L, 0L)
    val manifest = spark.createDataFrame(
        weights.map { case (n, e) => (n, e.w) }).toDF("__shard", "w")
    val plan = rebalancePlan(manifest, "__shard", "w")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    if (plan.isEmpty) return (0L, 0L)
    // per-donor receiver boundaries in interval order (= to_shard-id
    // order, how the plan's cumulative matching laid them out)
    val bounds = plan.groupBy(_._1).toSeq.flatMap { case (from, moves) =>
      var acc = 0L
      moves.sortBy(_._2).map { case (_, to, amt) =>
        val lo = acc; acc += amt; (from, to, lo, acc)
      }
    }
    val boundsDf = broadcast(spark.createDataFrame(bounds)
      .toDF("__from", "__to", "__lo", "__hi"))
    val donorSet = plan.map(_._1).toSet
    // DATA reads start here and touch AFFECTED shards only. Donors
    // first: per-doc weights for move selection, plus the loud id
    // guard (see the id-discipline contract above).
    val donorsRaw = donorSet.toSeq.sorted.map { n =>
      spark.read.parquet(s"$root/$PFX$n").withColumn("__shard", lit(n))
    }.reduce(_ unionByName _)
    val dataCols = donorsRaw.columns.filterNot(_ == "__shard").map(col).toIndexedSeq
    val weighted = graft.util.Lineage.truncate(
      donorsRaw.withColumn("__w", weightExpr))
    val badIds = weighted.groupBy("__shard")
      .agg(count(lit(1)).as("c"), count(col(idCol)).as("cnn"),
        countDistinct(col(idCol)).as("cd"))
      .filter(col("c") =!= col("cnn") || col("c") =!= col("cd"))
      .collect()
    if (badIds.nonEmpty)
      sys.error(s"rebalanceExecute: NULL or duplicate '$idCol' in donor " +
        "shard(s) — refusing to rewrite: " +
        badIds.map(r => s"shard=${r.getLong(0)} rows=${r.getLong(1)} " +
          s"nonNull=${r.getLong(2)} distinct=${r.getLong(3)}").mkString("; "))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__shard"))
      .orderBy(graft.util.Hashing.portableHash64(
        concat(lit("rb:"), col(idCol).cast("string"))), col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val donors = graft.util.Lineage.truncate(
      weighted.withColumn("__c", coalesce(sum(col("__w")).over(w), lit(0L))))
    val movedDf = graft.util.Lineage.truncate(
      donors.join(boundsDf, col("__shard") === col("__from")
          && col("__c") >= col("__lo") && col("__c") < col("__hi"))
        .withColumn("__dest", col("__to"))
        .drop("__from", "__to", "__lo", "__hi"))
    val movedN = movedDf.count()
    val movedW = if (movedN == 0) 0L
      else movedDf.agg(sum(col("__w"))).first().getLong(0)
    if (movedN == 0) return (0L, 0L)
    // affected shards: donors lose their moved docs, receivers gain
    val receiverSet = plan.map(_._2).toSet
    val stage = new Path(root, "__rb_stage")
    f.mkdirs(stage)
    donorSet.toSeq.sorted.foreach { n =>
      // anti-join scoped to THIS donor's moved ids — an id that also
      // appears in another shard's moved set must not evict its
      // innocent local namesake
      donors.filter(col("__shard") === n)
        .join(movedDf.filter(col("__shard") === n)
            .select(col(idCol).as("__mid")),
          col(idCol) === col("__mid"), "left_anti")
        .select(dataCols: _*)
        .write.mode("overwrite").parquet(s"$root/__rb_stage/$PFX$n")
    }
    receiverSet.toSeq.sorted.foreach { n =>
      val incoming = movedDf.filter(col("__dest") === n).select(dataCols: _*)
      val base =
        if (donorSet(n)) sys.error(s"shard $n cannot donate and receive")
        else spark.read.parquet(s"$root/$PFX$n")
      base.unionByName(incoming)
        .write.mode("overwrite").parquet(s"$root/__rb_stage/$PFX$n")
    }
    // exact fresh sidecars for every staged dir, so the swap keeps
    // the store metadata-grain for the next pass (affected-shard-
    // grain re-read of the staged bytes just written)
    (donorSet ++ receiverSet).toSeq.sorted.foreach { n =>
      val dir = s"$root/__rb_stage/$PFX$n"
      val r = spark.read.parquet(dir).select(weightExpr.as("__w"))
        .agg(sum(col("__w")), max(col("__w")), count(lit(1))).first()
      val fp = shardFingerprint(f, new Path(dir))
      writeShardWeight(spark, dir, ShardWeight(
        if (r.isNullAt(0)) 0L else r.getLong(0),
        if (r.isNullAt(1)) 0L else r.getLong(1),
        r.getLong(2), fp._1, fp._2, fp._3, wid))
    }
    rbFailpoint("staged")
    rbFailpoint("before-commit")
    val commit = new Path(stage, "_COMMIT")
    f.create(commit, true).close()
    rbFailpoint("committed")
    swapStaged(spark, root)
    (movedN, movedW)
  }

  /** Complete the post-commit swaps and purge — shared by the happy
    * path and recovery. Idempotent per shard. */
  private def swapStaged(spark: org.apache.spark.sql.SparkSession,
                         root: String): Unit = {
    import org.apache.hadoop.fs.Path
    val f = graft.util.Fs.fs(spark, root)
    val stage = new Path(root, "__rb_stage")
    val trash = new Path(root, "__rb_trash")
    f.mkdirs(trash)
    f.listStatus(stage).map(_.getPath.getName)
      .filter(_.startsWith("shard=")).sorted.foreach { d =>
        rbFailpoint(s"before-swap:$d")
        val live = new Path(root, d)
        if (f.exists(live) &&
            !f.rename(live, new Path(trash, d)))
          throw new java.io.IOException(s"rebalance trash-move of $d failed")
        if (!f.rename(new Path(stage, d), live))
          throw new java.io.IOException(s"rebalance swap-in of $d failed")
        rbFailpoint(s"swapped:$d")
      }
    rbFailpoint("before-cleanup")
    f.delete(stage, true)
    f.delete(trash, true)
  }

  /** Heal an interrupted [[rebalanceExecute]] — see its crash-window
    * contract. @return true if anything was repaired. */
  def recoverRebalance(spark: org.apache.spark.sql.SparkSession,
                       root: String): Boolean = {
    import org.apache.hadoop.fs.Path
    val f = graft.util.Fs.fs(spark, root)
    val stage = new Path(root, "__rb_stage")
    val trash = new Path(root, "__rb_trash")
    if (f.exists(stage)) {
      if (f.exists(new Path(stage, "_COMMIT"))) swapStaged(spark, root)
      else { f.delete(stage, true); f.delete(trash, true) }
      true
    } else if (f.exists(trash)) { f.delete(trash, true); true }
    else false
  }

  /** Curriculum ordering — the training-order counterpart of
    * [[shards]]: every doc gets a (band, pos) address where `band` is
    * its quality bucket (integer micro mean-token-length, the
    * quality_band score, floor-divided into `bandWidthMicro` buckets
    * and capped at `maxBand`) and `pos` is a deterministic hash
    * shuffle position WITHIN the band. A curriculum run visits bands
    * in order (easy → hard or the reverse — the band index is the
    * knob) while each band stays a reproducible pseudo-random
    * shuffle; changing `salt` reshuffles within bands without moving
    * any doc across bands.
    *
    * Integer-exact end-to-end: score = (chars·10⁶) div words, band =
    * min(maxBand, score div width), pos from a (hash, id) total
    * order — no doubles anywhere. Shape: per-row scoring fused into
    * the scan, ONE hash-partition exchange on the band + in-partition
    * sort — exactly the layout a banded shard writer needs anyway
    * (the [[shards]] argument). Bands are few and large; the
    * within-band sort is bounded by corpus/|bands| per partition —
    * at extreme corpus sizes sub-shard each band with [[shards]].
    */
  def curriculum(df: DataFrame, textCol: String, idCol: String,
                 bandWidthMicro: Long = 2000000L, maxBand: Int = 4,
                 salt: String = "graft"): DataFrame = {
    require(bandWidthMicro > 0, s"bandWidthMicro must be positive")
    require(maxBand >= 0, s"maxBand must be non-negative, got $maxBand")
    import org.apache.spark.sql.expressions.Window
    val n = TextAnalysis.normalize(col(textCol))
    val scored = df.select(col(idCol),
        (length(regexp_replace(n, " ", "")).cast("long") * 1000000L)
          .as("__cm"),
        size(split(n, " ")).cast("long").as("__nw"))
      .select(col(idCol), expr("__cm div __nw").as("score_micro"))
      .withColumn("band",
        least(lit(maxBand.toLong), expr(s"score_micro div $bandWidthMicro")))
      .withColumn("__k", Hashing.portableHash64(
        concat(lit(salt + ":curr:"), col(idCol).cast("string"))))
    val w = Window.partitionBy(col("band")).orderBy(col("__k"), col(idCol))
    scored
      .withColumn("pos", row_number().over(w).cast("long") - 1L)
      .select(col(idCol), col("band"), col("score_micro"), col("pos"))
  }

  /** Per-group document cap — the Common-Crawl per-domain cap: keep at
    * most `k` docs of each group (domain, source, site), chosen by
    * deterministic hash order so the kept subset is a reproducible
    * uniform sample of the group, not whichever rows a scan saw first.
    * The standard guard against a single domain (a wiki mirror, a
    * link farm) dominating the corpus no matter what the mixture
    * weights say — caps bite per-GROUP where [[mixture]] rates bite
    * per-STRATUM-in-aggregate.
    *
    * Shape: one hash-partition exchange on the group key + an
    * in-partition sort feeding `row_number` — the same
    * exchange-plus-sort the grouped writer downstream needs anyway.
    * Group count (domains) is large so partitions stay balanced; for
    * a pathological mega-group the uniform hash order admits a
    * two-phase refinement (pre-filter on a loose hash threshold
    * ≈ k/|group| before ranking) — not needed until a single group
    * outgrows a partition.
    */
  def groupCap(df: DataFrame, groupCol: String, idCol: String, k: Int,
               salt: String = "graft"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    import org.apache.spark.sql.expressions.Window
    val key = Hashing.portableHash64(
      concat(lit(salt + ":cap:"), col(idCol).cast("string")))
    val w = Window.partitionBy(col(groupCol)).orderBy(col("__k"), col(idCol))
    df.withColumn("__k", key)
      .withColumn("pos", row_number().over(w).cast("long") - 1L)
      .filter(col("pos") < k)
      .drop("__k")
  }

  /** WEIGHTED per-group sample without replacement — [[groupCap]]'s
    * quality-aware sibling: keep k docs per group with inclusion odds
    * proportional to a weight column (keep the well-scored docs of
    * each domain, not a uniform k). Deterministic A-ES (Efraimidis &
    * Spirakis 2006): each row gets the exponential key
    * e = −ln(u)/w with u ∈ (0,1] derived from the portable hash —
    * the k smallest keys per group ARE a weighted sample without
    * replacement, and the whole draw is a pure function of
    * (salt, id, w), reproducible across runs/engines/partitionings.
    *
    * Keys are quantized to micro-units (round(·10⁶)) with id
    * tiebreak, the same integer-total-order trick as the DSIR scores:
    * both engines rank identical longs instead of trusting float
    * comparison at the boundary (ln agrees to ≤ 1 ulp; a 1-ulp flip
    * survives round() only ON a .5 boundary — same accepted risk as
    * sample_importance).
    *
    * Shape: identical to [[groupCap]] — one group-key exchange + an
    * in-partition sort. Weights must be strictly positive.
    */
  def weightedGroupSample(df: DataFrame, groupCol: String, idCol: String,
                          weightCol: Column, k: Int,
                          salt: String = "graft"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    import org.apache.spark.sql.expressions.Window
    val h = Hashing.portableHash64(
      concat(lit(salt + ":wcap:"), col(idCol).cast("string")))
    // u = (h+1)/2^60 ∈ (0, 1]: dyadic, exactly representable, never 0
    val u = (h + lit(1L)).cast("double") / lit(math.pow(2.0, 60))
    val ekey = round(-log(u) / weightCol.cast("double") * 1e6).cast("long")
    val w = Window.partitionBy(col(groupCol)).orderBy(col("__e"), col(idCol))
    df.withColumn("__e", ekey)
      .withColumn("pos", row_number().over(w).cast("long") - 1L)
      .filter(col("pos") < k)
      .withColumnRenamed("__e", "ekey_micro")
  }

  /** Train/val/test split assignment + cross-split duplicate-leakage
    * audit — the eval-hygiene gate every training corpus needs: a
    * held-out set is only held out if no training document shares its
    * content, and a hash split alone cannot guarantee that (exact
    * copies land in different splits whenever their ids hash apart).
    *
    * Assignment is the deterministic hash threshold ([[keepExpr]]'s
    * convention): bucket = hash(salt:id) mod 10000, test < testPm ≤
    * val < testPm+valPm ≤ train — a pure per-row function of the id,
    * so membership is stable under corpus growth (new docs never move
    * old docs between splits, unlike modulo-on-row-number schemes).
    *
    * Leakage = documents whose normalized content hash appears in ≥ 2
    * distinct splits. The split vocabulary is FIXED (train/val/test),
    * so the whole audit is conditional sums — no join anywhere: ONE
    * partial-aggregatable groupBy collapses the corpus to per-hash
    * rows carrying a (count, chars) pair per split, a per-row flag
    * marks hashes spanning > 1 split, and a second tiny aggregate over
    * the |splits| exploded legs emits the report. The corpus is
    * scanned ONCE and shuffled once (on the content hash); the
    * join-back formulation would re-derive the corpus aggregate per
    * consumer. |splits| rows out.
    *
    * Returns one row per non-empty split: (split, n_docs, n_chars,
    * n_leak_docs) where n_leak_docs counts this split's members of
    * cross-split content groups — the docs a decontamination pass must
    * drop from train (or move) before the val/test numbers mean
    * anything.
    */
  /** The split-name column alone — a pure per-row function of
    * (salt, id), for pipelines annotating rows in place (the
    * Pipeline `split` stage; streaming-safe: a doc's split never
    * depends on what else is in the batch).
    */
  def splitAssign(idCol: Column, valPm: Long = 500L, testPm: Long = 100L,
                  salt: String = "split"): Column = {
    require(valPm + testPm < BUCKETS,
      s"val+test per-mille must leave room for train (got $valPm+$testPm)")
    val bucket = pmod(Hashing.portableHash64(
      concat(lit(salt + ":"), idCol.cast("string"))), lit(BUCKETS))
    when(bucket < testPm, lit("test"))
      .when(bucket < testPm + valPm, lit("val"))
      .otherwise(lit("train"))
  }

  def splitWithLeakage(df: DataFrame, textCol: String, idCol: String,
                       valPm: Long = 500L, testPm: Long = 100L,
                       salt: String = "split"): DataFrame = {
    // spread: the per-row normalize + whole-text md5 runs in the scan
    // stage, so a single-split input serializes the corpus onto one
    // core; no-op once the scan has >= cores splits (guide §2.5)
    val base = graft.util.Tables.spread(
        df.select(col(idCol), col(textCol)), col(idCol))
      .select(
        splitAssign(col(idCol), valPm, testPm, salt).as("split"),
        md5(TextAnalysis.normalize(col(textCol))).as("content_hash"),
        length(col(textCol)).cast("long").as("n_chars"))
    val names = Seq("test", "val", "train")
    val aggs = names.flatMap { s => Seq(
      sum(when(col("split") === s, 1L).otherwise(0L)).as(s"n_$s"),
      sum(when(col("split") === s, col("n_chars")).otherwise(0L)).as(s"c_$s"))
    }
    val perHash = base.groupBy("content_hash").agg(aggs.head, aggs.tail: _*)
    val nSplits = names.map(s => when(col(s"n_$s") > 0, 1).otherwise(0))
      .reduce(_ + _)
    val legs = perHash.withColumn("leaky", nSplits > 1)
      .select(explode(array(names.map(s => struct(
        lit(s).as("split"), col(s"n_$s").as("n"), col(s"c_$s").as("c"),
        when(col("leaky"), col(s"n_$s")).otherwise(lit(0L)).as("lk"))): _*))
        .as("r"))
      .filter(col("r.n") > 0)
    legs.groupBy(col("r.split").as("split")).agg(
      sum(col("r.n")).as("n_docs"), sum(col("r.c")).as("n_chars"),
      sum(col("r.lk")).as("n_leak_docs"))
  }
}
