package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{LongType, StringType}

/** Explicit skew-mitigation join strategies.
  *
  * At 100 TB the failure mode of a shuffled equi-join is not
  * throughput, it's STRAGGLERS: one reducer owning a heavy key runs
  * for hours while the other 999 executors idle. AQE's skew-join
  * split handles the sort-merge case adaptively, but two shapes still
  * need explicit help, and both are here:
  *
  *  - [[salted]] — split each heavy key across N reducers by salting
  *    (the classic fix when the small side is too big to broadcast
  *    but cheap to replicate N×).
  *  - [[bloomPruned]] — kill the shuffle volume itself: when a
  *    selective dimension filter means most fact rows have NO match,
  *    a Bloom filter of the surviving dim keys pruned map-side keeps
  *    the non-matching fact rows from ever crossing the wire.
  *
  * Pair with [[Profile.heavyHitters]]: profile first, then pick
  * broadcast < bloom < salt < AQE in roughly that order of preference.
  */
object SkewJoin {

  /** Salted inner/left-outer equi-join: every row of `big` gets a
    * deterministic salt in [0, nSalts) derived from hashing the FULL
    * row (so a heavy key's rows spread across salts), and `small` is
    * replicated once per salt value. The join key becomes
    * (key, salt), so one logical reducer per heavy key becomes
    * nSalts physical reducers.
    *
    * The result is row-identical to the plain join: each big row
    * holds exactly one salt and meets the one replica of its matching
    * small rows carrying that salt. Cost model: small side ships
    * nSalts× — worth it exactly when max-key frequency × row width on
    * the big side dwarfs |small| × nSalts.
    *
    * Join types: "inner" and "left_outer" (the replication argument
    * above breaks for right/full outer — a small row must NOT emit
    * one null-padded row per salt).
    */
  def salted(big: DataFrame, small: DataFrame, key: String,
             nSalts: Int, joinType: String = "inner"): DataFrame = {
    require(nSalts > 0, s"nSalts must be positive, got $nSalts")
    require(joinType == "inner" || joinType == "left_outer",
      s"salted join supports inner/left_outer, got $joinType")
    // hash over every big-side column: deterministic per row content,
    // varies WITHIN a key (that's the whole point), and stable across
    // runs/partitionings — unlike monotonically_increasing_id or rand
    val saltOfRow = pmod(hash(big.columns.toIndexedSeq.map(col): _*), lit(nSalts))
    val bigS = big.withColumn("__graft_salt", saltOfRow)
    val smallS = small.withColumn("__graft_salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    bigS.join(smallS, Seq(key, "__graft_salt"), joinType)
      .drop("__graft_salt")
  }

  /** Bloom-filter-pruned equi-join: build a Bloom filter over
    * `dim`'s (already filtered) join keys, drop every `fact` row the
    * filter rejects BEFORE the join, then run the exact join to
    * remove the filter's false positives. The final result is exactly
    * `fact ⋈ dim` — the bloom only changes WHERE non-matching rows
    * die: map-side at the scan, instead of after a full shuffle.
    *
    * Scale shape: the filter is built by one aggregation over dim
    * (mergeable bitsets, partial-aggregated), costs
    * ~1.2·n·ln(1/fpp)/ln²2 bits on the driver (≈ 900 KB for 1 M keys
    * at 3% fpp — broadcast-sized by construction), and the probe is a
    * couple of cheap integer hashes per fact row. With a 1%-selective
    * dim filter this removes ~99% of fact shuffle bytes. Spark's own
    * runtime row-level filtering (spark.sql.optimizer.runtimeFilter)
    * plans the same trick adaptively; this operator is the explicit,
    * deterministic form a pipeline can rely on regardless of conf.
    *
    * Keys must be long or string (the sketch's hashable types; TPC-H
    * surrogate keys are longs). `expectedItems` should overestimate
    * |dim keys| — undersizing only raises fpp, never loses rows.
    */
  def bloomPruned(fact: DataFrame, dim: DataFrame,
                  factKey: String, dimKey: String,
                  expectedItems: Long, fpp: Double = 0.03): DataFrame = {
    val keyType = fact.schema(factKey).dataType
    require(keyType == LongType || keyType == StringType,
      s"bloomPruned supports long/string keys, got $keyType for $factKey")
    fact.filter(bloomProbe(dim, dimKey, col(factKey), expectedItems, fpp))
      .join(dim, fact(factKey) === dim(dimKey))
  }

  /** Probe column for a Bloom filter built over `dim(dimKey)`: true iff
    * `probeKey` might be in the dim key set. The sketch is built by one
    * partial-aggregated pass over dim, shipped ONCE per executor via an
    * explicit `sparkContext.broadcast` (not re-serialized into every
    * task binary the way a closure-captured filter is), and probed by a
    * native codegen'd expression ([[graft.functions.BloomMightContain]])
    * — the probe stays inside the whole-stage-codegen'd scan stage
    * instead of crossing a UDF serialization fence.
    */
  def bloomProbe(dim: DataFrame, dimKey: String, probeKey: Column,
                 expectedItems: Long, fpp: Double = 0.03): Column = {
    val bloom = dim.stat.bloomFilter(dimKey, expectedItems, fpp)
    val bytes = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bytes)
    val bc = dim.sparkSession.sparkContext.broadcast(bytes.toByteArray)
    ColumnBridge.column(graft.functions.BloomMightContain(
      ColumnBridge.expression(probeKey), new graft.functions.BloomProbe(bc)))
  }

  /** Join-strategy advisor: one diagnostic pass over both sides that
    * recommends the cheapest safe physical strategy for an equi-join —
    * the decision procedure [[Profile.heavyHitters]] exists to feed,
    * folded into a single deterministic row:
    *
    *  - `broadcast` — the small side fits under `broadcastRows`: ship
    *    it to every executor, the big side never shuffles.
    *  - `salt` — the big side's heaviest key exceeds `skewRowsPerTask`
    *    (one reducer would own that many rows): use [[salted]].
    *  - `bloom` — the small side's keys cover < `bloomCoverage` of the
    *    big side's rows: most big rows have no match, prune them
    *    map-side with [[bloomPruned]] before shuffling the rest.
    *  - `shuffle` — no pathology: let the planner's sort-merge/AQE
    *    handle it.
    *
    * Exact counts (not samples), so the advice is reproducible across
    * runs and engines; cost is one partial-aggregated grouped pass over
    * the union of both sides' key columns. At
    * 100 TB run it on the PIPELINE'S key columns once and persist the
    * decision with the job config — the shape of a key distribution
    * moves far slower than the data.
    */
  def advise(big: DataFrame, small: DataFrame,
             bigKey: String, smallKey: String,
             broadcastRows: Long = 1000000L,
             skewRowsPerTask: Long = 5000000L,
             bloomCoverage: Double = 0.5): DataFrame = {
    // ONE scan of each side, NO join: tag rows with their origin, group
    // once by key (map-side partial agg reduces the wire to ~distinct
    // keys per partition), then fold total / max / matched / small-key
    // stats over the same per-key exchange. The previous shape joined a
    // broadcast key set onto the counts AND re-aggregated the small
    // side for its key count — two computations of the same distinct.
    val tagged = big.select(col(bigKey).as("__k"), lit(1L).as("__is_big"))
      .unionAll(small.select(col(smallKey).as("__k"), lit(0L).as("__is_big")))
    val perKey = tagged.groupBy("__k").agg(
      sum("__is_big").as("cnt"),
      max(lit(1L) - col("__is_big")).as("__has_small"))
    val stats = perKey.agg(
      sum("cnt").as("big_rows"),
      max(when(col("cnt") > 0, col("cnt"))).as("max_key_rows"),
      sum(col("__has_small")).as("small_keys"),
      sum(col("cnt") * col("__has_small")).as("matched_rows"))
    stats.select(
      col("big_rows"), col("small_keys"), col("max_key_rows"),
      round(col("matched_rows").cast("double") / col("big_rows"), 6)
        .as("match_coverage"),
      when(col("small_keys") <= broadcastRows, lit("broadcast"))
        .when(col("max_key_rows") > skewRowsPerTask, lit("salt"))
        .when(col("matched_rows").cast("double") / col("big_rows") < bloomCoverage,
          lit("bloom"))
        .otherwise(lit("shuffle")).as("strategy"))
  }
}
