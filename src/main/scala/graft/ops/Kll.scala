package graft.ops

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Serializable KLL sketch state: `levels(l)` holds items of weight
  * 2^l (level 0 = the raw-arrival buffer), `count` the exact number of
  * updates folded in, `compactions` the lifetime compaction counter
  * (an input to the deterministic coin — see [[Kll.coin]]).
  *
  * The levels are kept as Seq-of-Seq so the Spark product encoder
  * serializes the buffer between partial-aggregation stages without a
  * custom serializer; all mutation is by copy (the per-row cost is a
  * Vector append — the compaction work is where the time goes, and
  * that is O(k log k) amortized per 2k items).
  */
case class KllState(k: Int, count: Long, compactions: Long,
                    levels: Seq[Seq[Double]]) {
  def totalRetained: Int = levels.map(_.size).sum
}

/** Mergeable quantile sketch after Karnin, Lang & Liberty, "Optimal
  * quantile approximation in streams" (FOCS'16) — the KLL structure:
  * a ladder of weighted buffers where level l holds items of weight
  * 2^l, capacities decay geometrically (c = 2/3) from `k` at the top,
  * and a full level compacts by sorting and keeping every second item
  * at doubled weight one level up. Rank error is ~O(1/k) with the
  * usual published operating point k=200 ≈ 1.65% (two-sided, 99%
  * conf — the Apache DataSketches calibration of the same structure);
  * the operators here run k=256 and gate against a 2.5% bound, leaving
  * the margin that makes a property gate run-stable.
  *
  * Two departures from the paper's randomized form, both in service of
  * this repo's determinism doctrine:
  *
  *  - The compaction coin is not random: [[coin]] hashes the buffer
  *    content, the level and the lifetime compaction counter
  *    (MurmurHash3 — a pure function, stable across JVMs). The same
  *    multiset folded in the same order is therefore byte-identical
  *    across runs (the streaming replay contract), while across
  *    DIFFERENT orders the coin is still item-dependent enough that
  *    the error bound holds empirically with the same margins as the
  *    random coin (KllSpec pins uniform/zipf/tied/adversarial-sorted
  *    streams against the bound).
  *  - Odd-sized compactions keep the LARGEST item in place instead of
  *    randomizing the leftover, so total weight is conserved exactly:
  *    Σ 2^l over retained items == count, always (spec-pinned) —
  *    quantile denominators need no estimated total.
  *
  * MERGE contract (what "mergeable" means here, and what the spec
  * pins): a sketch built by any merge tree over any partitioning of
  * the data satisfies the same rank-error bound as the from-scratch
  * sketch. The merged OBJECT is not bit-equal to the from-scratch one
  * — no order-sensitive sketch's is — which is why the gated query
  * publishes the bound-check, not the estimate (the estimate would
  * hash-flap with Spark's nondeterministic shuffle-fetch merge order).
  */
object Kll {

  /** Geometric capacity decay between levels (the paper's c). */
  private val C_NUM = 2L
  private val C_DEN = 3L
  /** Floor on any level's capacity (below ~8 the odd-leftover loss
    * dominates the geometry). */
  private val MIN_CAP = 8
  /** Larger floor for the level-0 arrival buffer: items there are
    * weight-1 (exact), so a bigger buffer only DELAYS the first loss
    * of information — error never worsens — while compaction cascades
    * fire 8× less often on the per-row hot path (measured: the
    * walk-all-levels bookkeeping at floor 8 dominated sf0.1 update
    * cost). */
  private val MIN_CAP_L0 = 64

  def empty(k: Int): KllState = {
    require(k >= 8, s"kll needs k >= 8, got $k")
    KllState(k, 0L, 0L, Vector(Vector.empty))
  }

  /** Capacity of level `l` in a sketch currently `numLevels` tall:
    * k · c^(numLevels-1-l), floored at MIN_CAP — the top level always
    * holds up to k. Computed in integer arithmetic (k · 2^d / 3^d). */
  private[graft] def levelCap(k: Int, numLevels: Int, l: Int): Int = {
    val d = numLevels - 1 - l
    // k·(2/3)^d as integers; d > ~40 would zero out long before that
    var num = k.toLong
    var i = 0
    while (i < d && num > 0) { num = num * C_NUM / C_DEN; i += 1 }
    math.max(num.toInt, if (l == 0) MIN_CAP_L0 else MIN_CAP)
  }

  private def totalCap(k: Int, numLevels: Int): Int =
    (0 until numLevels).map(levelCap(k, numLevels, _)).sum

  /** Deterministic compaction coin: a MurmurHash3 over the buffer's
    * sorted bit patterns (seeded by level and the lifetime compaction
    * counter) is then avalanched through a splitmix64 finalizer mixed
    * with (level, counter) again, and the coin is the PARITY OF THE
    * POPCOUNT of the result — a bit that depends on all 64 output
    * bits, not murmur's lowest. A pure function of (content, position
    * in the compaction history), so identical folds replay
    * identically; the counter decorrelates repeated compactions of
    * near-identical buffers (a constant stream would otherwise always
    * flip the same way and keep the same item forever).
    *
    * Proof caveat: trading the paper's random coin for this hash means
    * the KLL error bound holds EMPIRICALLY (randomized cross-checks in
    * KllSpec; the oracle-replayed 2.5% gate) rather than by the
    * Karnin/Lang/Liberty proof. The second-family finalizer means an
    * input correlated with MurmurHash3 alone cannot steer the coin —
    * an adversary now needs the composition of both mixers — but a
    * fully adversarial stream remains outside the proved bound.
    */
  private[ops] def coin(sorted: IndexedSeq[Double], level: Int,
                        compactions: Long): Int = {
    val h = scala.util.hashing.MurmurHash3.orderedHash(
      sorted.view.map(java.lang.Double.doubleToLongBits),
      level * 31 + (compactions ^ (compactions >>> 32)).toInt)
    // splitmix64 avalanche over (murmur, level, counter)
    var z = h.toLong ^ (compactions * 0x9E3779B97F4A7C15L) ^
      (level.toLong << 32)
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    java.lang.Long.bitCount(z) & 1
  }

  /** Compact the lowest over-capacity level once: sort, keep every
    * second item (offset = coin) at weight 2× one level up, retain the
    * odd leftover (the largest) in place. */
  private def compressOnce(s: KllState): KllState = {
    val lvls = s.levels.map(_.toVector).toVector
    val n = lvls.length
    val l = (0 until n).find(i => lvls(i).size >= levelCap(s.k, n, i))
      .getOrElse(
        // total over capacity but no level individually full can only
        // happen transiently after a merge grew the ladder; compact
        // the fullest-relative level
        (0 until n).maxBy(i => lvls(i).size.toDouble / levelCap(s.k, n, i)))
    val sorted = lvls(l).sorted
    val pairs = (sorted.size / 2) * 2
    val leftover: Vector[Double] =
      if (sorted.size % 2 == 1) Vector(sorted.last) else Vector.empty
    val off = coin(sorted, l, s.compactions)
    val kept = (off until pairs by 2).map(sorted(_)).toVector
    val grown = if (l + 1 >= n) lvls :+ Vector.empty[Double] else lvls
    val next = grown
      .updated(l, leftover)
      .updated(l + 1, grown(l + 1) ++ kept)
    s.copy(compactions = s.compactions + 1, levels = next)
  }

  private def compress(s: KllState): KllState = {
    var cur = s
    while (cur.totalRetained > totalCap(cur.k, cur.levels.length))
      cur = compressOnce(cur)
    cur
  }

  /** [[compress]] for the mutable aggregation buffer ([[KllBuf]]) —
    * same arithmetic, package-visible. */
  private[graft] def compressState(s: KllState): KllState = compress(s)

  /** Fold one value in. Only a full level 0 can push the sketch over
    * capacity (updates grow nothing else), so the expensive
    * walk-all-levels compress check runs once per cap(0) arrivals, not
    * per row — a ~10× cut on the hot path (measured at sf0.1). */
  def update(s: KllState, v: Double): KllState = {
    val s2 = s.copy(count = s.count + 1,
      levels = s.levels.updated(0, s.levels.head :+ v))
    if (s2.levels.head.size >= levelCap(s2.k, s2.levels.length, 0))
      compress(s2)
    else s2
  }

  /** Merge two sketches (same k): concatenate level-wise, then compact
    * back under capacity. Error bounds compose per the paper; the
    * result depends on merge order only through which items survive,
    * never through the bound. */
  def merge(a: KllState, b: KllState): KllState = {
    require(a.k == b.k, s"cannot merge kll sketches with k ${a.k} vs ${b.k}")
    if (b.count == 0) a
    else if (a.count == 0) b
    else {
      val h = math.max(a.levels.length, b.levels.length)
      val lvls = (0 until h).map { l =>
        a.levels.applyOrElse(l, (_: Int) => Vector.empty[Double]) ++
          b.levels.applyOrElse(l, (_: Int) => Vector.empty[Double])
      }.toVector
      compress(KllState(a.k, a.count + b.count,
        a.compactions + b.compactions, lvls))
    }
  }

  /** All retained items as (value, weight), coalesced per distinct
    * value and sorted by value — the sketch's weighted CDF support. */
  def weighted(s: KllState): Seq[(Double, Long)] =
    s.levels.zipWithIndex
      .flatMap { case (buf, l) => buf.map(v => (v, 1L << l)) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum)
      .toSeq.sortBy(_._1)

  /** Lower weighted quantile at percentile `pct` (0..100]: the
    * smallest retained value whose cumulative weight × 100 reaches
    * pct × total weight — the repo's standard lower-quantile rule
    * (an actual data value, no interpolation). Total weight == count
    * by the conservation invariant. */
  def quantile(s: KllState, pct: Long): Option[Double] = {
    val w = weighted(s)
    if (w.isEmpty) None
    else {
      val total = s.count
      var cum = 0L
      w.collectFirst {
        case (v, wt) if { cum += wt; cum * 100L >= pct * total } => v
      }
    }
  }

  /** Estimated rank (count of items <= v) from the sketch. */
  def estimateRank(s: KllState, v: Double): Long =
    weighted(s).takeWhile(_._1 <= v).map(_._2).sum
}

/** Mutable aggregation buffer for [[KllAgg]]'s per-row hot path: the
  * level-0 arrival buffer as an UNBOXED double array appended in
  * place (the Aggregator contract allows mutating and returning the
  * buffer), the settled upper levels as the immutable vectors the
  * compaction path already produces. Every compaction converts to
  * [[KllState]] and runs the EXACT [[Kll]] compress/merge arithmetic,
  * so sketch content is bit-identical to the immutable form at every
  * compaction boundary — only the per-row allocation churn (one
  * KllState + two persistent-vector path copies + a boxed Double per
  * update) is gone. Kryo-serialized between partial and final
  * aggregation; the OUTPUT stays the product-encoded [[KllState]].
  */
final class KllBuf(val k: Int) extends Serializable {
  var count = 0L
  var compactions = 0L
  var l0 = new Array[Double](64)
  var l0n = 0
  var upper: Vector[Vector[Double]] = Vector.empty

  def toState: KllState = {
    val lvl0: Vector[Double] = {
      val b = Vector.newBuilder[Double]
      var i = 0
      while (i < l0n) { b += l0(i); i += 1 }
      b.result()
    }
    KllState(k, count, compactions, lvl0 +: upper)
  }

  def loadFrom(s: KllState): KllBuf = {
    count = s.count
    compactions = s.compactions
    val head = s.levels.headOption.getOrElse(Seq.empty)
    if (head.size > l0.length) l0 = new Array[Double](head.size * 2)
    var i = 0
    head.foreach { v => l0(i) = v; i += 1 }
    l0n = head.size
    upper = s.levels.drop(1).map(_.toVector).toVector
    this
  }
}

/** [[Kll]] as a typed Spark Aggregator — the mergeable-under-
  * partitioning form: Spark folds per-partition sketches with
  * `reduce` and combines partials with `merge`, which is exactly the
  * arbitrary-merge-tree contract the sketch guarantees bounds under.
  * Use via `udaf(new KllAgg(k), Encoders.scalaDouble)` in a
  * DataFrame agg, or `.toColumn` on a typed Dataset. The buffer is
  * the mutable [[KllBuf]] (per-row append in place); results are
  * identical to folding [[Kll.update]] directly (KllSpec pins it).
  */
class KllAgg(k: Int) extends Aggregator[Double, KllBuf, KllState] {
  def zero: KllBuf = { Kll.empty(k); new KllBuf(k) } // empty() validates k
  def reduce(s: KllBuf, v: Double): KllBuf = {
    if (s.l0n >= s.l0.length) {
      val g = new Array[Double](s.l0.length * 2)
      System.arraycopy(s.l0, 0, g, 0, s.l0n)
      s.l0 = g
    }
    s.l0(s.l0n) = v
    s.l0n += 1
    s.count += 1
    // same trigger as Kll.update: only a full level 0 can push the
    // sketch over capacity
    if (s.l0n >= Kll.levelCap(s.k, s.upper.length + 1, 0))
      s.loadFrom(Kll.compressState(s.toState))
    else s
  }
  def merge(a: KllBuf, b: KllBuf): KllBuf =
    a.loadFrom(Kll.merge(a.toState, b.toState))
  def finish(s: KllBuf): KllState = s.toState
  def bufferEncoder: Encoder[KllBuf] = Encoders.kryo[KllBuf]
  def outputEncoder: Encoder[KllState] = Encoders.product[KllState]
}
