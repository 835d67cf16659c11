package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate string (edit-distance) join — the record-linkage /
  * entity-resolution primitive: pair rows of two tables whose string
  * keys are within Levenshtein distance `maxDist`, without ever
  * forming the cross product.
  *
  * Blocking is the classic q-gram count filter (Gravano et al., VLDB
  * 2001) and it is LOSSLESS: one edit destroys at most q of a
  * string's positional q-grams, so two strings within distance d
  * share at least max(|a|,|b|) − q + 1 − q·d q-grams AS A BAG; any
  * pair below the bound is provably farther than d and skips the
  * exact distance entirely. Bag semantics matter — "aaaa" has three
  * positional 'aaa' grams but one distinct — so each gram occurrence
  * carries its ORDINAL (2nd 'aaa', 3rd 'aaa'): an equi-join on
  * (gram, ordinal) counts exactly Σ_g min(m_a, m_b), the bag
  * intersection, and repetitive strings can't slip the bound.
  * Survivors get one exact `levenshtein` verification — the same
  * integer DP on both engines.
  *
  * Scale shape: grams explode each side (|s|−q+1 rows per string),
  * candidates come from a (gram, ordinal) equi-join + a
  * partial-aggregatable shared-count groupBy — never a cross join —
  * and the DP runs once per surviving pair. The join's cost IS the
  * blocking selectivity: pairs sharing any gram are enumerated, so
  * template-heavy key populations (every value beginning with the
  * same literal prefix) degrade toward the pairs that share the
  * template — raise q (longer grams discriminate template tails) or
  * strip the known-constant prefix before joining; both keep the
  * bound lossless, unlike df-capped gram dropping. Pairs whose longer
  * string is under q·(maxDist+1) chars — where the count bound
  * degenerates to ≤ 0 and a gram join is blind — pair through a
  * broadcast brute channel over that (by construction tiny)
  * near-empty-string population instead.
  */
object FuzzyJoin {

  /** Positional q-grams with per-string occurrence ordinals: rows
    * (id, key, len, g, occ). The O(L²) ordinal scan is per-row over
    * short join keys — it fuses into the scan and never shuffles.
    */
  private def grams(df: DataFrame, id: String, key: String, q: Int,
                    idOut: String, keyOut: String, lenOut: String): DataFrame =
    df.select(col(id).as(idOut), col(key).as(keyOut),
        length(col(key)).as(lenOut))
      .filter(col(lenOut) >= q)
      // occ scans 0..i−1 and drops j=0 in the lambda: sequence(1, i−1)
      // at i=1 is Spark's DESCENDING [1, 0] — not empty — and
      // substring(·, 0, q) aliases position 1, which silently gave
      // every first gram a phantom self-match (ordinal 2) until the
      // brute-force cross-check caught the lost candidates
      .withColumn("__g", explode(expr(
        s"""transform(sequence(1, $lenOut - ${q - 1}), i -> struct(
           |  substring($keyOut, i, $q) AS g,
           |  size(filter(sequence(0, i - 1),
           |       j -> j >= 1 AND
           |            substring($keyOut, j, $q) = substring($keyOut, i, $q)))
           |    AS occ))""".stripMargin)))
      .select(col(idOut), col(keyOut), col(lenOut),
        col("__g.g").as("g"), col("__g.occ").as("occ"))

  /** (id, key) pairs of `left` × `right` with
    * levenshtein(key_l, key_r) ≤ maxDist, plus the distance.
    *
    * `stripPrefix`: the template-degradation knob made real (SURVEY
    * B35 documented it as advice; round 10 ships it). On a
    * template-heavy key population ("ACME-SUPPLIER-…" on every row)
    * the hot template grams dominate the equi-join — every pair
    * shares the template's grams, so blocking degrades toward the
    * template population squared. Stripping the known-constant prefix
    * BEFORE gram blocking removes those grams while staying LOSSLESS,
    * by the unit-cost Levenshtein prefix-cancellation lemma: when
    * s[0] == t[0], d(s,t) = d(s[1:], t[1:]) EXACTLY (equal chars take
    * the diagonal; the DP matrix is non-decreasing along diagonals,
    * so the ≤ from alignment-reuse meets the ≥ from monotonicity) —
    * induction cancels the whole shared prefix, so distances computed
    * on stripped keys ARE the full-key distances. Keys NOT carrying
    * the prefix can't use the lemma and route through the full-key
    * join instead: stripped-pair population (both sides prefixed)
    * joins on stripped keys, the remaining three quadrants join on
    * full keys — in the template-heavy corpus the knob targets, the
    * non-prefixed populations are tiny by construction. Original
    * (unstripped) keys are restored in the output either way.
    */
  def join(left: DataFrame, right: DataFrame,
           leftId: String, leftKey: String,
           rightId: String, rightKey: String,
           maxDist: Int = 1, q: Int = 3,
           stripPrefix: Option[String] = None): DataFrame =
    stripPrefix.filter(_.nonEmpty) match {
      case None =>
        joinImpl(left, right, leftId, leftKey, rightId, rightKey, maxDist, q)
      case Some(p) =>
        val pl = p.length
        def strip(df: DataFrame, key: String) =
          df.withColumn(key, substring(col(key), pl + 1, Int.MaxValue))
        val hasL = col(leftKey).startsWith(p)
        val hasR = col(rightKey).startsWith(p)
        val stripped = joinImpl(
          strip(left.filter(hasL), leftKey),
          strip(right.filter(hasR), rightKey),
          leftId, leftKey, rightId, rightKey, maxDist, q)
          .withColumn("k_l", concat(lit(p), col("k_l")))
          .withColumn("k_r", concat(lit(p), col("k_r")))
        // the three quadrants with a non-prefixed side: full keys
        // (L × R¬P covers LP×R¬P and L¬P×R¬P; L¬P × RP the rest)
        val rest = joinImpl(left, right.filter(!hasR),
            leftId, leftKey, rightId, rightKey, maxDist, q)
          .unionByName(joinImpl(left.filter(!hasL), right.filter(hasR),
            leftId, leftKey, rightId, rightKey, maxDist, q))
        stripped.unionByName(rest)
    }

  private def joinImpl(left: DataFrame, right: DataFrame,
           leftId: String, leftKey: String,
           rightId: String, rightKey: String,
           maxDist: Int, q: Int): DataFrame = {
    require(maxDist >= 0 && q >= 1, s"bad maxDist=$maxDist / q=$q")
    // PREFIX FILTER over the gram equi-join (the prefix-filtering
    // principle of the set-similarity-join literature — Chaudhuri et
    // al. ICDE'06, PPJoin — applied to the positional q-gram bag,
    // which the (g, occ) ordinal encoding turns into a SET): a pair
    // within distance d shares ≥ t = max(|a|,|b|) − q + 1 − q·d gram
    // elements, so under ANY total order on elements, the first
    // |G| − t + 1 ≤ q·d + 1 elements of each side must already share
    // one (pigeonhole on the smallest common element: were both
    // prefixes disjoint from each other, every other common element
    // would sit in one side's (t−1)-sized suffix, capping the overlap
    // at t−1 < t). Each side therefore contributes only its q·d + 1
    // RAREST grams to the join — rarest-first (count over both sides)
    // is what makes this effective on template-heavy keys, where the
    // shared template's grams are exactly the frequent ones the
    // prefix now skips; candidates drop from "every pair sharing any
    // gram" to "pairs sharing a rare gram", and the exact DP verifies
    // the survivors. Losslessness is spec-pinned by the RandomizedSpec
    // brute-force cross-check (template-heavy AND random populations).
    val pfx = q * maxDist + 1
    // only narrow (id, g, occ) rows enter the frequency/prefix passes;
    // key strings and lengths rejoin per CANDIDATE afterwards. The
    // narrow gram tables pin under a lazy cut: they feed the frequency
    // count AND the per-side prefix selection — ~|keys|·len short
    // rows, spill-backed, far under the corpus-cache scale the bigram
    // operators gate on.
    val lg = graft.util.Lineage.truncateLazy(
      grams(left, leftId, leftKey, q, "id_l", "k_l", "len_l")
        .select(col("id_l"), col("g"), col("occ")))
    val rg = graft.util.Lineage.truncateLazy(
      grams(right, rightId, rightKey, q, "id_r", "k_r", "len_r")
        .select(col("id_r"), col("g"), col("occ")))
    // one global rarity order shared by BOTH sides (ties broken by
    // (g, occ) — total and deterministic)
    val freq = graft.util.Lineage.truncateLazy(
      lg.select(col("g"), col("occ"))
        .unionAll(rg.select(col("g"), col("occ")))
        .groupBy("g", "occ").agg(count(lit(1)).as("__fc")))
    def prefixOf(gr: DataFrame, id: String): DataFrame =
      gr.join(freq, Seq("g", "occ"))
        .groupBy(col(id))
        .agg(slice(array_sort(collect_list(
          struct(col("__fc"), col("g"), col("occ")))), 1, pfx).as("__p"))
        .select(col(id), explode(col("__p")).as("__e"))
        .select(col(id), col("__e.g").as("g"), col("__e.occ").as("occ"))
    val cands = prefixOf(lg, "id_l")
      .join(prefixOf(rg, "id_r"), Seq("g", "occ"))
      .select("id_l", "id_r").distinct()
    // Pairs with max(len) ≥ q(d+1) always satisfy t ≥ 1 (and both
    // sides HAVE grams — a ≥ q(d+1)-char string within d of a
    // < q-char one is impossible), so the prefix channel covers them;
    // pairs with both sides below q(d+1) may share ZERO grams (the
    // bound degenerates — the RandomizedSpec cross-check caught
    // exactly this) and go through the brute channel below.
    val cut = q * (maxDist + 1)
    val verified = cands
      .join(left.select(col(leftId).as("id_l"), col(leftKey).as("k_l"),
        length(col(leftKey)).as("len_l")), Seq("id_l"))
      .join(right.select(col(rightId).as("id_r"), col(rightKey).as("k_r"),
        length(col(rightKey)).as("len_r")), Seq("id_r"))
      .filter(greatest(col("len_l"), col("len_r")) >= cut)
      .withColumn("dist", levenshtein(col("k_l"), col("k_r")))
      .filter(col("dist") <= maxDist)
      .select(col("id_l"), col("k_l"), col("id_r"), col("k_r"),
        col("dist").cast("long").as("dist"))
    val shortL = left.select(col(leftId).as("id_l"), col(leftKey).as("k_l"))
      .filter(length(col("k_l")) < cut)
    val shortR = right.select(col(rightId).as("id_r"), col(rightKey).as("k_r"))
      .filter(length(col("k_r")) < cut)
    val shortPairs = shortL.crossJoin(broadcast(shortR))
      .withColumn("dist", levenshtein(col("k_l"), col("k_r")))
      .filter(col("dist") <= maxDist)
      .select(col("id_l"), col("k_l"), col("id_r"), col("k_r"),
        col("dist").cast("long").as("dist"))
    verified.unionByName(shortPairs)
  }
}
