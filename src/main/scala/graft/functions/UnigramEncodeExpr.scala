package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Viterbi (min-cost) unigram-LM segmentation of one word against a
  * fixed piece table — the ENCODE half of the SentencePiece-style
  * unigram tokenizer ([[graft.ops.Unigram]]): find the segmentation
  * minimizing the sum of piece costs (cost = −ln p(piece) in
  * micro-nats, a positive long), the exact DP the unigram model
  * defines — unlike BPE's greedy merges, the optimum here really is a
  * per-word dynamic program, and a data-dependent DP with backtrack
  * is precisely what higher-order functions can't express (the
  * BpeEncodeExpr rationale — preference rung (b) of the ladder).
  *
  * Determinism: ties (equal total cost) resolve to the SHORTEST last
  * piece at every DP cell (the candidate scan goes piece length
  * 1..maxLen and only a strictly better cost replaces), so the
  * segmentation is a pure function of (word, table). Characters not
  * in the table fall back to a single-symbol piece at
  * maxTableCost + 10⁶ (one nat above the rarest piece) — every word
  * segments, and unknown text is maximally expensive rather than
  * lost. Symbols are Unicode code points (the Bpe.charSyms
  * convention).
  *
  * The piece table rides the plan as a foldable
  * array<struct<piece string, cost long>> literal — the bounded
  * driver-state class of the k-means centroid / BPE merge / PQ
  * codebook literals. Lookup map and max piece length are built once
  * per (codegen) instance; the per-row DP is O(len·maxLen) tight
  * loops.
  */
case class UnigramEncodeExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(s: StructType, _))
          if s.fields.length == 2 &&
            s.fields(0).dataType == StringType &&
            s.fields(1).dataType == LongType =>
        if (right.foldable) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          "graft_unigram_encode piece table must be a literal (foldable)")
      case _ => TypeCheckResult.TypeCheckFailure(
        s"graft_unigram_encode requires (string, array<struct<piece string, " +
          s"cost long>>), got ${left.dataType.simpleString} and " +
          s"${right.dataType.simpleString}")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_unigram_encode"

  @transient private lazy val table: UnigramEncodeExpr.Table =
    UnigramEncodeExpr.buildTable(right.eval(null).asInstanceOf[ArrayData])

  override def nullSafeEval(w: Any, m: Any): Any =
    UnigramEncodeExpr.encode(w.asInstanceOf[UTF8String], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tbl = ctx.addReferenceObj("unigramTable", table,
      classOf[UnigramEncodeExpr.Table].getName)
    nullSafeCodeGen(ctx, ev, (w, _) =>
      s"${ev.value} = graft.functions.UnigramEncodeExpr.encode($w, $tbl);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Whole-text unigram token COUNT: normalize-split the input on
  * single spaces and sum the Viterbi piece count of every word — one
  * top-level native call per row, so pipeline stages can price rows
  * without nesting the DP inside a higher-order lambda (an embedded
  * custom expression under an unresolved lambda variable trips the
  * analyzer's function-resolution ordering; a dedicated expression
  * doesn't). Input is expected pre-normalized (the caller applies
  * TextAnalysis.normalize); empty words contribute nothing.
  */
case class UnigramCountExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    UnigramEncodeExpr(left, right).checkInputDataTypes()

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def prettyName: String = "graft_unigram_count"

  @transient private lazy val table: UnigramEncodeExpr.Table =
    UnigramEncodeExpr.buildTable(right.eval(null).asInstanceOf[ArrayData])

  override def nullSafeEval(t: Any, m: Any): Any =
    UnigramEncodeExpr.countTokens(t.asInstanceOf[UTF8String], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tbl = ctx.addReferenceObj("unigramTable", table,
      classOf[UnigramEncodeExpr.Table].getName)
    nullSafeCodeGen(ctx, ev, (t, _) =>
      s"${ev.value} = graft.functions.UnigramEncodeExpr.countTokens($t, $tbl);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object UnigramEncodeExpr {

  /** Token count over space-separated words (see [[UnigramCountExpr]]). */
  def countTokens(text: UTF8String, table: Table): Long = {
    var total = 0L
    var start = 0
    val s = text.toString
    var i = 0
    while (i <= s.length) {
      if (i == s.length || s.charAt(i) == ' ') {
        if (i > start)
          total += encode(UTF8String.fromString(s.substring(start, i)), table)
            .numElements()
        start = i + 1
      }
      i += 1
    }
    total
  }

  /** Piece costs + derived constants, built once per instance. */
  final class Table(val costs: java.util.HashMap[String, java.lang.Long],
                    val maxLen: Int, val unkCost: Long) extends Serializable

  private[functions] def buildTable(m: ArrayData): Table = {
    val t = new java.util.HashMap[String, java.lang.Long]()
    var maxLen = 1
    var maxCost = 0L
    var i = 0
    while (i < m.numElements()) {
      val row = m.getStruct(i, 2)
      val piece = row.getUTF8String(0).toString
      val cost = row.getLong(1)
      // first win on duplicates: the table is driver-sorted, so the
      // authoritative cost comes first
      if (t.putIfAbsent(piece, java.lang.Long.valueOf(cost)) == null) {
        val cp = piece.codePointCount(0, piece.length)
        if (cp > maxLen) maxLen = cp
        if (cost > maxCost) maxCost = cost
      }
      i += 1
    }
    new Table(t, maxLen, maxCost + 1000000L)
  }

  /** Static per-row entry point shared by eval and generated code. */
  def encode(word: UTF8String, table: Table): ArrayData = {
    val s = word.toString
    // code-point symbol boundaries
    val bounds = new java.util.ArrayList[Integer](s.length + 1)
    var i = 0
    bounds.add(0)
    while (i < s.length) {
      i += Character.charCount(s.codePointAt(i))
      bounds.add(i)
    }
    val n = bounds.size() - 1
    if (n == 0) return new GenericArrayData(new Array[Any](0))
    val dp = new Array[Long](n + 1)
    val back = new Array[Int](n + 1) // chosen last-piece length (in symbols)
    var k = 1
    while (k <= n) { dp(k) = Long.MaxValue; k += 1 }
    var e = 1
    while (e <= n) {
      var l = 1
      val lMax = math.min(table.maxLen, e)
      while (l <= lMax) {
        val piece = s.substring(bounds.get(e - l), bounds.get(e))
        val c = table.costs.get(piece)
        val pc: Long =
          if (c != null) c.longValue()
          else if (l == 1) table.unkCost
          else -1L // not a piece, not a fallback
        if (pc >= 0L && dp(e - l) != Long.MaxValue) {
          val cand = dp(e - l) + pc
          if (cand < dp(e)) { dp(e) = cand; back(e) = l }
        }
        l += 1
      }
      e += 1
    }
    // backtrack (dp(n) always reachable via the single-symbol fallback)
    val rev = new java.util.ArrayList[String]()
    var pos = n
    while (pos > 0) {
      val l = back(pos)
      rev.add(s.substring(bounds.get(pos - l), bounds.get(pos)))
      pos -= l
    }
    val out = new Array[Any](rev.size())
    var j = 0
    while (j < rev.size()) {
      out(j) = UTF8String.fromString(rev.get(rev.size() - 1 - j)); j += 1
    }
    new GenericArrayData(out)
  }
}
