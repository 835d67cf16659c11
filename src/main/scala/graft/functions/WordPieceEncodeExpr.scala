package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** WordPiece (BERT-family) greedy longest-match-first segmentation of
  * one word against a fixed vocabulary — the third member of the
  * tokenizer trio next to [[BpeEncodeExpr]] (greedy merge replay) and
  * [[UnigramEncodeExpr]] (Viterbi min-cost): at each position take the
  * LONGEST vocabulary piece matching the remaining suffix, where
  * non-initial positions match only continuation pieces (the `##`
  * prefix convention, carried literally in the vocab array); if no
  * piece matches at some position the WHOLE word becomes `[UNK]` (the
  * published WordPiece contract — partial segmentations never leak).
  *
  * Deterministic by construction: longest-match has no ties. The
  * vocabulary rides the plan as a foldable array<string> literal (the
  * BPE-merge/centroid bounded-driver-state class); lookup sets and max
  * piece lengths build once per (codegen) instance, the per-row scan
  * is O(len·maxPieceLen) over code-point boundaries (the Bpe.charSyms
  * symbol convention).
  */
case class WordPieceEncodeExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(StringType, _)) =>
        if (right.foldable) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          "graft_wordpiece_encode vocabulary must be a literal (foldable)")
      case _ => TypeCheckResult.TypeCheckFailure(
        "graft_wordpiece_encode requires (string, array<string>), got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_wordpiece_encode"

  @transient private lazy val table: WordPieceEncodeExpr.Table =
    WordPieceEncodeExpr.buildTable(right.eval(null).asInstanceOf[ArrayData])

  override def nullSafeEval(w: Any, v: Any): Any =
    WordPieceEncodeExpr.encode(w.asInstanceOf[UTF8String], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tbl = ctx.addReferenceObj("wordpieceTable", table,
      classOf[WordPieceEncodeExpr.Table].getName)
    nullSafeCodeGen(ctx, ev, (w, _) =>
      s"${ev.value} = graft.functions.WordPieceEncodeExpr.encode($w, $tbl);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Whole-text WordPiece token COUNT: normalize-split the input on
  * single spaces and sum each word's greedy-segmentation piece count
  * ([UNK] words count 1) — one top-level native call per row (the
  * [[UnigramCountExpr]] rationale: a custom expression nested under a
  * higher-order lambda trips the analyzer's resolution ordering, a
  * dedicated whole-text expression doesn't). Input is expected
  * pre-normalized; empty words contribute nothing.
  */
case class WordPieceCountExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    WordPieceEncodeExpr(left, right).checkInputDataTypes()

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def prettyName: String = "graft_wordpiece_count"

  @transient private lazy val table: WordPieceEncodeExpr.Table =
    WordPieceEncodeExpr.buildTable(right.eval(null).asInstanceOf[ArrayData])

  override def nullSafeEval(t: Any, v: Any): Any =
    WordPieceEncodeExpr.countTokens(t.asInstanceOf[UTF8String], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tbl = ctx.addReferenceObj("wordpieceTable", table,
      classOf[WordPieceEncodeExpr.Table].getName)
    nullSafeCodeGen(ctx, ev, (t, _) =>
      s"${ev.value} = graft.functions.WordPieceEncodeExpr.countTokens($t, $tbl);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object WordPieceEncodeExpr {

  /** Token count over space-separated words (see [[WordPieceCountExpr]]). */
  def countTokens(text: UTF8String, table: Table): Long = {
    val s = text.toString
    var total = 0L
    var start = 0
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

  /** Initial and continuation piece sets + max piece lengths (in code
    * points), built once per instance.
    */
  final class Table(val initial: java.util.HashSet[String],
                    val cont: java.util.HashSet[String],
                    val maxInit: Int, val maxCont: Int) extends Serializable

  private[graft] def buildTable(v: ArrayData): Table = {
    val init = new java.util.HashSet[String]()
    val cont = new java.util.HashSet[String]()
    var maxI = 1
    var maxC = 1
    var i = 0
    while (i < v.numElements()) {
      val p = v.getUTF8String(i).toString
      if (p.startsWith("##")) {
        val raw = p.substring(2)
        if (raw.nonEmpty && cont.add(raw)) {
          val cp = raw.codePointCount(0, raw.length)
          if (cp > maxC) maxC = cp
        }
      } else if (p.nonEmpty && init.add(p)) {
        val cp = p.codePointCount(0, p.length)
        if (cp > maxI) maxI = cp
      }
      i += 1
    }
    new Table(init, cont, maxI, maxC)
  }

  /** Static per-row entry point shared by eval and generated code. */
  def encode(word: UTF8String, table: Table): ArrayData = {
    val s = word.toString
    if (s.isEmpty) return new GenericArrayData(new Array[Any](0))
    // code-point symbol boundaries
    val bounds = new java.util.ArrayList[Integer](s.length + 1)
    var i = 0
    bounds.add(0)
    while (i < s.length) {
      i += Character.charCount(s.codePointAt(i))
      bounds.add(i)
    }
    val n = bounds.size() - 1
    val out = new java.util.ArrayList[Any]()
    var pos = 0
    while (pos < n) {
      val isInit = pos == 0
      var l = math.min(if (isInit) table.maxInit else table.maxCont, n - pos)
      var found: String = null
      while (l >= 1 && found == null) {
        val cand = s.substring(bounds.get(pos), bounds.get(pos + l))
        val hit = if (isInit) table.initial.contains(cand)
                  else table.cont.contains(cand)
        if (hit) found = cand else l -= 1
      }
      if (found == null) {
        // the whole-word UNK contract: partial segmentations never leak
        val unk = new Array[Any](1)
        unk(0) = UTF8String.fromString("[UNK]")
        return new GenericArrayData(unk)
      }
      out.add(UTF8String.fromString(if (isInit) found else "##" + found))
      pos += l
    }
    new GenericArrayData(out.toArray)
  }
}
