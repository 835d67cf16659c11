package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Greedy BPE ENCODE of one word against a fixed merge-rank table:
  * repeatedly find the adjacent symbol pair with the LOWEST rank and
  * merge its LEFTMOST occurrence, until no table pair is adjacent.
  * Returns the final symbol array.
  *
  * One-occurrence-at-a-time with min-rank re-pick is equivalent to the
  * classic "apply each merge everywhere in rank order" formulation
  * whenever pairs CREATED by a merge rank later than the merge that
  * created them — true for every table produced by BPE training
  * ([[graft.ops.Bpe.train]]), where a pair can only be learned after
  * both its symbols exist.
  *
  * The merge table rides the plan as a foldable array<struct<l,r>>
  * literal (rank = array index) — the same bounded-driver-state class
  * as the k-means centroid and PQ codebook literals; a production 32k
  * merge vocabulary is ~32k short strings, a few hundred KB of task
  * binary. The lookup map is built ONCE per (codegen) instance, not
  * per row, and the per-row loop is a tight array walk; a Spark
  * higher-order-function formulation cannot express the data-dependent
  * fixpoint at all (a fold applies each merge a fixed number of
  * times), which is why this is a native expression rather than
  * composed built-ins — preference rung (b) of the extension ladder.
  */
case class BpeEncodeExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(s: StructType, _))
          if s.fields.length == 2 &&
            s.fields.forall(_.dataType == StringType) =>
        if (right.foldable) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          "graft_bpe_encode merge table must be a literal (foldable)")
      case _ => TypeCheckResult.TypeCheckFailure(
        s"graft_bpe_encode requires (string, array<struct<l string, r string>>), got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_bpe_encode"

  /** Rank lookup built once from the foldable merge child. */
  @transient private lazy val table: java.util.HashMap[(String, String), Integer] =
    BpeEncodeExpr.buildTable(right.eval(null).asInstanceOf[ArrayData])

  override def nullSafeEval(w: Any, m: Any): Any =
    BpeEncodeExpr.encode(w.asInstanceOf[UTF8String], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tbl = ctx.addReferenceObj("bpeTable", table,
      classOf[java.util.HashMap[_, _]].getName)
    nullSafeCodeGen(ctx, ev, (w, _) =>
      s"${ev.value} = graft.functions.BpeEncodeExpr.encode($w, $tbl);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object BpeEncodeExpr {

  private[functions] def buildTable(
      m: ArrayData): java.util.HashMap[(String, String), Integer] = {
    val t = new java.util.HashMap[(String, String), Integer]()
    var i = 0
    while (i < m.numElements()) {
      val row = m.getStruct(i, 2)
      // first win on duplicate pairs: lowest rank is authoritative
      t.putIfAbsent((row.getUTF8String(0).toString,
        row.getUTF8String(1).toString), Integer.valueOf(i))
      i += 1
    }
    t
  }

  /** Static per-row entry point shared by eval and generated code.
    * Segmentation is by Unicode CODE POINT, matching `Bpe.charSyms`
    * (Spark `substr` counts code points) on any surrogate-free corpus.
    */
  def encode(word: UTF8String,
             table: java.util.HashMap[(String, String), Integer]): ArrayData = {
    val s = word.toString
    val syms = new java.util.ArrayList[String](s.length)
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      syms.add(new String(Character.toChars(cp)))
      i += Character.charCount(cp)
    }
    var done = syms.size < 2
    while (!done) {
      var bestRank = Int.MaxValue
      var bestPos = -1
      var j = 0
      val n = syms.size
      while (j < n - 1) {
        val r = table.get((syms.get(j), syms.get(j + 1)))
        if (r != null && r.intValue() < bestRank) {
          bestRank = r.intValue(); bestPos = j
        }
        j += 1
      }
      if (bestPos < 0) done = true
      else {
        syms.set(bestPos, syms.get(bestPos) + syms.get(bestPos + 1))
        syms.remove(bestPos + 1)
        if (syms.size < 2) done = true
      }
    }
    val out = new Array[Any](syms.size)
    var k = 0
    while (k < syms.size) { out(k) = UTF8String.fromString(syms.get(k)); k += 1 }
    new GenericArrayData(out)
  }
}
