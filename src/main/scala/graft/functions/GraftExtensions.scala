package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.types.IntegerType

/** Session extension registering graft's native Catalyst expressions.
  *
  * Wire it in with
  * `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`
  * on the session builder (all graft entry points do). Operators probe
  * `spark.catalog.functionExists("graft_dot")` and fall back to the
  * equivalent higher-order-function formulation when the extension is
  * absent, so results never depend on registration — only speed does.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[LongArrayDot].getName, "graft_dot"),
      (children: Seq[Expression]) => LongArrayDot(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_h64"),
      new ExpressionInfo(classOf[Md5Prefix].getName, "graft_h64"),
      (children: Seq[Expression]) => Md5Prefix(children(0), 15)))
    ext.injectFunction((
      new FunctionIdentifier("graft_h32"),
      new ExpressionInfo(classOf[Md5Prefix].getName, "graft_h32"),
      (children: Seq[Expression]) => Md5Prefix(children(0), 8)))
    ext.injectFunction((
      new FunctionIdentifier("graft_intersect_size"),
      new ExpressionInfo(classOf[LongSortedIntersectSize].getName, "graft_intersect_size"),
      (children: Seq[Expression]) => LongSortedIntersectSize(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_bpe_encode"),
      new ExpressionInfo(classOf[BpeEncodeExpr].getName, "graft_bpe_encode"),
      (children: Seq[Expression]) => BpeEncodeExpr(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_unigram_encode"),
      new ExpressionInfo(classOf[UnigramEncodeExpr].getName, "graft_unigram_encode"),
      (children: Seq[Expression]) => UnigramEncodeExpr(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_unigram_count"),
      new ExpressionInfo(classOf[UnigramCountExpr].getName, "graft_unigram_count"),
      (children: Seq[Expression]) => UnigramCountExpr(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_wordpiece_encode"),
      new ExpressionInfo(classOf[WordPieceEncodeExpr].getName, "graft_wordpiece_encode"),
      (children: Seq[Expression]) => WordPieceEncodeExpr(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_wordpiece_count"),
      new ExpressionInfo(classOf[WordPieceCountExpr].getName, "graft_wordpiece_count"),
      (children: Seq[Expression]) => WordPieceCountExpr(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_kll"),
      new ExpressionInfo(classOf[KllSketchAgg].getName, "graft_kll"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_kll(col, k) takes two arguments")
        // k parameterizes the sketch structure — it must be plan-time
        require(children(1).foldable && children(1).dataType == IntegerType,
          "graft_kll's k must be an integer literal")
        KllSketchAgg(children(0),
          children(1).eval().asInstanceOf[Int])
      }))
  }
}
