package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

import graft.ops.{Kll, KllBuf, KllState}

/** [[graft.ops.KllAgg]]'s native registration (`graft_kll(col, k)`) —
  * the same sketch arithmetic without the typed-Aggregator harness.
  *
  * The `udaf(...)` route wraps the Aggregator in a ScalaAggregator
  * whose per-row update round-trips the input through an
  * ExpressionEncoder (InternalRow → boxed Scala value) and whose
  * buffer rides a kryo encoder; profiling put that harness at ~19
  * µs/row — an order of magnitude over the sketch's own append. This
  * TypedImperativeAggregate keeps the identical mutable [[KllBuf]]
  * buffer and the EXACT [[Kll]] compress/merge arithmetic (sketch
  * content is bit-identical at every compaction boundary — KllSpec
  * pins it), but its update is `child.eval(row)` → unboxed append:
  * no encoder, no codec, serialization only at the partial/final
  * aggregation boundary like any native aggregate.
  *
  * Output is the same (k, count, compactions, levels) struct the
  * product-encoded [[KllState]] produces, so callers decode one shape
  * whichever path ran. Callers probe the registration and fall back
  * to the udaf — results never depend on it (the graft_dot
  * discipline), only the per-row harness cost does.
  */
case class KllSketchAgg(child: Expression, k: Int,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllBuf] {

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType if k >= 8 => TypeCheckResult.TypeCheckSuccess
    case DoubleType => TypeCheckResult.TypeCheckFailure(
      s"graft_kll needs k >= 8, got $k")
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_kll requires a double input, got ${other.simpleString}")
  }

  override def dataType: DataType = KllSketchAgg.stateType

  override def nullable: Boolean = false

  override def prettyName: String = "graft_kll"

  override def createAggregationBuffer(): KllBuf = {
    Kll.empty(k) // validates k
    new KllBuf(k)
  }

  override def update(s: KllBuf, input: InternalRow): KllBuf = {
    val v = child.eval(input)
    if (v == null) s
    else {
      // the exact KllAgg.reduce hot path: in-place level-0 append,
      // compress (identical arithmetic) only when level 0 fills
      if (s.l0n >= s.l0.length) {
        val g = new Array[Double](s.l0.length * 2)
        System.arraycopy(s.l0, 0, g, 0, s.l0n)
        s.l0 = g
      }
      s.l0(s.l0n) = v.asInstanceOf[Double]
      s.l0n += 1
      s.count += 1
      if (s.l0n >= Kll.levelCap(s.k, s.upper.length + 1, 0))
        s.loadFrom(Kll.compressState(s.toState))
      else s
    }
  }

  override def merge(a: KllBuf, b: KllBuf): KllBuf =
    a.loadFrom(Kll.merge(a.toState, b.toState))

  override def eval(s: KllBuf): Any = {
    val st = s.toState
    InternalRow(st.k, st.count, st.compactions,
      new GenericArrayData(st.levels.map(l =>
        new GenericArrayData(l.toArray)).toArray[Any]))
  }

  override def serialize(s: KllBuf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(s.k); out.writeLong(s.count); out.writeLong(s.compactions)
    out.writeInt(s.l0n)
    var i = 0
    while (i < s.l0n) { out.writeDouble(s.l0(i)); i += 1 }
    out.writeInt(s.upper.length)
    s.upper.foreach { lvl =>
      out.writeInt(lvl.length)
      lvl.foreach(out.writeDouble)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): KllBuf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new KllBuf(in.readInt())
    buf.count = in.readLong(); buf.compactions = in.readLong()
    val n0 = in.readInt()
    if (n0 > buf.l0.length) buf.l0 = new Array[Double](n0)
    var i = 0
    while (i < n0) { buf.l0(i) = in.readDouble(); i += 1 }
    buf.l0n = n0
    buf.upper = Vector.fill(in.readInt()) {
      val m = in.readInt()
      val b = Vector.newBuilder[Double]
      var j = 0
      while (j < m) { b += in.readDouble(); j += 1 }
      b.result()
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object KllSketchAgg {
  /** The product-encoder schema of [[KllState]] — one decode shape for
    * both the native and the udaf path. */
  val stateType: StructType = StructType(Seq(
    StructField("k", IntegerType, nullable = false),
    StructField("count", LongType, nullable = false),
    StructField("compactions", LongType, nullable = false),
    StructField("levels",
      ArrayType(ArrayType(DoubleType, containsNull = false),
        containsNull = false), nullable = false)))

  /** Sketch-content twin of the udaf path for specs: fold `vs` through
    * update order then finish — must equal folding [[Kll.update]]. */
  private[graft] def foldForSpec(k: Int, vs: Seq[Double]): KllState = {
    val agg = KllSketchAgg(
      org.apache.spark.sql.catalyst.expressions.BoundReference(
        0, DoubleType, nullable = true), k)
    val buf = vs.foldLeft(agg.createAggregationBuffer()) { (b, v) =>
      agg.update(b, InternalRow(v))
    }
    buf.toState
  }
}
