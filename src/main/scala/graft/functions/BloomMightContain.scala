package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Predicate, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Executor-side view of a broadcast Bloom filter.
  *
  * Holds only the `Broadcast` handle (a few bytes in the task binary);
  * the bitset itself ships ONCE per executor through the broadcast
  * mechanism and is deserialized lazily on first probe. This is the
  * piece a plain closure-captured filter gets wrong: the closure
  * serializes the whole bitset into every task binary (Spark's
  * "Broadcasting large task binary" warning), re-shipping ~1 MB per
  * stage instead of once per executor.
  */
class BloomProbe(bytes: Broadcast[Array[Byte]]) extends Serializable {
  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes.value))
  def containsLong(k: Long): Boolean = bloom.mightContainLong(k)
  // BloomFilter.putString hashes the UTF-8 bytes, which is exactly what
  // UTF8String already holds — probe the bytes, skip the String round-trip
  def containsUtf8(s: UTF8String): Boolean = bloom.mightContainBinary(s.getBytes)
}

/** Native `might_contain` probe against a broadcast Bloom filter.
  *
  * Generates a single virtual call inside whole-stage codegen — no row
  * allocation, no UDF boundary (a Scala UDF forces an extra
  * serialization fence and keeps the filter out of the codegen'd scan
  * stage). Mirrors the probe half of Spark's own runtime-filter pair
  * (`BloomFilterMightContain`), but reads the filter from an explicit
  * broadcast instead of embedding the bitset in the plan, so the task
  * binary stays small.
  */
case class BloomMightContain(child: Expression, probe: BloomProbe)
    extends UnaryExpression with Predicate {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint or string key, got ${other.simpleString}")
  }

  override def prettyName: String = "graft_bloom_might_contain"

  override def nullSafeEval(v: Any): Any = child.dataType match {
    case LongType => probe.containsLong(v.asInstanceOf[Long])
    case _        => probe.containsUtf8(v.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloomProbe", probe, classOf[BloomProbe].getName)
    val method = if (child.dataType == LongType) "containsLong" else "containsUtf8"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.$method($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}
