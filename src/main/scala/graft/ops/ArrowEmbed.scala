package graft.ops

import scala.jdk.CollectionConverters._

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector.{BigIntVector, Float4Vector, VarCharVector, VectorSchemaRoot}
import org.apache.arrow.vector.complex.FixedSizeListVector
import org.apache.arrow.vector.types.FloatingPointPrecision
import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema}
import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** The model-scoring seam: Spark rows → Arrow record batches → an
  * embedder → vectors, as a pipeline stage.
  *
  * A production corpus pipeline hands text to a Python model process
  * through exactly this boundary (PySpark's `mapInPandas`/`mapInArrow`
  * workers receive Arrow record batches of `maxRecordsPerBatch` rows
  * and answer with Arrow). The container has no Python worker, so the
  * embedder here is a pluggable JVM callee — but everything a model
  * swap would touch is real and spec-pinned: the input/output SCHEMA
  * CONTRACT (id: int64 + text: utf8 in; fixed_size_list<float32>[dim]
  * out, row-aligned), the fixed BATCH SHAPE (≤ maxBatchRows per call,
  * batches never cross partitions), the per-partition context
  * discipline (one embedder closure per partition, allocator lifetime
  * per batch — the Multimodal mapPartitions doctrine applied to
  * Arrow), and loud validation of a misbehaving callee (wrong row
  * count / wrong dim fail the stage, never silently misalign ids).
  *
  * Scale shape: map-only — no shuffle, no driver collect; output is
  * input rows + dim floats each. Partition sizing is the scan's
  * (`maxPartitionBytes`); batch size bounds the peak Arrow buffer at
  * maxBatchRows × (avg text + 4·dim) bytes per task.
  */
object ArrowEmbed {

  /** One model callee. Called once per Arrow batch with the input
    * batch root (schema [[inputSchema]]) and a pre-allocated output
    * root (schema [[outputSchema]]); must fill one `dim`-float vector
    * per input row, row-aligned, and set the output row count. */
  trait ArrowEmbedder extends Serializable {
    def dim: Int
    def embed(in: VectorSchemaRoot, out: VectorSchemaRoot): Unit
  }

  /** Input batch schema: (id int64 not-null, text utf8). */
  def inputSchema: Schema = new Schema(List(
    new Field("id", FieldType.notNullable(new ArrowType.Int(64, true)), null),
    new Field("text", FieldType.nullable(ArrowType.Utf8.INSTANCE), null)
  ).asJava)

  /** Output batch schema: (embedding fixed_size_list<float32>[dim]). */
  def outputSchema(dim: Int): Schema = new Schema(List(
    new Field("embedding",
      FieldType.notNullable(new ArrowType.FixedSizeList(dim)),
      List(new Field("item",
        FieldType.notNullable(
          new ArrowType.FloatingPoint(FloatingPointPrecision.SINGLE)),
        null)).asJava)
  ).asJava)

  /** Run `embedder` over `df` in Arrow batches of ≤ `maxBatchRows`
    * rows; returns (idCol, embedding array<float>). Null texts embed
    * as the empty string (a model worker sees "" where the corpus had
    * NULL — the cleaner's problem, not the seam's).
    */
  def embedStage(df: DataFrame, textCol: String, idCol: String,
                 embedder: ArrowEmbedder,
                 maxBatchRows: Int = 512): DataFrame = {
    require(maxBatchRows > 0, s"maxBatchRows must be positive, got $maxBatchRows")
    require(embedder.dim > 0, s"embedder dim must be positive, got ${embedder.dim}")
    // Validate the id up front: a lossy cast or a NULL id would
    // otherwise surface as a cryptic Dataset-decode failure deep in a
    // task (and pipeline `embed`'s join-back would silently drop the
    // row). Integral types cast to long losslessly; anything else is
    // refused at plan time with the stage and column named.
    val idType = df.schema(idCol).dataType
    require(
      Set[org.apache.spark.sql.types.DataType](
        org.apache.spark.sql.types.ByteType,
        org.apache.spark.sql.types.ShortType,
        org.apache.spark.sql.types.IntegerType,
        org.apache.spark.sql.types.LongType).contains(idType),
      s"embedStage: id column '$idCol' must be an integral type " +
        s"(byte/short/int/long), got ${idType.simpleString}")
    val dim = embedder.dim
    val spark = df.sparkSession
    import spark.implicits._
    val idL = col(idCol).cast("long")
    val typed = df.select(
      when(idL.isNull, raise_error(lit(
        s"embedStage: NULL id in column '$idCol' — every row entering " +
          "the embed seam needs a non-null id to join the vectors back")))
        .otherwise(idL),
      coalesce(col(textCol).cast("string"), lit("")))
      .as[(Long, String)]
    val out = typed.mapPartitions { it =>
      // one embedder context per partition (the closure), one
      // allocator per BATCH: leak-proof without an iterator-exhaustion
      // hook, and the peak off-heap footprint is a single batch
      it.grouped(maxBatchRows).flatMap { chunk =>
        val alloc = new RootAllocator()
        val inRoot = VectorSchemaRoot.create(inputSchema, alloc)
        val outRoot = VectorSchemaRoot.create(outputSchema(dim), alloc)
        try {
          val ids = inRoot.getVector("id").asInstanceOf[BigIntVector]
          val txt = inRoot.getVector("text").asInstanceOf[VarCharVector]
          inRoot.allocateNew()
          chunk.zipWithIndex.foreach { case ((id, t), i) =>
            ids.setSafe(i, id)
            txt.setSafe(i, t.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          }
          inRoot.setRowCount(chunk.size)
          embedder.embed(inRoot, outRoot)
          // the schema contract, validated where a silent mismatch
          // would misalign vectors with ids
          if (outRoot.getRowCount != chunk.size)
            throw new IllegalStateException(
              s"embedder returned ${outRoot.getRowCount} rows for a " +
                s"${chunk.size}-row batch")
          val fsl = outRoot.getVector("embedding") match {
            case v: FixedSizeListVector if v.getListSize == dim => v
            case v => throw new IllegalStateException(
              s"embedder output must be fixed_size_list<float32>[$dim], " +
                s"got ${v.getField.getType}[${v.getField.getChildren}]")
          }
          val data = fsl.getDataVector.asInstanceOf[Float4Vector]
          chunk.zipWithIndex.map { case ((id, _), i) =>
            if (fsl.isNull(i))
              throw new IllegalStateException(s"embedder left row $i null")
            (id, Array.tabulate(dim)(j => data.get(i * dim + j)))
          }.toVector
        } finally {
          inRoot.close(); outRoot.close(); alloc.close()
        }
      }
    }(Encoders.product[(Long, Array[Float])])
    out.toDF(idCol, "embedding")
  }

  /** Deterministic stub embedder: component j of a text's vector is
    * (portableHash64("emb:j:" ++ text) mod 1000) / 1000 — the same
    * md5-derived arithmetic the whole repo hashes with, so the DuckDB
    * oracle replays the "model" exactly and the gate proves the TEXT
    * BYTES crossed the Arrow boundary intact (any UTF-8 mangling in
    * the VarChar round-trip splits the hash). Each component is
    * m/1000 with m < 1000: exactly recoverable from float32 via
    * round(f·1000), which is what the gated query emits.
    */
  class HashStubEmbedder(val dim: Int) extends ArrowEmbedder {
    def embed(in: VectorSchemaRoot, out: VectorSchemaRoot): Unit = {
      val txt = in.getVector("text").asInstanceOf[VarCharVector]
      val fsl = out.getVector("embedding").asInstanceOf[FixedSizeListVector]
      fsl.allocateNew()
      val data = fsl.getDataVector.asInstanceOf[Float4Vector]
      val n = in.getRowCount
      var i = 0
      while (i < n) {
        val t = if (txt.isNull(i)) ""
          else new String(txt.get(i), java.nio.charset.StandardCharsets.UTF_8)
        fsl.setNotNull(i)
        var j = 0
        while (j < dim) {
          val m = graft.util.Hashing.portableHash64Const(s"emb:$j:$t") % 1000L
          data.setSafe(i * dim + j, m.toFloat / 1000f)
          j += 1
        }
        i += 1
      }
      out.setRowCount(n)
    }
  }
}
