package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream,
  DataOutputStream, EOFException, FileOutputStream, InputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.{CRC32C, GZIPInputStream, GZIPOutputStream}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** TFRecord export/ingest — the training-side boundary, the mirror of
  * the crawl-side Warc source: a curated corpus leaves this engine as
  * sharded `.tfrecord` files of `tf.train.Example` records, the
  * format TensorFlow/JAX input pipelines (`tf.data.TFRecordDataset`)
  * consume directly. Everything here is the PUBLIC format: TFRecord
  * framing (length ‖ masked-crc32c(length) ‖ payload ‖
  * masked-crc32c(payload), little-endian, mask = rotr(crc,15) +
  * 0xa282ead8 per the TensorFlow docs) and the protobuf wire format
  * for the three-arm `Example{Features{map<string,Feature>}}` message
  * (bytes_list / float_list / int64_list), hand-encoded — no protobuf
  * dependency, the messages involved are four nesting levels of
  * length-delimited fields and two packed scalar encodings.
  *
  * Integrity contract — WHY the CRCs are not the WARC end-the-iterator
  * contract: a truncated TAIL (a writer killed mid-record — EOF
  * before a full frame) ends that file's iterator deterministically
  * and keeps complete records, exactly like Warc/Npy; but a CRC
  * MISMATCH on a fully-present frame is detected corruption in a
  * format whose entire point is carrying those checksums, and it
  * THROWS — silently dropping the rest of a training shard is the
  * corruption no downstream check catches. (`tf.data` draws the same
  * line: DataLossError, not silent EOF.)
  *
  * Scale shape (the WARC doctrine): write is one file per partition,
  * streamed record-at-a-time off the partition iterator (constant
  * memory, no whole-partition buffering); read is FILE-level
  * parallelism via `binaryFiles` with a streaming frame parse, one
  * record buffered at a time, `maxRecord` capping a pathological
  * length word before allocation. `.tfrecord.gz` round-trips
  * transparently (gzip is whole-file here — record seeks are not a
  * TFRecord affordance anyway).
  *
  * Type mapping (write): STRING/BINARY → bytes_list, integral/BOOLEAN
  * → int64_list, FLOAT → float_list, arrays of those → multi-value
  * lists. DOUBLE is REJECTED loudly: Example has no double arm, and a
  * silent float32 downcast is precision corruption by default (the
  * Npy byte-swap lesson); cast explicitly to FLOAT to opt in. A null
  * cell writes NO feature for that name (the TF missing-feature
  * convention), and reads back as null.
  */
object TfRecord {

  /** One raw framed record, CRC-verified. */
  case class TfRaw(file: String, recIndex: Long, data: Array[Byte])

  val defaultMaxRecord: Int = 64 * 1024 * 1024

  // ---------------------------------------------------------------
  // framing
  // ---------------------------------------------------------------

  private def maskedCrc32c(b: Array[Byte], off: Int, len: Int): Int = {
    val c = new CRC32C
    c.update(b, off, len)
    val crc = c.getValue.toInt
    // rotr(crc, 15) + 0xa282ead8, all arithmetic mod 2^32
    ((crc >>> 15) | (crc << 17)) + 0xa282ead8
  }

  private def writeIntLE(out: DataOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >>> 8) & 0xff)
    out.write((v >>> 16) & 0xff); out.write((v >>> 24) & 0xff)
  }

  /** Frame one record onto `out`. */
  def writeFrame(out: DataOutputStream, data: Array[Byte]): Unit = {
    val lenBuf = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      .putLong(data.length.toLong).array()
    out.write(lenBuf)
    writeIntLE(out, maskedCrc32c(lenBuf, 0, 8))
    out.write(data)
    writeIntLE(out, maskedCrc32c(data, 0, data.length))
  }

  private def readIntLE(in: DataInputStream): Int = {
    val b = new Array[Byte](4); in.readFully(b)
    ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN).getInt
  }

  /** Streaming frame iterator: EOF mid-frame ends deterministically
    * (truncated-tail contract); a CRC mismatch on a complete frame
    * throws (detected corruption must not pass silently).
    */
  private def frameIterator(file: String, in: DataInputStream,
                            maxRecord: Int): Iterator[Array[Byte]] =
    new Iterator[Array[Byte]] {
      private var nextRec: Array[Byte] = _
      private var done = false
      private def advance(): Unit = {
        if (done || nextRec != null) return
        val lenBuf = new Array[Byte](8)
        val first = try { in.read() } catch { case _: EOFException => -1 }
        if (first < 0) { done = true; return }
        lenBuf(0) = first.toByte
        try {
          in.readFully(lenBuf, 1, 7)
          val lenCrc = readIntLE(in)
          if (lenCrc != maskedCrc32c(lenBuf, 0, 8))
            throw new IllegalStateException(
              s"$file: TFRecord length CRC mismatch — corrupt shard")
          val len = ByteBuffer.wrap(lenBuf).order(ByteOrder.LITTLE_ENDIAN)
            .getLong
          require(len >= 0 && len <= maxRecord,
            s"$file: TFRecord length $len outside [0, $maxRecord]")
          val data = new Array[Byte](len.toInt)
          in.readFully(data)
          val dataCrc = readIntLE(in)
          if (dataCrc != maskedCrc32c(data, 0, data.length))
            throw new IllegalStateException(
              s"$file: TFRecord data CRC mismatch — corrupt shard")
          nextRec = data
        } catch { case _: EOFException => done = true }
      }
      override def hasNext: Boolean = { advance(); nextRec != null }
      override def next(): Array[Byte] = {
        advance()
        val r = nextRec; nextRec = null; r
      }
    }

  // ---------------------------------------------------------------
  // protobuf wire helpers (public wire format: varint tags,
  // wire type 2 = length-delimited, 5 = 32-bit)
  // ---------------------------------------------------------------

  private def writeVarint(out: ArrayBuffer[Byte], v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0) {
      out += ((v & 0x7f) | 0x80).toByte
      v >>>= 7
    }
    out += (v & 0x7f).toByte
  }

  private def writeTag(out: ArrayBuffer[Byte], field: Int,
                       wire: Int): Unit =
    writeVarint(out, ((field << 3) | wire).toLong)

  private def writeDelimited(out: ArrayBuffer[Byte], field: Int,
                             body: ArrayBuffer[Byte]): Unit = {
    writeTag(out, field, 2)
    writeVarint(out, body.length.toLong)
    out ++= body
  }

  /** Feature message: field 1 bytes_list, 2 float_list, 3 int64_list;
    * each list message holds field 1 repeated values (bytes are each
    * length-delimited; floats/int64s packed).
    */
  private def encodeFeature(values: FeatureValues): ArrayBuffer[Byte] = {
    val list = new ArrayBuffer[Byte]()
    values match {
      case BytesValues(vs) =>
        vs.foreach { b =>
          writeTag(list, 1, 2); writeVarint(list, b.length.toLong)
          list ++= b
        }
      case FloatValues(vs) =>
        if (vs.nonEmpty) {
          val packed = new ArrayBuffer[Byte](vs.length * 4)
          val bb = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
          vs.foreach { f =>
            bb.clear(); bb.putFloat(f)
            packed ++= bb.array()
          }
          writeTag(list, 1, 2); writeVarint(list, packed.length.toLong)
          list ++= packed
        }
      case Int64Values(vs) =>
        if (vs.nonEmpty) {
          val packed = new ArrayBuffer[Byte]()
          vs.foreach(v => writeVarint(packed, v))
          writeTag(list, 1, 2); writeVarint(list, packed.length.toLong)
          list ++= packed
        }
    }
    val feat = new ArrayBuffer[Byte]()
    val arm = values match {
      case _: BytesValues => 1
      case _: FloatValues => 2
      case _: Int64Values => 3
    }
    writeDelimited(feat, arm, list)
    feat
  }

  sealed trait FeatureValues
  case class BytesValues(vs: Seq[Array[Byte]]) extends FeatureValues
  case class FloatValues(vs: Seq[Float]) extends FeatureValues
  case class Int64Values(vs: Seq[Long]) extends FeatureValues

  /** Encode one Example from (name → values); absent names are simply
    * not written (the missing-feature convention).
    */
  def encodeExample(feats: Seq[(String, FeatureValues)]): Array[Byte] = {
    val features = new ArrayBuffer[Byte]()
    feats.foreach { case (name, values) =>
      val entry = new ArrayBuffer[Byte]()
      val key = name.getBytes(UTF_8)
      writeTag(entry, 1, 2); writeVarint(entry, key.length.toLong)
      entry ++= key
      writeDelimited(entry, 2, encodeFeature(values))
      writeDelimited(features, 1, entry) // Features.feature map entry
    }
    val example = new ArrayBuffer[Byte]()
    writeDelimited(example, 1, features) // Example.features
    example.toArray
  }

  // -- decode --

  private class ProtoReader(val b: Array[Byte], var pos: Int,
                            val end: Int) {
    def hasMore: Boolean = pos < end
    def varint(): Long = {
      var shift = 0; var v = 0L
      var more = true
      while (more) {
        require(pos < end && shift < 64, "malformed varint")
        val x = b(pos) & 0xff; pos += 1
        v |= (x & 0x7fL) << shift
        shift += 7
        more = (x & 0x80) != 0
      }
      v
    }
    def skip(wire: Int): Unit = wire match {
      case 0 => varint()
      case 1 => pos += 8
      case 2 => val n = varint().toInt; pos += n
      case 5 => pos += 4
      case w => throw new IllegalStateException(s"bad wire type $w")
    }
    def delimited(): ProtoReader = {
      val n = varint().toInt
      require(pos + n <= end, "truncated message")
      val r = new ProtoReader(b, pos, pos + n)
      pos += n
      r
    }
  }

  /** Decode an Example into (name → values). Unknown fields skip per
    * proto rules; non-packed float/int64 encodings are accepted too
    * (both are legal on the wire).
    */
  def decodeExample(data: Array[Byte]): Map[String, FeatureValues] = {
    val out = Map.newBuilder[String, FeatureValues]
    val ex = new ProtoReader(data, 0, data.length)
    while (ex.hasMore) {
      val tag = ex.varint()
      if ((tag >> 3) == 1 && (tag & 7) == 2) {
        val features = ex.delimited()
        while (features.hasMore) {
          val ftag = features.varint()
          if ((ftag >> 3) == 1 && (ftag & 7) == 2) {
            val entry = features.delimited()
            var name: String = null
            var values: FeatureValues = null
            while (entry.hasMore) {
              val etag = entry.varint()
              (etag >> 3, (etag & 7).toInt) match {
                case (1, 2) =>
                  val k = entry.delimited()
                  name = new String(k.b, k.pos, k.end - k.pos, UTF_8)
                case (2, 2) => values = decodeFeature(entry.delimited())
                case (_, w) => entry.skip(w)
              }
            }
            if (name != null && values != null) out += name -> values
          } else features.skip((ftag & 7).toInt)
        }
      } else ex.skip((tag & 7).toInt)
    }
    out.result()
  }

  private def decodeFeature(r: ProtoReader): FeatureValues = {
    var result: FeatureValues = Int64Values(Nil)
    while (r.hasMore) {
      val tag = r.varint()
      ((tag >> 3).toInt, (tag & 7).toInt) match {
        case (1, 2) => // bytes_list
          val list = r.delimited()
          val vs = Seq.newBuilder[Array[Byte]]
          while (list.hasMore) {
            val t = list.varint()
            if ((t >> 3) == 1 && (t & 7) == 2) {
              val v = list.delimited()
              vs += java.util.Arrays.copyOfRange(v.b, v.pos, v.end)
            } else list.skip((t & 7).toInt)
          }
          result = BytesValues(vs.result())
        case (2, 2) => // float_list
          val list = r.delimited()
          val vs = Seq.newBuilder[Float]
          while (list.hasMore) {
            val t = list.varint()
            (t >> 3, (t & 7).toInt) match {
              case (1, 2) => // packed
                val p = list.delimited()
                val bb = ByteBuffer.wrap(p.b, p.pos, p.end - p.pos)
                  .order(ByteOrder.LITTLE_ENDIAN)
                while (bb.remaining() >= 4) vs += bb.getFloat()
              case (1, 5) => // unpacked fixed32
                val bb = ByteBuffer.wrap(list.b, list.pos, 4)
                  .order(ByteOrder.LITTLE_ENDIAN)
                vs += bb.getFloat(); list.pos += 4
              case (_, w) => list.skip(w)
            }
          }
          result = FloatValues(vs.result())
        case (3, 2) => // int64_list
          val list = r.delimited()
          val vs = Seq.newBuilder[Long]
          while (list.hasMore) {
            val t = list.varint()
            (t >> 3, (t & 7).toInt) match {
              case (1, 2) => // packed
                val p = list.delimited()
                while (p.hasMore) vs += p.varint()
              case (1, 0) => vs += list.varint() // unpacked
              case (_, w) => list.skip(w)
            }
          }
          result = Int64Values(vs.result())
        case (_, w) => r.skip(w)
      }
    }
    result
  }

  // ---------------------------------------------------------------
  // DataFrame sink / source
  // ---------------------------------------------------------------

  private def rowEncoder(schema: StructType)
      : Row => Seq[(String, FeatureValues)] = {
    val encs: Seq[(String, Int, Any => FeatureValues)] =
      schema.fields.zipWithIndex.map { case (f, i) =>
        val enc: Any => FeatureValues = f.dataType match {
          case StringType =>
            v => BytesValues(Seq(v.asInstanceOf[String].getBytes(UTF_8)))
          case BinaryType =>
            v => BytesValues(Seq(v.asInstanceOf[Array[Byte]]))
          case LongType => v => Int64Values(Seq(v.asInstanceOf[Long]))
          case IntegerType =>
            v => Int64Values(Seq(v.asInstanceOf[Int].toLong))
          case ShortType =>
            v => Int64Values(Seq(v.asInstanceOf[Short].toLong))
          case BooleanType =>
            v => Int64Values(Seq(if (v.asInstanceOf[Boolean]) 1L else 0L))
          case FloatType => v => FloatValues(Seq(v.asInstanceOf[Float]))
          case ArrayType(StringType, _) =>
            v => BytesValues(v.asInstanceOf[scala.collection.Seq[String]]
              .iterator.map(_.getBytes(UTF_8)).toSeq)
          case ArrayType(LongType, _) =>
            v => Int64Values(
              v.asInstanceOf[scala.collection.Seq[Long]].toSeq)
          case ArrayType(IntegerType, _) =>
            v => Int64Values(v.asInstanceOf[scala.collection.Seq[Int]]
              .iterator.map(_.toLong).toSeq)
          case ArrayType(FloatType, _) =>
            v => FloatValues(
              v.asInstanceOf[scala.collection.Seq[Float]].toSeq)
          case other => throw new IllegalArgumentException(
            s"TfRecord.write: column '${f.name}' has type $other — " +
              "Example carries bytes/int64/float32 lists only; DOUBLE " +
              "in particular must be cast to FLOAT explicitly (a " +
              "silent float32 downcast is precision corruption)")
        }
        (f.name, i, enc)
      }.toSeq
    row => encs.flatMap { case (name, i, enc) =>
      if (row.isNullAt(i)) None else Some(name -> enc(row.get(i)))
    }
  }

  /** Write `df` as one `part-NNNNN.tfrecord[.gz]` per partition under
    * `dir` (a local/shared filesystem directory; created if absent).
    * Streams record-at-a-time — constant memory per task.
    */
  def write(df: DataFrame, dir: String, gzip: Boolean = false): Unit = {
    val schema = df.schema
    val enc = rowEncoder(schema)
    new java.io.File(dir).mkdirs()
    df.rdd.mapPartitionsWithIndex { case (pid, it) =>
      val suffix = if (gzip) ".tfrecord.gz" else ".tfrecord"
      val file = new java.io.File(dir, f"part-$pid%05d$suffix")
      val raw = new FileOutputStream(file)
      val out = new DataOutputStream(new BufferedOutputStream(
        if (gzip) new GZIPOutputStream(raw, 1 << 16) else raw, 1 << 16))
      var n = 0L
      try {
        it.foreach { row =>
          writeFrame(out, encodeExample(enc(row)))
          n += 1
        }
      } finally out.close()
      Iterator.single(n)
    }.count()
    ()
  }

  /** Raw CRC-verified records over a path/glob of
    * `.tfrecord[.gz]` files.
    */
  def records(spark: SparkSession, path: String,
              maxRecord: Int = defaultMaxRecord): Dataset[TfRaw] = {
    import spark.implicits._
    spark.sparkContext.binaryFiles(path)
      .flatMap { case (file, pds) =>
        val raw = new BufferedInputStream(pds.open(), 1 << 16)
        val in = new DataInputStream(
          if (file.endsWith(".gz")) new GZIPInputStream(raw, 1 << 16)
          else raw)
        var i = -1L
        frameIterator(file, in, maxRecord).map { d =>
          i += 1; TfRaw(file, i, d)
        } ++ { in.close(); Iterator.empty }
      }
      .toDS()
  }

  /** Read Examples back into a DataFrame with the given schema: each
    * field name looks up its feature (null when absent), scalar
    * fields take the list's FIRST value, array fields take the whole
    * list. Supported: STRING/BINARY ← bytes, LONG ← int64, FLOAT ←
    * float, and arrays of each.
    */
  def read(spark: SparkSession, path: String, schema: StructType,
           maxRecord: Int = defaultMaxRecord): DataFrame = {
    val fields = schema.fields.map(f => (f.name, f.dataType))
    val rows = records(spark, path, maxRecord).rdd.map { rec =>
      val feats = decodeExample(rec.data)
      val cells: Array[Any] = fields.map { case (name, dt) =>
        feats.get(name) match {
          case None => null
          case Some(v) => (dt, v) match {
            case (StringType, BytesValues(vs)) =>
              vs.headOption.map(new String(_, UTF_8)).orNull
            case (BinaryType, BytesValues(vs)) => vs.headOption.orNull
            case (LongType, Int64Values(vs)) =>
              vs.headOption.map(Long.box).orNull
            case (FloatType, FloatValues(vs)) =>
              vs.headOption.map(Float.box).orNull
            case (ArrayType(StringType, _), BytesValues(vs)) =>
              vs.map(new String(_, UTF_8))
            case (ArrayType(BinaryType, _), BytesValues(vs)) => vs
            case (ArrayType(LongType, _), Int64Values(vs)) => vs
            case (ArrayType(FloatType, _), FloatValues(vs)) => vs
            case (other, got) => throw new IllegalArgumentException(
              s"TfRecord.read: field '$name' asks for $other but the " +
                s"record carries ${got.getClass.getSimpleName}")
          }
        }
      }
      Row.fromSeq(cells.toSeq)
    }
    spark.createDataFrame(rows, schema)
  }
}
