package graft

import java.io.{DataOutputStream, File, FileOutputStream}
import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.TfRecord
import graft.sources.TfRecord._

/** TFRecord framing + hand-coded Example wire format: round-trips,
  * the truncated-tail vs CRC-corruption contract split, type-mapping
  * rejections, and wire-level acceptance of both packed and unpacked
  * scalar encodings.
  */
class TfRecordSpec extends SparkSpec {

  private def tmp(): String =
    Files.createTempDirectory("graft-tfr").toString

  private val docsSchema = StructType(Seq(
    StructField("id", LongType),
    StructField("text", StringType),
    StructField("score", FloatType),
    StructField("toks", ArrayType(LongType)),
    StructField("emb", ArrayType(FloatType)),
    StructField("tags", ArrayType(StringType)),
    StructField("blob", BinaryType)))

  private def sampleRows: Seq[Row] = Seq(
    Row(1L, "hello world", 1.5f, Seq(1L, 2L, 3L), Seq(0.25f, -2f),
      Seq("a", "b"), Array[Byte](0, 1, 2, -1)),
    Row(2L, "héllo ünïcode ✓", -0.125f, Seq.empty[Long],
      Seq.empty[Float], Seq.empty[String], Array.empty[Byte]),
    Row(3L, null, null, null, null, null, null))

  test("example encode/decode round-trips all three arms") {
    val ex = encodeExample(Seq(
      "s" -> BytesValues(Seq("abc".getBytes("UTF-8"))),
      "i" -> Int64Values(Seq(0L, 1L, -1L, Long.MaxValue, Long.MinValue)),
      "f" -> FloatValues(Seq(1.0f, -0.5f, Float.MinPositiveValue))))
    val back = decodeExample(ex)
    assert(new String(back("s").asInstanceOf[BytesValues].vs.head,
      "UTF-8") === "abc")
    assert(back("i").asInstanceOf[Int64Values].vs ===
      Seq(0L, 1L, -1L, Long.MaxValue, Long.MinValue))
    assert(back("f").asInstanceOf[FloatValues].vs ===
      Seq(1.0f, -0.5f, Float.MinPositiveValue))
    assert(!back.contains("missing"))
  }

  test("dataframe round-trip: scalars, arrays, unicode, nulls") {
    val dir = tmp()
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(sampleRows, 2), docsSchema)
    TfRecord.write(df, dir)
    val back = TfRecord.read(spark, s"$dir/*.tfrecord", docsSchema)
      .collect().sortBy(_.getLong(0))
    assert(back.length === 3)
    assert(back(0).getString(1) === "hello world")
    assert(back(0).getFloat(2) === 1.5f)
    assert(back(0).getSeq[Long](3) === Seq(1L, 2L, 3L))
    assert(back(0).getSeq[Float](4) === Seq(0.25f, -2f))
    assert(back(0).getSeq[String](5) === Seq("a", "b"))
    assert(back(0).getAs[Array[Byte]](6).toSeq === Seq[Byte](0, 1, 2, -1))
    assert(back(1).getString(1) === "héllo ünïcode ✓")
    // null cells wrote no feature and read back null; empty lists are
    // PRESENT features with zero values — for the bytes arm that
    // distinction survives the wire; packed empty scalar lists write
    // no bytes, so they read back as feature-present empty lists too
    assert(back(2).isNullAt(1) && back(2).isNullAt(2))
    assert(back(2).isNullAt(3) || back(2).getSeq[Long](3).isEmpty)
  }

  test("gzip shards round-trip") {
    val dir = tmp()
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(sampleRows.take(2), 1), docsSchema)
    TfRecord.write(df, dir, gzip = true)
    val back = TfRecord.read(spark, s"$dir/*.tfrecord.gz", docsSchema)
    assert(back.count() === 2)
  }

  test("truncated tail keeps complete records, ends deterministically") {
    val dir = tmp()
    val recs = Seq("one", "two", "three").map(s =>
      encodeExample(Seq("t" -> BytesValues(Seq(s.getBytes("UTF-8"))))))
    val f = new File(dir, "part-00000.tfrecord")
    val out = new DataOutputStream(new FileOutputStream(f))
    recs.foreach(r => TfRecord.writeFrame(out, r))
    out.close()
    val full = Files.readAllBytes(f.toPath)
    // cut mid-way through the THIRD record's payload
    val cut = full.length - recs(2).length / 2 - 4
    Files.write(f.toPath, java.util.Arrays.copyOfRange(full, 0, cut))
    val schema = StructType(Seq(StructField("t", StringType)))
    val back = TfRecord.read(spark, s"$dir/*.tfrecord", schema)
      .collect().map(_.getString(0)).sorted
    assert(back.toSeq === Seq("one", "two"))
  }

  test("CRC corruption on a complete frame throws, not silent EOF") {
    val dir = tmp()
    val recs = Seq("aaaa", "bbbb").map(s =>
      encodeExample(Seq("t" -> BytesValues(Seq(s.getBytes("UTF-8"))))))
    val f = new File(dir, "part-00000.tfrecord")
    val out = new DataOutputStream(new FileOutputStream(f))
    recs.foreach(r => TfRecord.writeFrame(out, r))
    out.close()
    val bytes = Files.readAllBytes(f.toPath)
    bytes(14) = (bytes(14) ^ 0x01).toByte // inside record 0's payload
    Files.write(f.toPath, bytes)
    val schema = StructType(Seq(StructField("t", StringType)))
    val err = intercept[org.apache.spark.SparkException] {
      TfRecord.read(spark, s"$dir/*.tfrecord", schema).collect()
    }
    assert(err.getMessage.contains("CRC") ||
      Option(err.getCause).exists(_.getMessage.contains("CRC")))
  }

  test("DOUBLE columns reject loudly at write") {
    val df = spark.range(3).select(col("id"),
      (col("id") * 1.5).as("d"))
    val err = intercept[IllegalArgumentException] {
      TfRecord.write(df, tmp())
    }
    assert(err.getMessage.contains("FLOAT"))
  }

  test("unpacked int64/float wire encodings are accepted on read") {
    // hand-encode a Feature with UNPACKED values (legal proto wire):
    // int64_list { value: 7 value: 9 } as two varint fields
    val entryName = "x".getBytes("UTF-8")
    def varint(out: collection.mutable.ArrayBuffer[Byte], v0: Long)
        : Unit = {
      var v = v0
      while ((v & ~0x7fL) != 0) {
        out += ((v & 0x7f) | 0x80).toByte; v >>>= 7
      }
      out += (v & 0x7f).toByte
    }
    val int64List = collection.mutable.ArrayBuffer[Byte]()
    varint(int64List, (1 << 3) | 0); varint(int64List, 7L)
    varint(int64List, (1 << 3) | 0); varint(int64List, 9L)
    val feature = collection.mutable.ArrayBuffer[Byte]()
    varint(feature, (3 << 3) | 2); varint(feature, int64List.length.toLong)
    feature ++= int64List
    val entry = collection.mutable.ArrayBuffer[Byte]()
    varint(entry, (1 << 3) | 2); varint(entry, entryName.length.toLong)
    entry ++= entryName
    varint(entry, (2 << 3) | 2); varint(entry, feature.length.toLong)
    entry ++= feature
    val features = collection.mutable.ArrayBuffer[Byte]()
    varint(features, (1 << 3) | 2); varint(features, entry.length.toLong)
    features ++= entry
    val example = collection.mutable.ArrayBuffer[Byte]()
    varint(example, (1 << 3) | 2); varint(example, features.length.toLong)
    example ++= features
    val got = decodeExample(example.toArray)
    assert(got("x").asInstanceOf[Int64Values].vs === Seq(7L, 9L))
  }

  test("end-to-end: documents subset through tfrecord equals source") {
    val dir = tmp()
    val docs = graft.util.Tables.documents(spark, sfDir)
      .filter(expr("doc_id % 5 = 0"))
      .select(col("doc_id"), col("lang"), col("text"))
    TfRecord.write(docs.repartition(3), dir)
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("lang", StringType),
      StructField("text", StringType)))
    val back = TfRecord.read(spark, s"$dir/*.tfrecord", schema)
    val a = docs.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getString(2))).toSet
    val b = back.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(a === b && a.nonEmpty)
  }
}
