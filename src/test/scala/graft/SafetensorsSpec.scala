package graft

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

import graft.sources.Safetensors

/** safetensors container: round-trip fidelity, the foreign-layout
  * read path (hand-built file with tensors in the other offset
  * order), and the loud-rejection contract for truncation / ragged
  * rows / wrong dtypes.
  */
class SafetensorsSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-st").toString

  test("write/read round-trips ids and float vectors bit-exactly across partitions") {
    val dir = tmp()
    val rows = (0L until 257L).map(i =>
      (i, Seq.tabulate(8)(j => (i * 13 + j).toFloat / 7f)))
    Safetensors.write(rows.toDF("vec_id", "embedding").repartition(5),
      dir, "vec_id", "embedding")
    val back = Safetensors.read(spark, s"$dir/*.safetensors",
        "vec_id", "embedding")
      .as[(Long, Seq[Float])].collect().toMap
    assert(back.size == 257)
    rows.foreach { case (id, v) =>
      assert(back(id) == v, s"vector $id must round-trip bit-exactly") }
  }

  test("reader handles a foreign file with the id tensor laid out FIRST") {
    // this writer puts vectors first; the spec says offsets are
    // arbitrary as long as they tile the buffer — build the other
    // order by hand and the reader must slice it correctly
    val dir = tmp()
    val ids = Seq(7L, 8L)
    val vecs = Seq(Seq(1.5f, -2.0f), Seq(0.25f, 4.0f))
    val iBytes = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
    ids.foreach(iBytes.putLong)
    val vBytes = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
    vecs.flatten.foreach(vBytes.putFloat)
    val header = ("""{"vec_id":{"dtype":"I64","shape":[2],"data_offsets":[0,16]},""" +
      """"embedding":{"dtype":"F32","shape":[2,2],"data_offsets":[16,32]}}""")
      .getBytes(UTF_8)
    val out = ByteBuffer.allocate(8 + header.length + 32)
      .order(ByteOrder.LITTLE_ENDIAN)
    out.putLong(header.length.toLong).put(header)
      .put(iBytes.array()).put(vBytes.array())
    Files.write(Paths.get(dir, "foreign.safetensors"), out.array())
    val got = Safetensors.read(spark, s"$dir/*.safetensors",
        "vec_id", "embedding")
      .as[(Long, Seq[Float])].collect().toMap
    assert(got == Map(7L -> Seq(1.5f, -2.0f), 8L -> Seq(0.25f, 4.0f)))
  }

  test("truncated file, wrong dtype, and ragged writes all throw loudly") {
    val dir = tmp()
    Safetensors.write(Seq((1L, Seq(1f, 2f))).toDF("vec_id", "embedding")
      .coalesce(1), dir, "vec_id", "embedding")
    val f = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".safetensors")).head
    val bytes = Files.readAllBytes(f.toPath)
    // truncate mid data buffer
    val dir2 = tmp()
    Files.write(Paths.get(dir2, "cut.safetensors"),
      bytes.take(bytes.length - 5))
    val e1 = intercept[org.apache.spark.SparkException] {
      Safetensors.read(spark, s"$dir2/*.safetensors",
        "vec_id", "embedding").count()
    }
    assert(e1.getMessage.contains("truncated") ||
      Option(e1.getCause).exists(_.getMessage.contains("truncated")))
    // wrong dtype: ask for a tensor the header types differently
    val e2 = intercept[org.apache.spark.SparkException] {
      Safetensors.read(spark, s"$dir/*.safetensors",
        "embedding", "vec_id").count() // swapped: vec as I64, id as F32
    }
    assert(e2.getMessage.contains("dtype") ||
      Option(e2.getCause).exists(_.getMessage.contains("dtype")))
    // ragged vectors refuse to write (a skipped row would desync ids)
    val e3 = intercept[org.apache.spark.SparkException] {
      Safetensors.write(
        Seq((1L, Seq(1f, 2f)), (2L, Seq(1f, 2f, 3f)))
          .toDF("vec_id", "embedding").coalesce(1), tmp(),
        "vec_id", "embedding")
    }
    assert(e3.getMessage.contains("ragged") ||
      Option(e3.getCause).exists(_.getMessage.contains("ragged")))
  }
}
