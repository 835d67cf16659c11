package graft

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

import graft.sources.Npy

/** Npy source: hand-built NEP-1 fixtures both ways — the reader must
  * parse exactly what numpy writes, and reject exactly what it
  * cannot represent faithfully.
  */
class NpySpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-npy").toString

  /** Minimal NEP-1 v1.0 writer: header dict padded to 64 bytes. */
  private def npyBytes(descr: String, shape: Seq[Int], fortran: Boolean,
                       data: Array[Byte]): Array[Byte] = {
    val shapeStr =
      if (shape.length == 1) s"(${shape.head},)"
      else shape.mkString("(", ", ", ")")
    val dict = s"{'descr': '$descr', 'fortran_order': " +
      s"${if (fortran) "True" else "False"}, 'shape': $shapeStr, }"
    val total = 10 + dict.length + 1
    val pad = (64 - total % 64) % 64
    val header = dict + (" " * pad) + "\n"
    val out = ByteBuffer.allocate(10 + header.length + data.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    out.put(0x93.toByte).put("NUMPY".getBytes("ISO-8859-1"))
    out.put(1.toByte).put(0.toByte)
    out.putShort(header.length.toShort)
    out.put(header.getBytes("ISO-8859-1"))
    out.put(data)
    out.array()
  }

  private def f4Data(rows: Seq[Seq[Float]]): Array[Byte] = {
    val bb = ByteBuffer.allocate(rows.map(_.size).sum * 4)
      .order(ByteOrder.LITTLE_ENDIAN)
    rows.foreach(_.foreach(bb.putFloat))
    bb.array()
  }

  private def f8Data(rows: Seq[Seq[Double]]): Array[Byte] = {
    val bb = ByteBuffer.allocate(rows.map(_.size).sum * 8)
      .order(ByteOrder.LITTLE_ENDIAN)
    rows.foreach(_.foreach(bb.putDouble))
    bb.array()
  }

  test("npy vectors: f4 and f8 dumps round-trip with 0-based row ids") {
    val dir = tmp()
    val rows = Seq(Seq(1.0f, 2.0f, 3.0f), Seq(-0.5f, 0.0f, 4.25f))
    Files.write(Paths.get(s"$dir/a.npy"),
      npyBytes("<f4", Seq(2, 3), fortran = false, f4Data(rows)))
    Files.write(Paths.get(s"$dir/b.npy"),
      npyBytes("<f8", Seq(1, 3), fortran = false,
        f8Data(Seq(Seq(7.5, -1.25, 0.125)))))
    val got = Npy.vectors(spark, s"$dir/*.npy").collect()
      .map(v => (v.file.split('/').last, v.vec_id, v.embedding.toSeq))
      .sortBy(t => (t._1, t._2))
    assert(got.length == 3)
    assert(got(0) == (("a.npy", 0L, Seq(1.0f, 2.0f, 3.0f))))
    assert(got(1) == (("a.npy", 1L, Seq(-0.5f, 0.0f, 4.25f))))
    assert(got(2) == (("b.npy", 0L, Seq(7.5f, -1.25f, 0.125f))),
      "f8 downcasts to float")
  }

  test("npy: gz transparency, truncated tail keeps complete rows, scalars 1-D") {
    val dir = tmp()
    val full = npyBytes("<f4", Seq(3, 2), fortran = false,
      f4Data(Seq(Seq(1f, 2f), Seq(3f, 4f), Seq(5f, 6f))))
    // drop the last 4 bytes: row 2 is incomplete and must vanish
    Files.write(Paths.get(s"$dir/trunc.npy"), full.dropRight(4))
    val trunc = Npy.vectors(spark, s"$dir/trunc.npy").collect()
    assert(trunc.map(_.vec_id).sorted.toSeq == Seq(0L, 1L),
      "EOF mid-row ends the file's iterator after the complete rows")
    // gzip round-trip
    val gz = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(gz)
    g.write(full); g.close()
    Files.write(Paths.get(s"$dir/z.npy.gz"), gz.toByteArray)
    assert(Npy.vectors(spark, s"$dir/z.npy.gz").count() == 3)
    // 1-D scalars
    Files.write(Paths.get(s"$dir/s.npy"),
      npyBytes("<f8", Seq(4), fortran = false,
        f8Data(Seq(Seq(0.5, 1.5, -2.5, 3.5)))))
    val sc = Npy.scalars(spark, s"$dir/s.npy").collect().sortBy(_.idx)
    assert(sc.map(_.value).toSeq == Seq(0.5, 1.5, -2.5, 3.5))
  }

  test("npy: fortran order, wrong dtype, and wrong rank reject loudly") {
    val dir = tmp()
    Files.write(Paths.get(s"$dir/f.npy"),
      npyBytes("<f4", Seq(2, 2), fortran = true, f4Data(Seq(Seq(1f, 2f, 3f, 4f)))))
    val e1 = intercept[org.apache.spark.SparkException] {
      Npy.vectors(spark, s"$dir/f.npy").collect()
    }
    assert(e1.getMessage.contains("fortran"))
    Files.write(Paths.get(s"$dir/i.npy"),
      npyBytes("<i8", Seq(1, 2), fortran = false, new Array[Byte](16)))
    val e2 = intercept[org.apache.spark.SparkException] {
      Npy.vectors(spark, s"$dir/i.npy").collect()
    }
    assert(e2.getMessage.contains("unsupported npy dtype"))
    Files.write(Paths.get(s"$dir/one.npy"),
      npyBytes("<f4", Seq(4), fortran = false, f4Data(Seq(Seq(1f, 2f, 3f, 4f)))))
    val e3 = intercept[org.apache.spark.SparkException] {
      Npy.vectors(spark, s"$dir/one.npy").collect()
    }
    assert(e3.getMessage.contains("2-D"))
  }

  test("npy embeddings view feeds the sim operators end-to-end") {
    val dir = tmp()
    // 4 unit-ish vectors, two near-identical -> the dedup pair scan
    // must find exactly that pair through the npy path
    val rows = Seq(
      Seq(1.0f, 0.0f, 0.0f, 0.0f),
      Seq(0.999f, 0.001f, 0.0f, 0.0f),
      Seq(0.0f, 1.0f, 0.0f, 0.0f),
      Seq(0.0f, 0.0f, 1.0f, 0.0f))
    Files.write(Paths.get(s"$dir/e.npy"),
      npyBytes("<f4", Seq(4, 4), fortran = false, f4Data(rows)))
    val emb = Npy.embeddings(spark, s"$dir/e.npy")
    val pairs = graft.sim.Similarity.cosinePairs(emb, "embedding", "vec_id",
        threshold = 0.9, dim = Some(4))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((0L, 1L)), s"got $pairs")
    // hashed ids: deterministic, distinct across files
    val h = Npy.embeddings(spark, s"$dir/e.npy", hashIds = true)
      .select("vec_id").as[Long].collect()
    assert(h.distinct.length == 4 && h.forall(_ >= 0))
  }
}
