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

  test("half-precision conversions match IEEE binary16/bfloat16 arithmetic") {
    // exact values survive, RNE ties go to even, specials stay special
    assert(Safetensors.f16ToFloat(Safetensors.floatToF16(1.5f)) == 1.5f)
    assert(Safetensors.f16ToFloat(Safetensors.floatToF16(-0.09375f)) == -0.09375f)
    assert(Safetensors.floatToF16(65504f) == 0x7bff.toShort, "f16 max")
    assert(Safetensors.floatToF16(65520f) == 0x7c00.toShort, "overflow → +Inf")
    assert(Safetensors.floatToF16(Float.NegativeInfinity) == 0xfc00.toShort)
    assert(java.lang.Float.isNaN(
      Safetensors.f16ToFloat(Safetensors.floatToF16(Float.NaN))))
    // smallest f16 subnormal is 2^-24; half of it ties to even → 0
    assert(Safetensors.f16ToFloat(Safetensors.floatToF16(
      math.pow(2, -24).toFloat)) == math.pow(2, -24).toFloat)
    assert(Safetensors.floatToF16(math.pow(2, -25).toFloat) == 0.toShort)
    // RNE on the mantissa boundary: 1 + 2^-11 ties back to 1.0
    assert(Safetensors.f16ToFloat(Safetensors.floatToF16(
      1f + math.pow(2, -11).toFloat)) == 1.0f)
    // bf16 is the float's top half: exact for values with ≤7 mantissa bits
    assert(Safetensors.bf16ToFloat(Safetensors.floatToBf16(1.625f)) == 1.625f)
    val bf = Safetensors.bf16ToFloat(Safetensors.floatToBf16(-3e38f))
    assert(bf < 0 && !bf.isInfinite &&
      math.abs(bf / -3e38f - 1.0) < 1.0 / 128,
      s"bf16 keeps the float exponent range, rounding the mantissa: $bf")
    assert(Safetensors.floatToBf16(Float.PositiveInfinity) == 0x7f80.toShort)
    assert(java.lang.Float.isNaN(
      Safetensors.bf16ToFloat(Safetensors.floatToBf16(Float.NaN))))
  }

  test("F16 and BF16 files round-trip to the quantized values, byte-stably") {
    for (dt <- Seq("F16", "BF16")) {
      val dir = tmp()
      val rows = (0L until 97L).map(i =>
        (i, Seq.tabulate(6)(j => (i * 31 + j).toFloat / 11f - 60f)))
      Safetensors.write(rows.toDF("vec_id", "embedding").repartition(3),
        dir, "vec_id", "embedding", dtype = dt)
      val back = Safetensors.read(spark, s"$dir/*.safetensors",
          "vec_id", "embedding")
        .as[(Long, Seq[Float])].collect().toMap
      assert(back.size == 97)
      val quant: Float => Float =
        if (dt == "F16") x => Safetensors.f16ToFloat(Safetensors.floatToF16(x))
        else x => Safetensors.bf16ToFloat(Safetensors.floatToBf16(x))
      rows.foreach { case (id, v) =>
        assert(back(id) == v.map(quant),
          s"$dt vector $id must read back as its quantized image") }
      // write→read→write is byte-identical: the read floats are exactly
      // representable, so re-encoding reproduces the same bits
      val dir2 = tmp()
      Safetensors.write(
        Safetensors.read(spark, s"$dir/*.safetensors", "vec_id", "embedding")
          .coalesce(1),
        dir2, "vec_id", "embedding", dtype = dt)
      def allBytes(d: String): Map[Long, Seq[Float]] =
        Safetensors.read(spark, s"$d/*.safetensors", "vec_id", "embedding")
          .as[(Long, Seq[Float])].collect().toMap
      assert(allBytes(dir2) == allBytes(dir), s"$dt re-export must not drift")
      val f2 = new java.io.File(dir2).listFiles()
        .filter(_.getName.endsWith(".safetensors"))
      assert(f2.length == 1)
      val dir3 = tmp()
      Safetensors.write(
        Safetensors.read(spark, s"$dir2/*.safetensors", "vec_id", "embedding")
          .coalesce(1),
        dir3, "vec_id", "embedding", dtype = dt)
      val f3 = new java.io.File(dir3).listFiles()
        .filter(_.getName.endsWith(".safetensors"))
      // byte fidelity between two single-partition re-exports; row order
      // within one partition is stable under coalesce(1) of the same read
      assert(java.util.Arrays.equals(Files.readAllBytes(f2.head.toPath),
        Files.readAllBytes(f3.head.toPath)),
        s"$dt write→read→write must be byte-identical")
    }
  }

  test("reader widens a foreign F16 file with the id tensor laid out FIRST") {
    val dir = tmp()
    val ids = Seq(3L, 4L)
    val vecs = Seq(Seq(1.5f, -2.0f), Seq(0.25f, 4.0f)) // exact in f16
    val iBytes = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
    ids.foreach(iBytes.putLong)
    val vBytes = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
    vecs.flatten.foreach(x => vBytes.putShort(Safetensors.floatToF16(x)))
    val header = ("""{"vec_id":{"dtype":"I64","shape":[2],"data_offsets":[0,16]},""" +
      """"embedding":{"dtype":"F16","shape":[2,2],"data_offsets":[16,24]}}""")
      .getBytes(UTF_8)
    val out = ByteBuffer.allocate(8 + header.length + 24)
      .order(ByteOrder.LITTLE_ENDIAN)
    out.putLong(header.length.toLong).put(header)
      .put(iBytes.array()).put(vBytes.array())
    Files.write(Paths.get(dir, "foreign16.safetensors"), out.array())
    val got = Safetensors.read(spark, s"$dir/*.safetensors",
        "vec_id", "embedding")
      .as[(Long, Seq[Float])].collect().toMap
    assert(got == Map(3L -> Seq(1.5f, -2.0f), 4L -> Seq(0.25f, 4.0f)))
  }

  test("a failed write leaks neither partition temps nor a partial final file") {
    def tmpCount(): Int = new java.io.File(
        System.getProperty("java.io.tmpdir")).listFiles()
      .count(f => f.getName.startsWith("st-v-") || f.getName.startsWith("st-i-"))
    val before = tmpCount()
    val dir = tmp()
    intercept[org.apache.spark.SparkException] {
      Safetensors.write(
        Seq((1L, Seq(1f, 2f)), (2L, Seq(1f, 2f, 3f)))
          .toDF("vec_id", "embedding").coalesce(1), dir,
        "vec_id", "embedding")
    }
    assert(tmpCount() == before,
      "the iteration-phase throw must delete both executor temp files")
    assert(new java.io.File(dir).listFiles().isEmpty,
      "no partial .safetensors or staging .tmp may land in the output dir")
    // partial consumption closes cleanly too (read is eager per file)
    val ok = tmp()
    Safetensors.write((0L until 10L).map(i => (i, Seq(i.toFloat)))
      .toDF("vec_id", "embedding").coalesce(1), ok, "vec_id", "embedding")
    assert(Safetensors.read(spark, s"$ok/*.safetensors",
      "vec_id", "embedding").limit(1).count() == 1L)
  }
}
