package graft

import java.io.{BufferedOutputStream, File, FileOutputStream}
import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.WebDataset

/** WebDataset tar shard round-trips: ustar member framing, first-dot
  * sample grouping under the contiguity convention, truncation and
  * oversize contracts, and the string/binary-only sink rule.
  */
class WebDatasetSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-wd").toString

  test("tar members round-trip with padding at every size residue") {
    val dir = tmp()
    val f = new File(dir, "part-00000.tar")
    val out = new BufferedOutputStream(new FileOutputStream(f))
    // sizes 0, 1, 511, 512, 513 cross every padding case
    val sizes = Seq(0, 1, 511, 512, 513)
    sizes.zipWithIndex.foreach { case (n, i) =>
      WebDataset.writeEntry(out, s"m$i.bin",
        Array.tabulate[Byte](n)(j => (j % 251).toByte))
    }
    WebDataset.finish(out)
    out.close()
    val got = WebDataset.entries(spark, s"$dir/*.tar").collect()
      .sortBy(_.name)
    assert(got.map(_.name).toSeq === sizes.indices.map(i => s"m$i.bin"))
    got.zip(sizes).foreach { case (e, n) =>
      assert(e.bytes.length === n)
      assert(e.bytes.toSeq === Seq.tabulate(n)(j => (j % 251).toByte))
    }
  }

  test("samples group contiguous members by first-dot key") {
    val dir = tmp()
    val f = new File(dir, "part-00000.tar")
    val out = new BufferedOutputStream(new FileOutputStream(f))
    WebDataset.writeEntry(out, "a.txt", "alpha".getBytes("UTF-8"))
    WebDataset.writeEntry(out, "a.seg.png", Array[Byte](1, 2))
    WebDataset.writeEntry(out, "b.txt", "beta".getBytes("UTF-8"))
    WebDataset.finish(out)
    out.close()
    val got = WebDataset.samples(spark, s"$dir/*.tar").collect()
      .sortBy(_.key)
    assert(got.length === 2)
    assert(got(0).key === "a")
    assert(got(0).fields.keySet === Set("txt", "seg.png"),
      "extension is the remainder after the FIRST dot")
    assert(new String(got(0).fields("txt"), "UTF-8") === "alpha")
    assert(got(1).key === "b" && got(1).fields.keySet === Set("txt"))
  }

  test("dataframe write/read round-trip incl. gz, nulls write no member") {
    val schema = StructType(Seq(StructField("key", StringType),
      StructField("txt", StringType), StructField("blob", BinaryType)))
    val rows = Seq(
      Row("001", "hello ✓", Array[Byte](9, 8)),
      Row("002", null, Array[Byte](7)),
      Row("003", "three", null))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    for (gz <- Seq(false, true)) {
      val dir = tmp()
      WebDataset.write(df, "key", dir, gzip = gz)
      val glob = if (gz) s"$dir/*.tar.gz" else s"$dir/*.tar"
      val back = WebDataset.read(spark, glob, Seq("txt", "blob"))
        .collect().sortBy(_.getString(1))
      assert(back.length === 3)
      assert(new String(back(0).getAs[Array[Byte]](2), "UTF-8") ===
        "hello ✓")
      assert(back(0).getAs[Array[Byte]](3).toSeq === Seq[Byte](9, 8))
      assert(back(1).isNullAt(2), "null cell must not materialize")
      assert(back(2).isNullAt(3))
    }
  }

  test("truncated tail keeps complete samples; missing end blocks tolerated") {
    val dir = tmp()
    val f = new File(dir, "part-00000.tar")
    val out = new BufferedOutputStream(new FileOutputStream(f))
    WebDataset.writeEntry(out, "a.txt", "aaaa".getBytes("UTF-8"))
    WebDataset.writeEntry(out, "b.txt", ("b" * 600).getBytes("UTF-8"))
    WebDataset.finish(out)
    out.close()
    val full = Files.readAllBytes(f.toPath)
    // cut inside b's second payload block (1024 header+payload for a,
    // 512 header for b, then 600 bytes payload → cut at 1024+512+300)
    Files.write(f.toPath, java.util.Arrays.copyOfRange(full, 0, 1836))
    val got = WebDataset.samples(spark, s"$dir/*.tar").collect()
    assert(got.map(_.key).toSeq === Seq("a"))
    // and a tar with NO trailing zero blocks still yields its samples
    val f2 = new File(dir, "part-00001.tar")
    val out2 = new BufferedOutputStream(new FileOutputStream(f2))
    WebDataset.writeEntry(out2, "c.txt", "cc".getBytes("UTF-8"))
    out2.close()
    val got2 = WebDataset.samples(spark, s"$dir/part-00001.tar").collect()
    assert(got2.map(_.key).toSeq === Seq("c"))
  }

  test("oversized member skips but stays visible in truncated_fields") {
    val dir = tmp()
    val f = new File(dir, "part-00000.tar")
    val out = new BufferedOutputStream(new FileOutputStream(f))
    WebDataset.writeEntry(out, "a.txt", "small".getBytes("UTF-8"))
    WebDataset.writeEntry(out, "a.bin",
      Array.fill[Byte](2048)(1)) // over the 1 KiB cap below
    WebDataset.writeEntry(out, "b.txt", "next".getBytes("UTF-8"))
    WebDataset.finish(out)
    out.close()
    val got = WebDataset.samples(spark, s"$dir/*.tar", maxMember = 1024)
      .collect().sortBy(_.key)
    assert(got.length === 2)
    assert(got(0).fields.keySet === Set("txt"))
    assert(got(0).truncated_fields === Seq("bin"),
      "skipped member must stay visible")
    assert(new String(got(1).fields("txt"), "UTF-8") === "next",
      "stream stays aligned after the skip")
  }

  test("sink rejects non-string/binary columns loudly") {
    val df = spark.range(2).select(col("id").cast("string").as("key"),
      col("id").as("v"))
    val err = intercept[IllegalArgumentException] {
      WebDataset.write(df, "key", tmp())
    }
    assert(err.getMessage.contains("STRING or BINARY"))
  }

  test("interop: a tar written by an independent implementation parses") {
    // fixture authored by CPython's tarfile (USTAR_FORMAT): members
    // x.txt ('from python'), x.json ('{"a":1}'), y.txt ('second') —
    // pins our header walk against an implementation we didn't write
    val url = getClass.getResource("/graft/python-ustar.tar")
    assert(url != null, "fixture missing")
    val got = WebDataset.samples(spark, url.getPath).collect().sortBy(_.key)
    assert(got.map(_.key).toSeq === Seq("x", "y"))
    assert(got(0).fields.keySet === Set("txt", "json"))
    assert(new String(got(0).fields("txt"), "UTF-8") === "from python")
    assert(new String(got(0).fields("json"), "UTF-8") === """{"a":1}""")
    assert(new String(got(1).fields("txt"), "UTF-8") === "second")
  }

  test("end-to-end: documents subset through webdataset equals source") {
    val dir = tmp()
    val docs = graft.util.Tables.documents(spark, sfDir)
      .filter(expr("doc_id % 5 = 0"))
      .select(col("doc_id").cast("string").as("key"),
        col("text").as("txt"), col("lang"))
    WebDataset.write(docs.repartition(3), "key", dir)
    val back = WebDataset.read(spark, s"$dir/*.tar", Seq("txt", "lang"))
      .select(col("key").cast("long").as("doc_id"),
        decode(col("txt"), "UTF-8").as("text"),
        decode(col("lang"), "UTF-8").as("lang"))
    val a = graft.util.Tables.documents(spark, sfDir)
      .filter(expr("doc_id % 5 = 0")).select("doc_id", "text", "lang")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .toSet
    val b = back.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(a === b && a.nonEmpty)
  }

  test("image arm: bmp members survive the tar byte-for-byte and decode as real images") {
    import spark.implicits._
    val dir = tmp()
    // deterministic gradient images + LAION-style json metadata
    val rows = (0L until 6L).map { id =>
      val gray = (0 until 64).map(i => (id * 37 + i * 3).toInt % 256)
      (id.toString, graft.ops.Multimodal.buildBmp(8, 8, gray),
        s"""{"id":$id,"w":8,"h":8}""")
    }
    val df = rows.toDF("key", "bmp", "json")
    graft.sources.WebDataset.write(df.repartition(2), "key", dir)
    val back = graft.sources.WebDataset
      .read(spark, s"$dir/*.tar", Seq("bmp", "json"))
      .collect().map(r => (r.getString(1).toLong,
        r.getAs[Array[Byte]](2), new String(r.getAs[Array[Byte]](3), "UTF-8")))
    assert(back.length == 6)
    back.foreach { case (id, bmp, js) =>
      val expected = rows(id.toInt)
      assert(java.util.Arrays.equals(bmp, expected._2),
        s"sample $id image member corrupted in the tar layer")
      assert(js == expected._3)
      // the member is a REAL image: ImageIO decodes it with the
      // declared geometry and the top-left pixel's luma round-trips
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bmp))
      assert(img != null && img.getWidth == 8 && img.getHeight == 8)
      assert((img.getRGB(0, 0) & 0xff) == (id * 37).toInt % 256)
    }
  }
}
