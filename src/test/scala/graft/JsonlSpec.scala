package graft

import java.nio.file.Files
import java.util.zip.GZIPInputStream

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSONL.gz boundary: RFC 8259 escaping, round-trip through Spark's
  * independent parser, raw-byte shard inspection, failure modes.
  */
class JsonlSpec extends SparkSpec {
  import graft.sources.Jsonl

  test("escape: the five RFC 8259 classes, raw UTF-8 passthrough") {
    assert(Jsonl.escape("""say "hi"""") === """say \"hi\"""")
    assert(Jsonl.escape("""back\slash""") === """back\\slash""")
    assert(Jsonl.escape("a\tb\nc\rd\be\ff") === """a\tb\nc\rd\be\ff""")
    assert(Jsonl.escape("ctl\u0001\u001f") === "ctl" + "\\u0001" + "\\u001f")
    assert(Jsonl.escape("uni é✓ь") === "uni é✓ь")
    assert(Jsonl.escape("plain words") === "plain words")
  }

  test("round-trip: hostile strings, nulls, booleans survive Spark's parser bit-for-bit") {
    import spark.implicits._
    val dir = Files.createTempDirectory("jsonl_rt").toString
    val rows = Seq(
      (1L, """say "hi" to\everyone""", java.lang.Boolean.TRUE),
      (2L, "tab\there\nnewlinectl", java.lang.Boolean.FALSE),
      (3L, "uni é✓ь", null.asInstanceOf[java.lang.Boolean]),
      (4L, null.asInstanceOf[String], java.lang.Boolean.TRUE))
    val df = rows.toDF("id", "text", "flag")
    Jsonl.write(df.repartition(2), dir)
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("text", StringType), StructField("flag", BooleanType)))
    val back = Jsonl.read(spark, s"$dir/*.jsonl.gz", schema)
      .as[(Long, String, Option[Boolean])].collect().sortBy(_._1).toSeq
    assert(back === rows.map(t => (t._1, t._2,
      Option(t._3).map(_.booleanValue))))
  }

  test("shard bytes: one object per line, escapes literally present in the gz payload") {
    import spark.implicits._
    val dir = Files.createTempDirectory("jsonl_raw").toString
    Jsonl.write(Seq((7L, "a\"b\\c\nd")).toDF("id", "t").coalesce(1), dir)
    val f = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".jsonl.gz")).head
    val raw = new String(
      new GZIPInputStream(new java.io.FileInputStream(f)).readAllBytes(),
      "UTF-8")
    assert(raw === "{\"id\":7,\"t\":\"a\\\"b\\\\c\\nd\"}\n")
  }

  test("task commit: a simulated speculative twin attempt never interleaves a shard") {
    // Two attempts of the SAME partition racing (the speculation shape a
    // 100 TB cluster produces): each writes its own _tmp file, each
    // commits by atomic rename, last-rename-wins leaves ONE final shard
    // byte-identical to a single-attempt write — never an interleaved gz.
    val dir = Files.createTempDirectory("jsonl_spec").toString
    val lines = (0 until 500).map(i => s"""{"id":$i,"t":"row $i"}""")
    val single = Files.createTempDirectory("jsonl_single").toString
    Jsonl.writeShard(single, 0, 0L, lines.iterator)
    val expect = Files.readAllBytes(
      new java.io.File(single, "part-00000.jsonl.gz").toPath)
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    val threads = Seq(1L, 2L).map { att =>
      new Thread(() => {
        barrier.await() // maximize overlap of the two attempts
        Jsonl.writeShard(dir, 0, att, lines.iterator)
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    val files = new java.io.File(dir).listFiles().map(_.getName).sorted
    assert(files.toSeq === Seq("part-00000.jsonl.gz"), files.mkString(","))
    val got = Files.readAllBytes(
      new java.io.File(dir, "part-00000.jsonl.gz").toPath)
    assert(java.util.Arrays.equals(got, expect),
      "racing attempts must commit a byte-identical shard")
    // and the committed shard parses clean end-to-end
    val raw = new String(new GZIPInputStream(
      new java.io.FileInputStream(new java.io.File(dir, files.head)))
      .readAllBytes(), "UTF-8")
    assert(raw === lines.mkString("", "\n", "\n"))
  }

  test("task commit: a failed attempt leaves no partial shard; write() sweeps temps") {
    import spark.implicits._
    val dir = Files.createTempDirectory("jsonl_fail").toString
    val boom = new Iterator[String] {
      private var n = 0
      def hasNext = true
      def next(): String = {
        n += 1
        if (n > 3) throw new IllegalStateException("mid-shard crash")
        s"""{"id":$n}"""
      }
    }
    intercept[IllegalStateException] { Jsonl.writeShard(dir, 0, 7L, boom) }
    assert(new java.io.File(dir).listFiles().isEmpty,
      "failed attempt must delete its temp and commit nothing")
    // write() end-to-end still produces only final shards (no _tmp-)
    Jsonl.write(Seq((1L, "a"), (2L, "b")).toDF("id", "t").repartition(2), dir)
    val names = new java.io.File(dir).listFiles().map(_.getName).sorted.toSeq
    assert(names === Seq("part-00000.jsonl.gz", "part-00001.jsonl.gz"), names)
  }

  test("unsupported column types are rejected loudly; corrupt shards FAILFAST") {
    import spark.implicits._
    val dir = Files.createTempDirectory("jsonl_bad").toString
    val e = intercept[IllegalArgumentException] {
      Jsonl.write(Seq((1L, 0.5)).toDF("id", "score"), dir)
    }
    assert(e.getMessage.contains("score"))
    // corrupt line: truncated JSON inside a valid gzip member
    val f = new java.io.File(dir, "part-00000.jsonl.gz")
    val out = new java.util.zip.GZIPOutputStream(
      new java.io.FileOutputStream(f))
    out.write("{\"id\":1,\"t\":\"ok\"}\n{\"id\":2,\"t\":\"trunc".getBytes("UTF-8"))
    out.close()
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("t", StringType)))
    assertThrows[org.apache.spark.SparkException] {
      Jsonl.read(spark, s"$dir/*.jsonl.gz", schema).collect()
    }
  }
}
