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
