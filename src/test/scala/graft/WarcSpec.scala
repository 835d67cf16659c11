package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path}

import graft.sources.Warc

/** WARC / WET source (SURVEY §2 C27): fixture-pinned both ways —
  * build the bytes by hand from the ISO 28500 grammar, read them back
  * through the Spark source, assert every envelope field; plus the
  * degradation contracts (oversized skip, malformed tail, multi-member
  * gzip) that make the reader safe on real crawl shards.
  */
class WarcSpec extends SparkSpec {

  /** One WARC record with CRLF line discipline + the two-CRLF
    * record separator ISO 28500 mandates.
    */
  private def record(warcType: String, recordId: String, uri: String,
                     date: String, contentType: String,
                     payload: Array[Byte],
                     extraHeader: Seq[String] = Nil): Array[Byte] = {
    val head = (Seq(
      "WARC/1.0",
      s"WARC-Type: $warcType",
      s"WARC-Record-ID: $recordId",
      s"WARC-Target-URI: $uri",
      s"WARC-Date: $date",
      s"Content-Type: $contentType") ++ extraHeader ++ Seq(
      s"Content-Length: ${payload.length}",
      "", "")).mkString("\r\n").getBytes(UTF_8)
    head ++ payload ++ "\r\n\r\n".getBytes(UTF_8)
  }

  private def gz(bytes: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bos)
    g.write(bytes); g.close()
    bos.toByteArray
  }

  private def tmpFile(name: String, bytes: Array[Byte]): Path = {
    val dir = Files.createTempDirectory("graft-warc")
    val f = dir.resolve(name)
    Files.write(f, bytes)
    f
  }

  private val htmlBody = "<html><body>hei verden</body></html>".getBytes(UTF_8)
  private val httpPayload =
    ("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n" +
      "Server: test\r\n\r\n").getBytes(UTF_8) ++ htmlBody
  private val wetText = "Extracted text, første linje.\nSecond line."
  private val fixture: Array[Byte] =
    record("warcinfo", "<urn:uuid:info-1>", "", "2026-08-14T00:00:00Z",
      "application/warc-fields", "software: graft-test\r\n".getBytes(UTF_8)) ++
      record("response", "<urn:uuid:resp-1>", "https://example.org/a",
        "2026-08-14T00:00:01Z", "application/http; msgtype=response",
        httpPayload,
        extraHeader = Seq("WARC-Concurrent-To: <urn:uuid:req-1>",
          "WARC-Long: part one", " continued part")) ++
      record("conversion", "<urn:uuid:conv-1>", "https://example.org/a",
        "2026-08-14T00:00:02Z", "text/plain", wetText.getBytes(UTF_8))

  test("read parses every envelope field from a hand-built fixture") {
    val f = tmpFile("fix.warc", fixture)
    val rows = Warc.read(spark, f.toString)
      .orderBy("rec_index").collect()
    assert(rows.length === 3)
    val resp = rows(1)
    assert(resp.getAs[String]("warc_type") === "response")
    assert(resp.getAs[String]("record_id") === "<urn:uuid:resp-1>")
    assert(resp.getAs[String]("target_uri") === "https://example.org/a")
    assert(resp.getAs[String]("warc_date") === "2026-08-14T00:00:01Z")
    assert(resp.getAs[String]("content_type") === "application/http; msgtype=response")
    assert(resp.getAs[Long]("content_length") === httpPayload.length.toLong)
    assert(!resp.getAs[Boolean]("truncated"))
    assert(resp.getAs[Array[Byte]]("payload").sameElements(httpPayload))
    assert(rows(0).getAs[String]("warc_type") === "warcinfo")
    assert(rows(2).getAs[String]("warc_type") === "conversion")
  }

  test("header continuation lines fold RFC-822 style") {
    val f = tmpFile("fix.warc", fixture)
    val r = Warc.records(spark, f.toString).filter(_.warcType == "response").head()
    // the continuation assertion rides the typed API: raw header map is
    // internal, but a folded value must NOT break adjacent parsing
    assert(r.contentLength === httpPayload.length.toLong)
  }

  test("wet yields a documents-shaped table with UTF-8 text and a stable doc_id") {
    val f = tmpFile("fix.warc", fixture)
    val docs = Warc.wet(spark, f.toString).collect()
    assert(docs.length === 1)
    val d = docs.head
    assert(d.getAs[String]("text") === wetText)
    assert(d.getAs[String]("url") === "https://example.org/a")
    assert(d.getAs[Long]("n_chars") === wetText.length.toLong)
    // doc_id = the portable 60-bit hash of the record id: identical on
    // every re-read, every cluster size, and in the DuckDB oracle family
    assert(d.getAs[Long]("doc_id") ===
      graft.util.Hashing.portableHash64Const("<urn:uuid:conv-1>"))
  }

  test("responses splits the HTTP envelope: status, content-type, binary body") {
    val f = tmpFile("fix.warc", fixture)
    val r = Warc.responses(spark, f.toString).collect()
    assert(r.length === 1)
    assert(r.head.getAs[Int]("http_status") === 200)
    assert(r.head.getAs[String]("http_content_type") === "text/html; charset=utf-8")
    assert(r.head.getAs[Array[Byte]]("body").sameElements(htmlBody))
  }

  test("responses passes envelope-less payloads through with status -1") {
    val bare = record("response", "<urn:uuid:resp-2>", "https://example.org/b",
      "2026-08-14T00:00:03Z", "application/http; msgtype=response",
      "no http header block here".getBytes(UTF_8))
    val f = tmpFile("bare.warc", bare)
    val r = Warc.responses(spark, f.toString).collect()
    assert(r.length === 1)
    assert(r.head.getAs[Int]("http_status") === -1)
    assert(r.head.getAs[Array[Byte]]("body")
      .sameElements("no http header block here".getBytes(UTF_8)))
  }

  test("multi-member gzip reads across member boundaries (the Common Crawl layout)") {
    val m1 = gz(record("conversion", "<urn:uuid:g-1>", "https://example.org/1",
      "2026-08-14T00:00:00Z", "text/plain", "first".getBytes(UTF_8)))
    val m2 = gz(record("conversion", "<urn:uuid:g-2>", "https://example.org/2",
      "2026-08-14T00:00:01Z", "text/plain", "second".getBytes(UTF_8)))
    val f = tmpFile("fix.warc.gz", m1 ++ m2)
    val texts = Warc.wet(spark, f.toString)
      .orderBy("url").collect().map(_.getAs[String]("text")).toSeq
    assert(texts === Seq("first", "second"))
  }

  test("oversized records skip past their payload; later records still parse") {
    val big = record("conversion", "<urn:uuid:big>", "https://example.org/big",
      "2026-08-14T00:00:00Z", "text/plain", Array.fill[Byte](1000)('x'))
    val small = record("conversion", "<urn:uuid:small>", "https://example.org/s",
      "2026-08-14T00:00:01Z", "text/plain", "kept".getBytes(UTF_8))
    val f = tmpFile("fix.warc", big ++ small)
    val rows = Warc.read(spark, f.toString, maxPayload = 100)
      .orderBy("rec_index").collect()
    assert(rows.length === 2)
    assert(rows(0).getAs[Boolean]("truncated"))
    assert(rows(0).getAs[Long]("content_length") === 1000L)
    assert(rows(0).getAs[Array[Byte]]("payload").isEmpty)
    assert(!rows(1).getAs[Boolean]("truncated"))
    // and the skipped record is invisible to wet() but the next is kept
    val docs = Warc.wet(spark, f.toString, maxPayload = 100).collect()
    assert(docs.map(_.getAs[String]("text")).toSeq === Seq("kept"))
  }

  test("malformed tail degrades deterministically: records before it are kept") {
    val good = record("conversion", "<urn:uuid:ok>", "https://example.org/ok",
      "2026-08-14T00:00:00Z", "text/plain", "ok".getBytes(UTF_8))
    val f = tmpFile("fix.warc",
      good ++ "this is not a WARC header\r\njust garbage".getBytes(UTF_8))
    val rows = Warc.read(spark, f.toString).collect()
    assert(rows.length === 1)
    assert(rows.head.getAs[String]("record_id") === "<urn:uuid:ok>")
  }

  test("a record with a missing Content-Length ends the file's iterator") {
    val noLen = ("WARC/1.0\r\nWARC-Type: conversion\r\n" +
      "WARC-Record-ID: <urn:uuid:nolen>\r\n\r\npayload").getBytes(UTF_8)
    val f = tmpFile("fix.warc", fixture ++ noLen)
    assert(Warc.read(spark, f.toString).count() === 3)
  }

  test("empty and header-only files yield zero rows, no exception") {
    val f = tmpFile("empty.warc", Array.emptyByteArray)
    assert(Warc.read(spark, f.toString).count() === 0)
  }

  test("wet shards feed the config-driven curation pipeline end-to-end") {
    import spark.implicits._
    // two normalization-equivalent docs (case + whitespace variants)
    // plus one distinct doc and a non-conversion record to ignore
    val recs =
      record("warcinfo", "<urn:uuid:w-0>", "", "2026-08-14T00:00:00Z",
        "application/warc-fields", "software: graft-test\r\n".getBytes(UTF_8)) ++
        record("conversion", "<urn:uuid:w-1>", "https://example.org/1",
          "2026-08-14T00:00:01Z", "text/plain", "alpha beta gamma".getBytes(UTF_8)) ++
        record("conversion", "<urn:uuid:w-2>", "https://example.org/2",
          "2026-08-14T00:00:02Z", "text/plain", "Alpha  beta   GAMMA".getBytes(UTF_8)) ++
        record("conversion", "<urn:uuid:w-3>", "https://example.org/3",
          "2026-08-14T00:00:03Z", "text/plain", "something else entirely".getBytes(UTF_8))
    val f = tmpFile("shard.warc", recs)
    val out = Files.createTempDirectory("graft-wet-out").resolve("clean").toString
    val cfg = s"""{"input": "$f", "inputFormat": "wet", "output": "$out",
      "stages": [{"op": "dedup_exact"}]}"""
    val (rowsIn, rowsOut) = graft.Pipeline.run(spark, cfg)
    assert(rowsIn === 3L, "only conversion records enter the pipeline")
    assert(rowsOut === 2L, "the normalization-equivalent pair collapses")
    val texts = spark.read.parquet(out).select("text").as[String].collect().toSet
    assert(texts.contains("something else entirely"))
    assert(texts.size === 2)
    // an unknown input format fails loudly, like an unknown stage
    val bad = intercept[IllegalArgumentException](graft.Pipeline.run(spark,
      s"""{"input": "$f", "inputFormat": "tar", "output": "$out", "stages": []}"""))
    assert(bad.getMessage.contains("unknown inputFormat"))
  }

  test("a short payload (EOF mid-record) drops only the partial record") {
    val full = record("conversion", "<urn:uuid:short>", "https://example.org/x",
      "2026-08-14T00:00:00Z", "text/plain", "0123456789".getBytes(UTF_8))
    val f = tmpFile("fix.warc", full.dropRight(8)) // cut into the payload
    assert(Warc.read(spark, f.toString).count() === 0)
  }
}
