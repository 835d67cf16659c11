package graft.sources

import java.io.{BufferedOutputStream, FileOutputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.GZIPOutputStream

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Deterministic `.wet.gz` fixture built FROM the documents table —
  * the bridge that lets the crawl-source boundary (Warc parsing,
  * gzip framing, payload byte round-trips) sit under the DuckDB
  * oracle gate: the fixture's payload bytes ARE the documents' texts
  * (UTF-8), with the original doc_id carried in the Target-URI, so a
  * wet → curation-stage chain is replayable in SQL straight from the
  * documents table. Used by the `pipeline_wet_corpus` gated query and
  * free for specs.
  *
  * The corpus is the dup-injected subset (doc_id % 10 = 0, plus
  * +100000-id copies of doc_id % 50 = 0 — the dupCorpus convention)
  * split deterministically across two shard files, exercising
  * file-level parallelism the way Common Crawl dumps do.
  */
object WetFixture {

  /** Write the fixture into a fresh temp dir; returns the dir path.
    * A unique dir per call keeps concurrent Verify/Bench/spec runs
    * from racing on the files; content is bit-deterministic for a
    * given sfDir.
    */
  def write(spark: SparkSession, sfDir: String): String = {
    val docs = graft.util.Tables.documents(spark, sfDir)
    val subset = docs.filter(expr("doc_id % 10 = 0"))
      .select(col("doc_id"), col("text"))
      .unionByName(docs.filter(expr("doc_id % 50 = 0"))
        .select((col("doc_id") + 100000L).as("doc_id"), col("text")))
    // the fixture subset is bounded (|documents|/10 · 1.2 rows) — a
    // driver-side collect is the POINT here: we are authoring local
    // files, not running a distributed op
    val rows = subset.orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val dir = java.nio.file.Files.createTempDirectory("graft_wet").toFile
    val shards = Array.tabulate(2) { i =>
      new GZIPOutputStream(new BufferedOutputStream(
        new FileOutputStream(new java.io.File(dir, f"shard-$i%02d.wet.gz"))))
    }
    try rows.zipWithIndex.foreach { case ((id, text), i) =>
      val payload = text.getBytes(UTF_8)
      val head = new StringBuilder()
        .append("WARC/1.0\r\n")
        .append("WARC-Type: conversion\r\n")
        .append(s"WARC-Record-ID: <urn:graft:wet:$id>\r\n")
        .append(s"WARC-Target-URI: http://graft.invalid/doc/$id\r\n")
        .append("WARC-Date: 2024-01-01T00:00:00Z\r\n")
        .append("Content-Type: text/plain\r\n")
        .append(s"Content-Length: ${payload.length}\r\n")
        .append("\r\n")
        .toString.getBytes(UTF_8)
      val out = shards(i % 2)
      out.write(head)
      out.write(payload)
      out.write("\r\n\r\n".getBytes(UTF_8))
    } finally shards.foreach(_.close())
    dir.getAbsolutePath
  }
}
