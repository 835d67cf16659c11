package graft.sources

import java.io.{BufferedInputStream, DataInputStream, InputStream}
import java.util.zip.GZIPInputStream

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** WARC / WET ingestion (ISO 28500) — the container format a crawl
  * curation pipeline actually reads: Common Crawl publishes its dumps
  * as ~1 GB `.warc.gz` shards (raw fetches) and `.wet.gz` shards
  * (extracted text), and every C-block text operator upstream of this
  * file assumes documents already sit in a table. This source closes
  * that gap: WARC shards in, `documents`-shaped DataFrame out.
  *
  * Scale shape (the part that must survive 100 TB):
  *  - FILE-level parallelism: gzip is not splittable, so one shard =
  *    one task is the industry-standard unit (Common Crawl sizes its
  *    shards ~1 GB for exactly this reason). `sc.binaryFiles` hands
  *    each task a lazy stream, thousands of shards fan out across the
  *    cluster with no driver-side listing beyond the file index.
  *  - STREAMING parse: records decode off a `PortableDataStream` —
  *    constant memory per task (one record buffered at a time), never
  *    a whole-shard byte[] row. Oversized records (Content-Length >
  *    `maxPayload`) are SKIPPED by seeking past their payload, not
  *    buffered: metadata still rows out with `truncated = true`, so a
  *    pathological 2 GB record cannot OOM an executor and its presence
  *    stays visible instead of silently vanishing.
  *  - Malformed tails degrade deterministically: a record whose
  *    header block or payload cannot be read ends THAT file's iterator
  *    (same contract as the mp4/mkv parsers — no resync guessing, no
  *    exception), records before the corruption are kept.
  *
  * Multi-member gzip: Common Crawl compresses each record as its own
  * gzip member so readers can seek; the JDK's `GZIPInputStream` reads
  * concatenated members transparently, which the spec pins with a
  * two-member fixture.
  *
  * Header lines decode as UTF-8 (WARC 1.0 allows UTF-8 in URIs);
  * payloads stay raw bytes — `wet()` decodes them as UTF-8 text (the
  * WET contract), `responses()` splits the HTTP envelope and leaves
  * the body binary (HTML bytes in whatever charset the server sent).
  */
object Warc {

  /** One parsed WARC record: envelope headers + raw payload bytes.
    * `truncated` marks records whose payload exceeded `maxPayload`
    * and was skipped (payload empty, length still reported).
    */
  case class WarcRecord(
      file: String,
      recIndex: Int,
      warcType: String,
      recordId: String,
      targetUri: String,
      warcDate: String,
      contentType: String,
      contentLength: Long,
      truncated: Boolean,
      payload: Array[Byte])

  /** Default per-record payload cap: far above any legitimate text
    * record, far below executor memory.
    */
  val defaultMaxPayload: Int = 64 * 1024 * 1024

  /** Typed record stream over a path/glob of `.warc[.gz]` /
    * `.wet[.gz]` files — the primitive `read`/`wet`/`responses` wrap.
    */
  def records(spark: SparkSession, path: String,
              maxPayload: Int = defaultMaxPayload): Dataset[WarcRecord] = {
    import spark.implicits._
    spark.sparkContext.binaryFiles(path)
      .flatMap { case (file, pds) =>
        val raw = new BufferedInputStream(pds.open(), 1 << 16)
        val in: InputStream =
          if (file.endsWith(".gz")) new GZIPInputStream(raw, 1 << 16) else raw
        closeOnEnd(parseStream(file, in, maxPayload), in)
      }
      .toDS()
  }

  /** All records as a snake_case DataFrame (payload raw binary). */
  def read(spark: SparkSession, path: String,
           maxPayload: Int = defaultMaxPayload): DataFrame =
    records(spark, path, maxPayload).toDF()
      .select(
        col("file"),
        col("recIndex").as("rec_index"),
        col("warcType").as("warc_type"),
        col("recordId").as("record_id"),
        col("targetUri").as("target_uri"),
        col("warcDate").as("warc_date"),
        col("contentType").as("content_type"),
        col("contentLength").as("content_length"),
        col("truncated"),
        col("payload"))

  /** WET extracted-text records as a `documents`-shaped table:
    * deterministic doc_id from the record id (stable across re-reads
    * and cluster sizes — never a zipWithIndex), url, fetch date,
    * UTF-8 text, n_chars. Feed this straight into the C-block
    * curation chain.
    */
  def wet(spark: SparkSession, path: String,
          maxPayload: Int = defaultMaxPayload): DataFrame =
    read(spark, path, maxPayload)
      .filter(col("warc_type") === "conversion" && !col("truncated"))
      .select(
        graft.util.Hashing.portableHash64(col("record_id")).as("doc_id"),
        col("target_uri").as("url"),
        col("warc_date").as("fetched_at"),
        decode(col("payload"), "UTF-8").as("text"))
      .withColumn("n_chars", length(col("text")).cast("long"))

  /** HTTP response records with the envelope split off: status code,
    * HTTP-level Content-Type, and the raw body bytes (HTML in
    * whatever charset the server sent — charset handling belongs to
    * the caller's extraction stage). Records without a complete HTTP
    * header block pass through with status -1 and the whole payload
    * as body, so nothing silently drops.
    */
  def responses(spark: SparkSession, path: String,
                maxPayload: Int = defaultMaxPayload): DataFrame = {
    import spark.implicits._
    records(spark, path, maxPayload)
      .filter(r => r.warcType == "response" && !r.truncated)
      .map { r =>
        val (status, httpCt, body) = splitHttp(r.payload)
        (r.file, r.recIndex, r.targetUri, r.warcDate, status, httpCt, body)
      }
      .toDF("file", "rec_index", "target_uri", "warc_date",
        "http_status", "http_content_type", "body")
  }

  /** Split an HTTP/1.x response payload into (status, content-type,
    * body) at the first CRLFCRLF; (-1, "", payload) when no complete
    * header block exists.
    */
  private[sources] def splitHttp(payload: Array[Byte]): (Int, String, Array[Byte]) = {
    val sep = indexOfCrlfCrlf(payload)
    if (sep < 0) (-1, "", payload)
    else {
      val head = new String(payload, 0, sep, java.nio.charset.StandardCharsets.UTF_8)
      val lines = head.split("\r\n")
      val status = lines.headOption
        .filter(_.startsWith("HTTP/"))
        .flatMap(_.split(" ", 3).lift(1))
        .flatMap(_.toIntOption)
        .getOrElse(-1)
      val ct = lines.drop(1)
        .find(_.toLowerCase.startsWith("content-type:"))
        .map(_.split(":", 2)(1).trim)
        .getOrElse("")
      (status, ct, java.util.Arrays.copyOfRange(payload, sep + 4, payload.length))
    }
  }

  private def indexOfCrlfCrlf(b: Array[Byte]): Int = {
    var i = 0
    while (i + 3 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' && b(i + 3) == '\n')
        return i
      i += 1
    }
    -1
  }

  /** Streaming record parser over one (already decompressed) WARC
    * byte stream. One record buffered at a time; ends the iterator at
    * EOF or the first structural corruption (missing version line,
    * unterminated header block, absent/huge-beyond-skip
    * Content-Length, short payload).
    */
  private[sources] def parseStream(file: String, in: InputStream,
                                   maxPayload: Int): Iterator[WarcRecord] =
    new Iterator[WarcRecord] {
      private val din = new DataInputStream(in)
      private var idx = 0
      private var nextRec: WarcRecord = _
      private var done = false
      advance()

      override def hasNext: Boolean = !done
      override def next(): WarcRecord = {
        if (done) throw new NoSuchElementException("WARC iterator exhausted")
        val r = nextRec
        advance()
        r
      }

      /** Read one header line as UTF-8, CRLF or LF terminated; null at
        * EOF before any byte.
        */
      private def readLine(): String = {
        val buf = new java.io.ByteArrayOutputStream(128)
        var c = din.read()
        if (c < 0) return null
        while (c >= 0 && c != '\n') { buf.write(c); c = din.read() }
        val bytes = buf.toByteArray
        val len = if (bytes.nonEmpty && bytes(bytes.length - 1) == '\r')
          bytes.length - 1 else bytes.length
        new String(bytes, 0, len, java.nio.charset.StandardCharsets.UTF_8)
      }

      private def advance(): Unit = {
        // skip the CRLF CRLF record separator (any number of blanks)
        var line = readLine()
        while (line != null && line.isEmpty) line = readLine()
        if (line == null || !line.startsWith("WARC/")) { done = true; return }
        // header block: "Name: value" lines, RFC-822 continuations
        val headers = mutable.Map.empty[String, String]
        var lastKey: String = null
        line = readLine()
        while (line != null && line.nonEmpty) {
          if ((line.charAt(0) == ' ' || line.charAt(0) == '\t') && lastKey != null) {
            headers(lastKey) = headers(lastKey) + " " + line.trim
          } else {
            val sep = line.indexOf(':')
            if (sep > 0) {
              lastKey = line.substring(0, sep).trim.toLowerCase
              headers(lastKey) = line.substring(sep + 1).trim
            }
          }
          line = readLine()
        }
        if (line == null) { done = true; return } // EOF inside headers
        headers.get("content-length").flatMap(_.toLongOption) match {
          case None => done = true // structural: cannot locate the next record
          case Some(len) if len < 0 => done = true
          case Some(len) =>
            val truncated = len > maxPayload
            val payload =
              if (truncated) { if (!skipFully(len)) { done = true; return }; Array.emptyByteArray }
              else {
                val p = new Array[Byte](len.toInt)
                try din.readFully(p)
                catch { case _: java.io.IOException => done = true; return }
                p
              }
            nextRec = WarcRecord(
              file, idx,
              headers.getOrElse("warc-type", ""),
              headers.getOrElse("warc-record-id", ""),
              headers.getOrElse("warc-target-uri", ""),
              headers.getOrElse("warc-date", ""),
              headers.getOrElse("content-type", ""),
              len, truncated, payload)
            idx += 1
        }
      }

      private def skipFully(n: Long): Boolean = {
        var remaining = n
        while (remaining > 0) {
          val s = din.skip(remaining)
          if (s > 0) remaining -= s
          else if (din.read() >= 0) remaining -= 1 // skip() can stall; force a byte
          else return false
        }
        true
      }
    }

  /** Close the underlying stream exactly once when the record
    * iterator exhausts (flatMap never calls close for us).
    */
  private def closeOnEnd[T](it: Iterator[T], in: InputStream): Iterator[T] =
    new Iterator[T] {
      private var closed = false
      override def hasNext: Boolean = {
        val h = it.hasNext
        if (!h && !closed) { closed = true; try in.close() catch { case _: Throwable => } }
        h
      }
      override def next(): T = it.next()
    }
}
