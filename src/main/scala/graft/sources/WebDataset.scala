package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream,
  EOFException, FileOutputStream, InputStream, OutputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** WebDataset ingestion/export — the tar-of-samples convention the
  * multimodal training world standardized on (the public WebDataset
  * format: a POSIX ustar archive whose members group into samples by
  * basename — `000123.jpg` + `000123.txt` + `000123.json` is ONE
  * sample with three fields; samples are stored contiguously so a
  * sequential reader never buffers more than one sample). Image/text
  * pair corpora ship as thousands of `shard-%05d.tar` files; this
  * source closes the same boundary for tar shards that TfRecord
  * closes for Example shards.
  *
  * Pure-JVM tar: 512-byte headers, octal size fields, NUL padding to
  * block boundaries, two zero blocks at end — the ustar layout is
  * public (POSIX.1-1988). Written headers carry the `ustar` magic,
  * mode 0644, epoch mtime (deterministic output: re-running an export
  * produces byte-identical shards — mtime/uid vary across runs on
  * real tars, so the READER ignores them entirely).
  *
  * Contract mirrors Warc/Npy/TfRecord:
  *  - FILE-level parallelism (`binaryFiles`, one shard per task,
  *    `.tar.gz` transparent);
  *  - STREAMING parse: one member buffered at a time, one SAMPLE
  *    assembled at a time (the contiguity convention makes that
  *    constant-memory; a sample interleaved across others would be
  *    mis-split, exactly as real webdataset readers behave);
  *  - a truncated tail (EOF mid-member, missing end blocks) ends THAT
  *    file's iterator deterministically, complete samples kept;
  *  - `maxMember` caps a pathological size field before allocation;
  *    oversized members SKIP with the sample still reporting the
  *    field name in `truncated_fields` (visible, not vanished).
  */
object WebDataset {

  /** One tar member. */
  case class TarEntry(file: String, name: String, bytes: Array[Byte])

  /** One WebDataset sample: shard file, sample key (member basename
    * up to the FIRST dot — the public convention, so `x.seg.png`
    * fields key as `x`), field extension → bytes, plus the names of
    * fields skipped for size.
    */
  case class WdSample(file: String, key: String,
                      fields: Map[String, Array[Byte]],
                      truncated_fields: Seq[String])

  val defaultMaxMember: Int = 256 * 1024 * 1024

  // ---------------------------------------------------------------
  // tar plumbing
  // ---------------------------------------------------------------

  private def parseOctal(b: Array[Byte], off: Int, len: Int): Long = {
    var i = off
    val end = off + len
    var v = 0L
    // skip leading spaces/NULs; stop at first space/NUL after digits
    while (i < end && (b(i) == ' ' || b(i) == 0)) i += 1
    while (i < end && b(i) >= '0' && b(i) <= '7') {
      v = (v << 3) + (b(i) - '0'); i += 1
    }
    v
  }

  private def headerName(b: Array[Byte]): String = {
    // prefix field (ustar) + name field
    def str(off: Int, len: Int): String = {
      var n = 0
      while (n < len && b(off + n) != 0) n += 1
      new String(b, off, n, UTF_8)
    }
    val prefix = str(345, 155)
    val name = str(0, 100)
    if (prefix.isEmpty) name else s"$prefix/$name"
  }

  /** Streaming member iterator; EOF mid-member or a zero block ends
    * the stream. Oversized members yield (name, null) so callers can
    * surface them.
    */
  private def tarIterator(file: String, in: DataInputStream,
                          maxMember: Int): Iterator[(String, Array[Byte])] =
    new Iterator[(String, Array[Byte])] {
      private var nextE: (String, Array[Byte]) = _
      private var done = false
      private val header = new Array[Byte](512)
      private def advance(): Unit = {
        while (!done && nextE == null) {
          try {
            in.readFully(header)
            if (header.forall(_ == 0)) { done = true; return }
            val size = parseOctal(header, 124, 12)
            val typeFlag = header(156)
            val name = headerName(header)
            val padded = ((size + 511) / 512) * 512
            // regular files only ('0' or NUL); skip dirs/links/pax
            // headers but always consume the payload
            val regular = typeFlag == '0' || typeFlag == 0
            if (!regular || size > maxMember) {
              var toSkip = padded
              while (toSkip > 0) {
                val s = in.skip(toSkip)
                if (s <= 0) { // skip can return 0 pre-EOF; read a byte
                  if (in.read() < 0) { done = true; return }
                  toSkip -= 1
                } else toSkip -= s
              }
              if (regular) nextE = (name, null) // oversized marker
            } else {
              val bytes = new Array[Byte](size.toInt)
              in.readFully(bytes)
              val pad = (padded - size).toInt
              if (pad > 0) in.readFully(new Array[Byte](pad))
              nextE = (name, bytes)
            }
          } catch { case _: EOFException => done = true }
        }
      }
      override def hasNext: Boolean = { advance(); nextE != null }
      override def next(): (String, Array[Byte]) = {
        advance(); val e = nextE; nextE = null; e
      }
    }

  /** Write one tar member (header + payload + padding). */
  def writeEntry(out: OutputStream, name: String,
                 bytes: Array[Byte]): Unit = {
    val nameBytes = name.getBytes(UTF_8)
    require(nameBytes.length <= 100,
      s"tar member name too long (${nameBytes.length} > 100): $name")
    val h = new Array[Byte](512)
    System.arraycopy(nameBytes, 0, h, 0, nameBytes.length)
    def octal(v: Long, off: Int, len: Int): Unit = {
      val s = java.lang.Long.toOctalString(v)
      val padded = ("0" * (len - 1 - s.length)) + s
      System.arraycopy(padded.getBytes(UTF_8), 0, h, off,
        len - 1) // trailing NUL stays
    }
    octal(420L, 100, 8)            // mode 0644
    octal(0L, 108, 8); octal(0L, 116, 8) // uid/gid
    octal(bytes.length.toLong, 124, 12)  // size
    octal(0L, 136, 12)             // mtime epoch — deterministic
    h(156) = '0'                   // regular file
    System.arraycopy("ustar".getBytes(UTF_8), 0, h, 257, 5)
    h(263) = '0'; h(264) = '0'     // version "00"
    // checksum: field spaces during computation
    java.util.Arrays.fill(h, 148, 156, ' '.toByte)
    var sum = 0L
    h.foreach(b => sum += b & 0xff)
    val cs = java.lang.Long.toOctalString(sum)
    val csPadded = ("0" * (6 - cs.length)) + cs
    System.arraycopy(csPadded.getBytes(UTF_8), 0, h, 148, 6)
    h(154) = 0; h(155) = ' '
    out.write(h)
    out.write(bytes)
    val pad = ((bytes.length + 511) / 512) * 512 - bytes.length
    if (pad > 0) out.write(new Array[Byte](pad))
  }

  /** Close a tar stream: two zero blocks. */
  def finish(out: OutputStream): Unit =
    out.write(new Array[Byte](1024))

  // ---------------------------------------------------------------
  // source
  // ---------------------------------------------------------------

  /** Raw tar members over a path/glob of `.tar[.gz]` shards.
    * Oversized members are dropped here (use [[samples]] to see them
    * as `truncated_fields`).
    */
  def entries(spark: SparkSession, path: String,
              maxMember: Int = defaultMaxMember): Dataset[TarEntry] = {
    import spark.implicits._
    spark.sparkContext.binaryFiles(path)
      .flatMap { case (file, pds) =>
        val in = open(file, pds.open())
        tarIterator(file, in, maxMember)
          .collect { case (n, b) if b != null => TarEntry(file, n, b) }
      }
      .toDS()
  }

  /** Samples: members grouped by key (basename up to the first dot)
    * under the contiguity convention — a key change closes the
    * current sample. Extensions are the full remainder after that
    * first dot (`seg.png` stays `seg.png`).
    */
  def samples(spark: SparkSession, path: String,
              maxMember: Int = defaultMaxMember): Dataset[WdSample] = {
    import spark.implicits._
    spark.sparkContext.binaryFiles(path)
      .flatMap { case (file, pds) =>
        val in = open(file, pds.open())
        val members = tarIterator(file, in, maxMember)
        new Iterator[WdSample] {
          private var pending: WdSample = _
          private var cur: (String, mutable.LinkedHashMap[String, Array[Byte]],
            mutable.ArrayBuffer[String]) = _
          private def split(name: String): (String, String) = {
            val base = name.substring(name.lastIndexOf('/') + 1)
            val dot = base.indexOf('.')
            if (dot < 0) (base, "") else
              (base.substring(0, dot), base.substring(dot + 1))
          }
          private def closeCur(): Unit = if (cur != null) {
            pending = WdSample(file, cur._1, cur._2.toMap, cur._3.toSeq)
            cur = null
          }
          private def advance(): Unit = {
            while (pending == null && members.hasNext) {
              val (name, bytes) = members.next()
              val (key, ext) = split(name)
              if (cur != null && cur._1 != key) closeCur()
              if (cur == null)
                cur = (key, mutable.LinkedHashMap.empty, mutable.ArrayBuffer.empty)
              if (bytes == null) cur._3 += ext else cur._2(ext) = bytes
            }
            if (pending == null && cur != null) closeCur()
          }
          override def hasNext: Boolean = { advance(); pending != null }
          override def next(): WdSample = {
            advance(); val s = pending; pending = null; s
          }
        }
      }
      .toDS()
  }

  /** Samples as a DataFrame with one BINARY column per requested
    * extension (null when the sample lacks that field).
    */
  def read(spark: SparkSession, path: String, exts: Seq[String],
           maxMember: Int = defaultMaxMember): DataFrame = {
    val s = samples(spark, path, maxMember)
    val schema = StructType(
      StructField("file", StringType) +: StructField("key", StringType) +:
        exts.map(e => StructField(e.replace('.', '_'), BinaryType)))
    val rows = s.rdd.map { w =>
      Row.fromSeq(w.file +: w.key +: exts.map(e => w.fields.get(e).orNull))
    }
    spark.createDataFrame(rows, schema)
  }

  // ---------------------------------------------------------------
  // sink
  // ---------------------------------------------------------------

  /** Export a DataFrame as WebDataset shards, one
    * `part-NNNNN.tar[.gz]` per partition: `keyCol` (cast to string)
    * names the sample; every other column becomes a member
    * `<key>.<column name>` — STRING columns as UTF-8, BINARY as-is
    * (other types must be cast first: what lands in a .txt/.json
    * member is an explicit rendering choice, not an implicit one —
    * the TfRecord DOUBLE lesson). Null cells write no member.
    * Partition layout decides shard contents; sort within partitions
    * upstream for byte-deterministic shards.
    */
  def write(df: DataFrame, keyCol: String, dir: String,
            gzip: Boolean = false): Unit = {
    val schema = df.schema
    val keyIdx = schema.fieldIndex(keyCol)
    val fieldIdx = schema.fields.zipWithIndex.filter(_._2 != keyIdx)
    fieldIdx.foreach { case (f, _) =>
      require(f.dataType == StringType || f.dataType == BinaryType,
        s"WebDataset.write: column '${f.name}' is ${f.dataType}; cast " +
          "to STRING or BINARY explicitly")
    }
    new java.io.File(dir).mkdirs()
    df.rdd.mapPartitionsWithIndex { case (pid, it) =>
      val suffix = if (gzip) ".tar.gz" else ".tar"
      val file = new java.io.File(dir, f"part-$pid%05d$suffix")
      val raw = new FileOutputStream(file)
      val out = new BufferedOutputStream(
        if (gzip) new GZIPOutputStream(raw, 1 << 16) else raw, 1 << 16)
      var n = 0L
      try {
        it.foreach { row =>
          val key = String.valueOf(row.get(keyIdx))
          fieldIdx.foreach { case (f, i) =>
            if (!row.isNullAt(i)) {
              val bytes = f.dataType match {
                case StringType => row.getString(i).getBytes(UTF_8)
                case _ => row.getAs[Array[Byte]](i)
              }
              writeEntry(out, s"$key.${f.name}", bytes)
            }
          }
          n += 1
        }
        finish(out)
      } finally out.close()
      Iterator.single(n)
    }.count()
    ()
  }

  private def open(file: String, raw: InputStream): DataInputStream = {
    val b = new BufferedInputStream(raw, 1 << 16)
    new DataInputStream(
      if (file.endsWith(".gz")) new GZIPInputStream(b, 1 << 16) else b)
  }
}
