package graft.sources

import java.io.{BufferedOutputStream, FileOutputStream, OutputStreamWriter}
import java.util.zip.GZIPOutputStream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Gzip JSONL shard export/ingest — the lingua-franca corpus
  * interchange format (every public LLM dataset release ships one).
  *
  * The WRITE side is hand-coded to RFC 8259: the mandatory escape set
  * (quote, backslash, ALL control chars below 0x20 — shorthand for
  * \b \f \n \r \t, \u00XX for the rest), raw UTF-8 passthrough for
  * everything else, one object per line. The READ side is Spark's
  * native line-JSON source in FAILFAST mode, so the gate round-trip
  * cross-validates our serializer against an independent parser —
  * the same interop doctrine as the WebDataset CPython-tarfile
  * fixture and the TFRecord CRC framing.
  *
  * Scale shape: the writer is a `mapPartitions` file emitter (one
  * gzip member per partition — binary framing is not an expression),
  * the reader is Spark's file-parallel JSON scan; schema is pinned by
  * the caller, never inferred (an inference pass over 100 TB is a
  * full extra read).
  */
object Jsonl {

  /** RFC 8259 string-body escape. */
  def escape(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '"'  => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\b' => sb.append("\\b")
        case '\f' => sb.append("\\f")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
        case c => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  private val supported: Set[DataType] =
    Set(LongType, IntegerType, StringType, BooleanType)

  /** One encoded JSON line per row (no trailing newline). */
  private[graft] def encodeRow(names: Array[String],
      row: org.apache.spark.sql.Row): String = {
    val sb = new StringBuilder(256)
    sb.append('{')
    var j = 0
    while (j < names.length) {
      if (j > 0) sb.append(',')
      sb.append('"').append(escape(names(j))).append("\":")
      row.get(j) match {
        case null => sb.append("null")
        case s: String => sb.append('"').append(escape(s)).append('"')
        case b: Boolean => sb.append(if (b) "true" else "false")
        case v => sb.append(v.toString) // long / int
      }
      j += 1
    }
    sb.append('}').toString
  }

  /** Task-commit protocol: write the shard to a per-ATTEMPT temp file,
    * then atomically rename to the final `part-$pid` name only after
    * the gzip stream closed clean. Without it a speculative twin
    * attempt would interleave two writers on ONE final file — corrupt
    * gz that a downstream FAILFAST read explodes on. Local gates never
    * speculate; a 100 TB cluster does. Two committing attempts of the
    * same partition produce byte-identical shards (deterministic input
    * iteration), so last-rename-wins REPLACE is safe; a failed attempt
    * leaves only a `_tmp-` file the driver sweeps after the job. Same
    * staged-swap discipline as Compaction.compactStore and the IVF
    * vacuum.
    */
  private[graft] def writeShard(dir: String, pid: Int, attempt: Long,
      lines: Iterator[String]): Long = {
    val tmp = new java.io.File(dir, f"_tmp-part-$pid%05d-$attempt.jsonl.gz")
    val fin = new java.io.File(dir, f"part-$pid%05d.jsonl.gz")
    val w = new OutputStreamWriter(new GZIPOutputStream(
      new BufferedOutputStream(new FileOutputStream(tmp), 1 << 16),
      1 << 16), "UTF-8")
    var n = 0L
    var ok = false
    try {
      lines.foreach { line => w.write(line); w.write('\n'); n += 1 }
      ok = true
    } finally {
      w.close()
      if (!ok) tmp.delete() // this attempt failed: leave no partial
    }
    java.nio.file.Files.move(tmp.toPath, fin.toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    n
  }

  /** One `.jsonl.gz` shard per partition under `dir`. Long/int/string/
    * boolean columns only — a double would reopen the cross-engine
    * float-formatting wound the output contract exists to close.
    */
  def write(df: DataFrame, dir: String): Unit = {
    val schema = df.schema
    schema.fields.foreach { f =>
      require(supported.contains(f.dataType),
        s"Jsonl.write supports long/int/string/boolean; " +
          s"'${f.name}' is ${f.dataType.simpleString}")
    }
    val names = schema.fieldNames
    new java.io.File(dir).mkdirs()
    df.rdd.mapPartitionsWithIndex { case (pid, it) =>
      val attempt = Option(org.apache.spark.TaskContext.get())
        .map(_.taskAttemptId()).getOrElse(0L)
      Iterator.single(writeShard(dir, pid, attempt, it.map(encodeRow(names, _))))
    }.count()
    // sweep stray temp files from failed/killed attempts — the commit
    // rename means none of them were ever visible as shards
    Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.startsWith("_tmp-part-") &&
        f.getName.endsWith(".jsonl.gz"))
      .foreach(_.delete())
    ()
  }

  /** Shards back through Spark's native line-JSON source; FAILFAST so
    * a corrupt line throws instead of null-filling past the gate.
    */
  def read(spark: SparkSession, path: String, schema: StructType)
      : DataFrame =
    spark.read.schema(schema).option("mode", "FAILFAST").json(path)
}
