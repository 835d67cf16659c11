package graft.util

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Filesystem operations through the Hadoop `FileSystem` API, so
  * stores and state work on ANY Spark-supported scheme (hdfs://,
  * s3a://, file:/) — `java.io.File` silently reports "missing" for
  * non-local paths, which would degrade every sync cycle into a full
  * copy instead of failing fast.
  *
  * Note for object stores: `rename` is O(data) on S3-like stores; at
  * that scale prefer a transactional table format for the target. The
  * semantics here (stage → swap) are still correct.
  */
object Fs {

  def fs(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Directory exists and contains at least one entry. */
  def existsNonEmpty(spark: SparkSession, path: String): Boolean = {
    val p = new Path(path)
    val f = fs(spark, path)
    f.exists(p) && f.listStatus(p).nonEmpty
  }

  /** Directory contains at least one file with the given suffix
    * (e.g. a committed `.parquet` part — distinguishes a real dataset
    * from a bare `_SUCCESS`/staging shell).
    */
  def hasFileWithSuffix(spark: SparkSession, path: String, suffix: String): Boolean = {
    val p = new Path(path)
    val f = fs(spark, path)
    f.exists(p) && f.listStatus(p).exists(_.getPath.getName.endsWith(suffix))
  }

  /** Atomically-ish swap: delete `destPath` if present, then rename
    * `stagingPath` into place. Rename is metadata-only on HDFS/local.
    */
  def replace(spark: SparkSession, stagingPath: String, destPath: String): Unit = {
    val dest = new Path(destPath)
    val staging = new Path(stagingPath)
    val f = fs(spark, destPath)
    if (f.exists(dest)) f.delete(dest, true)
    val parent = dest.getParent
    if (parent != null && !f.exists(parent)) f.mkdirs(parent)
    if (!f.rename(staging, dest))
      throw new java.io.IOException(s"rename $stagingPath -> $destPath failed")
  }

  /** Recover a [[replace]] that crashed between its delete and its
    * rename: the destination is gone but the staging directory holds
    * the COMPLETE intended content (its `_SUCCESS` commit marker
    * proves the write finished — a crash mid-staging-write leaves no
    * marker and must NOT be promoted). Callers of the stage-and-swap
    * pattern run this before reading the destination, so "dest
    * missing" can never be misread as "dest empty" (which would
    * silently restart the dataset from the current batch).
    *
    * @return true if a completed staging dir was renamed into place
    */
  def recoverReplace(spark: SparkSession, stagingPath: String, destPath: String): Boolean = {
    val f = fs(spark, destPath)
    val dest = new Path(destPath)
    val staging = new Path(stagingPath)
    if (!f.exists(dest) && f.exists(new Path(stagingPath, "_SUCCESS"))) {
      if (!f.rename(staging, dest))
        throw new java.io.IOException(s"recovery rename $stagingPath -> $destPath failed")
      true
    } else false
  }

  def delete(spark: SparkSession, path: String): Unit = {
    val p = new Path(path)
    val f = fs(spark, path)
    if (f.exists(p)) f.delete(p, true)
  }

  /** Read a small marker/stamp file as text. `None` when the file is
    * missing OR unreadable/garbled — writers recover by rewriting, and
    * every caller treats an absent marker conservatively (refold a
    * delta, re-layout a store), so a half-written file must degrade to
    * "absent", never to a crash loop.
    */
  def readSmallText(spark: SparkSession, dir: String, name: String): Option[String] = {
    val f = fs(spark, dir)
    val p = new Path(dir, name)
    try {
      if (!f.exists(p)) None
      else {
        val in = f.open(p)
        try Some(new String(in.readAllBytes(), "UTF-8").trim)
        finally in.close()
      }
    } catch { case _: java.io.IOException => None }
  }

  /** Schema for a file-fed stream: the explicit schema when given,
    * else inferred eagerly from files already under `sourceDir`. An
    * ingestion dir that only receives files AFTER the monitor starts
    * is a normal state — inference throws there, so launch-time
    * callers pass the schema explicitly and this maps the inference
    * failure to an actionable message instead of a bare
    * AnalysisException.
    */
  def feedSchema(spark: SparkSession, sourceDir: String,
                 explicit: Option[org.apache.spark.sql.types.StructType]): org.apache.spark.sql.types.StructType =
    explicit.getOrElse {
      try spark.read.parquet(sourceDir).schema
      catch {
        case e: org.apache.spark.sql.AnalysisException =>
          throw new IllegalArgumentException(
            s"cannot infer the feed schema from '$sourceDir' (empty or " +
              "missing at launch) — pass an explicit schema for a dir " +
              "that receives files later", e)
      }
    }

  /** Write a small marker/stamp file: temp file + rename, so a reader
    * never observes a truncated in-place overwrite (create-with-
    * overwrite truncates BEFORE writing). The delete-then-rename pair
    * still leaves a tiny missing-file window, which [[readSmallText]]
    * maps to `None` — safe for every marker here.
    */
  def writeSmallText(spark: SparkSession, dir: String, name: String, value: String): Unit = {
    val f = fs(spark, dir)
    f.mkdirs(new Path(dir))
    val tmp = new Path(dir, s"$name.tmp")
    val out = f.create(tmp, true)
    try out.write(value.getBytes("UTF-8")) finally out.close()
    val dest = new Path(dir, name)
    if (f.exists(dest)) f.delete(dest, false)
    if (!f.rename(tmp, dest))
      throw new java.io.IOException(s"rename $tmp -> $dest failed")
  }
}
