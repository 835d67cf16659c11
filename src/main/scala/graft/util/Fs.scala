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
}
