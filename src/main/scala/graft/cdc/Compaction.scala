package graft.cdc

import scala.util.chaining._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Small-file compaction planning over a store manifest.
  *
  * At 100 TB the bucketed parquet store's operational failure mode is
  * file-count explosion: every incremental cycle appends small files
  * per bucket (see BucketedLayout), and scan cost degrades with open()
  * count long before byte count. The planner turns a manifest
  * (bucket, file, rows) into deterministic merge groups: files below
  * the small-file threshold pack greedily IN FILE ORDER into groups of
  * ~targetRows (each group closes once its cumulative row count
  * crosses the target), files at/above threshold pass through as
  * `keep` singletons.
  *
  * Determinism/scale shape: ONE window partitioned by bucket over the
  * MANIFEST (file-cardinality rows, never data rows) computes the
  * running total; group identity `(cum − rows) DIV target` is pure
  * BIGINT floor arithmetic, so the plan replays identically in any
  * engine and is insensitive to partition layout. The data itself is
  * never read — executing the plan is a per-group rewrite job.
  */
object Compaction {

  def plan(manifest: DataFrame, bucketCol: String, fileCol: String,
           rowsCol: String, targetRows: Long, smallThreshold: Long)
      : DataFrame = {
    require(targetRows > 0 && smallThreshold > 0,
      "targetRows and smallThreshold must be positive")
    val small = manifest.filter(col(rowsCol) < smallThreshold)
    val big = manifest.filter(col(rowsCol) >= smallThreshold)
    val w = Window.partitionBy(col(bucketCol)).orderBy(col(fileCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val merged = small
      .withColumn("__cum", sum(col(rowsCol)).over(w))
      .withColumn("__grp",
        expr(s"(__cum - $rowsCol) DIV ${targetRows}L"))
      .groupBy(col(bucketCol).as("bucket"), col("__grp"))
      .agg(count(lit(1)).as("n_files"),
        sum(col(rowsCol)).as("rows_total"),
        min(col(fileCol)).as("file_lo"),
        max(col(fileCol)).as("file_hi"))
      .select(col("bucket"),
        when(col("n_files") > 1L, lit("merge")).otherwise(lit("keep"))
          .as("action"),
        col("n_files"), col("rows_total"), col("file_lo"), col("file_hi"))
    val kept = big.select(col(bucketCol).as("bucket"),
      lit("keep").as("action"), lit(1L).as("n_files"),
      col(rowsCol).cast("long").as("rows_total"),
      col(fileCol).as("file_lo"), col(fileCol).as("file_hi"))
    merged.unionByName(kept)
  }

  /** EXECUTE file-level compaction against a [[BucketedLayout]]
    * `gb=` store: the manifest comes from the FileSystem LISTING
    * (file length in bytes — metadata only, no footer reads), the
    * grouping is [[plan]]'s greedy in-order packing per bucket, and
    * each merge group's parquet files rewrite into one file while
    * big files MOVE (rename, no byte copy) — so the cost is
    * proportional to the small-file bytes, never the store.
    *
    * Contract: single-writer OFFLINE maintenance (the VACUUM slot) —
    * readers between the big-file renames and the final swap see a
    * partial bucket. Crash windows, healed by the recovery pass that
    * runs first on every invocation:
    *  - staging WITHOUT `_SUCCESS`: the run died mid-assembly. Moved
    *    files rename BACK into the live dir (their names are
    *    unchanged), derived `merged-*` files are deleted — the store
    *    returns to its pre-run state byte-for-byte.
    *  - staging WITH `_SUCCESS`: assembly finished; the staged dir
    *    holds the COMPLETE bucket. Finish the swap (the live dir, if
    *    still present, contains only merge-group sources whose rows
    *    are inside the staged merged file).
    *
    * @return per-bucket summary (bucket, files_before, files_after,
    *         groups_merged)
    */
  def compactStore(spark: org.apache.spark.sql.SparkSession, destPath: String,
                   targetBytes: Long, smallBytes: Long)
      : Seq[(Int, Int, Int, Int)] = {
    import org.apache.hadoop.fs.Path
    import graft.util.Fs
    val f = Fs.fs(spark, destPath)
    recoverCompact(spark, destPath)
    val buckets = if (!f.exists(new Path(destPath))) Array.empty[Path]
      else f.listStatus(new Path(destPath)).map(_.getPath)
        .filter(_.getName.startsWith(s"${BucketedLayout.GB}="))
    buckets.toSeq.map { dir =>
      val k = dir.getName.stripPrefix(s"${BucketedLayout.GB}=").toInt
      val files = f.listStatus(dir).map(_.getPath)
        .filter(p => p.getName.endsWith(".parquet"))
        .sortBy(_.getName)
      val sizes = files.map(p => f.getFileStatus(p).getLen)
      // greedy in-order packing over the small files (plan()'s rule,
      // evaluated here on the per-bucket listing: file counts are
      // bounded per bucket, the cross-bucket loop is the driver's)
      val smallIdx = files.indices.filter(i => sizes(i) < smallBytes)
      var cum = 0L
      val groups = smallIdx.groupBy { i =>
        cum += sizes(i); (cum - sizes(i)) / targetBytes
      }.toSeq.sortBy(_._1).map(_._2).filter(_.length > 1)
      if (groups.isEmpty) (k, files.length, files.length, 0)
      else {
        val staging = new Path(s"$destPath/__staging_filecompact/${dir.getName}")
        f.mkdirs(staging)
        // per-run nonce distinguishes THIS run's derived merged files
        // from a prior run's merged-* file moved in as a keeper — the
        // mid-assembly recovery must delete the former and restore
        // the latter (without the nonce, a keeper named merged-* from
        // an earlier run would be misdeleted: data loss)
        val nonce = java.util.UUID.randomUUID().toString.take(8)
        val mk = f.create(new Path(staging, "_NONCE"))
        mk.write(nonce.getBytes("UTF-8")); mk.close()
        val inGroups = groups.flatten.toSet
        groups.zipWithIndex.foreach { case (idxs, gi) =>
          val tmp = new Path(staging, s"__tmp_grp$gi")
          spark.read.parquet(idxs.map(i => files(i).toString): _*)
            .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
          val part = f.listStatus(tmp)
            .map(_.getPath).filter(_.getName.endsWith(".parquet")).head
          if (!f.rename(part,
              new Path(staging, f"merged-$nonce-$gi%05d.parquet")))
            throw new java.io.IOException(s"rename of merged group $gi failed")
          f.delete(tmp, true)
        }
        // untouched files MOVE (metadata-only) into the staged dir
        files.indices.filterNot(inGroups).foreach { i =>
          if (!f.rename(files(i), new Path(staging, files(i).getName)))
            throw new java.io.IOException(s"rename of kept ${files(i)} failed")
        }
        f.delete(new Path(staging, "_NONCE"), false)
        f.create(new Path(staging, "_SUCCESS")).close()
        Fs.replace(spark, staging.toString, dir.toString)
        (k, files.length, files.length - inGroups.size + groups.length,
          groups.length)
      }
    }.sortBy(_._1).tap { _ =>
      Fs.delete(spark, s"$destPath/__staging_filecompact")
    }
  }

  /** Heal an interrupted [[compactStore]] — see its crash-window
    * contract. Returns true if anything was repaired.
    */
  def recoverCompact(spark: org.apache.spark.sql.SparkSession,
                     destPath: String): Boolean = {
    import org.apache.hadoop.fs.Path
    import graft.util.Fs
    val f = Fs.fs(spark, destPath)
    val root = new Path(s"$destPath/__staging_filecompact")
    if (!f.exists(root)) return false
    var repaired = false
    f.listStatus(root).map(_.getPath)
      .filter(_.getName.startsWith(s"${BucketedLayout.GB}=")).foreach { st =>
      val live = new Path(s"$destPath/${st.getName}")
      if (f.exists(new Path(st, "_SUCCESS"))) {
        // assembly complete: finish the swap (live remnants are
        // merge-group sources already inside the staged merged file)
        Fs.replace(spark, st.toString, live.toString)
        repaired = true
      } else {
        // mid-assembly: move untouched files back, drop ONLY this
        // run's derived files (identified by the staged nonce — a
        // prior run's merged-* file moved in as a keeper restores)
        val nonce = {
          val np = new Path(st, "_NONCE")
          if (f.exists(np)) {
            val in = f.open(np)
            try new String(in.readAllBytes(), "UTF-8").trim finally in.close()
          } else ""
        }
        f.listStatus(st).map(_.getPath).foreach { p =>
          val name = p.getName
          if (name == "_NONCE" || name.startsWith("__tmp_") ||
              (nonce.nonEmpty && name.startsWith(s"merged-$nonce-")))
            f.delete(p, true)
          else if (!f.exists(new Path(live, name)))
            if (!f.rename(p, new Path(live, name)))
              throw new java.io.IOException(s"recovery rename $p failed")
        }
        f.delete(st, true)
        repaired = true
      }
    }
    Fs.delete(spark, root.toString)
    repaired
  }
}
