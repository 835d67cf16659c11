package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated TPC-H-ish parquet tables.
  *
  * All graft operators take an `sfDir` (scale-factor directory) and read
  * via these helpers so scans stay column-pruned / filter-pushed: callers
  * `.select()` immediately after load and Catalyst pushes the projection
  * into the parquet reader.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, table: String): DataFrame =
    spark.read.parquet(s"$sfDir/$table.parquet")

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "region")
  /** The events table carries a nanosecond parquet timestamp, which
    * Spark 4 only reads via `spark.sql.legacy.parquet.nanosAsLong`
    * (set in Verify/Bench/test sessions). Normalize it back to a
    * microsecond TimestampType here so every operator sees `ts` as a
    * plain timestamp regardless of the underlying physical type.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.LongType
    val df = load(spark, sfDir, "events")
    if (df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")

  /** Spread a compute-heavy SCAN across the cluster when the input
    * arrives in fewer splits than there are cores — the "input skew"
    * fix (one small/unsplittable file serializes a per-row-expensive
    * stage onto one task) made scale-adaptive: at real corpus sizes
    * the scan already has >= defaultParallelism splits and this is a
    * NO-OP — no exchange is added — so the repartition only exists
    * exactly where the alternative is idle cores. Deterministic hash
    * partitioning on `key` (never round-robin: retried tasks must
    * reproduce the same row placement). Call ONLY on shuffle-free
    * scan lineage: probing partition count compiles the plan, which
    * on a plan with exchanges would run its map stages early.
    */
  def spread(df: DataFrame, key: org.apache.spark.sql.Column): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target, key) else df
  }
}
