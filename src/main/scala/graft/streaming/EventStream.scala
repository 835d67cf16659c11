package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Streaming analytics over the events feed (SURVEY A20): watermarked
  * tumbling-window aggregation, the Structured Streaming twin of the
  * batch `q_events_window` operator.
  *
  * Watermark bounds state; append mode emits only finalized windows —
  * the standard at-scale configuration (late data beyond the watermark
  * is dropped deterministically rather than growing state forever).
  */
object EventStream {

  def fileFeed(spark: SparkSession, dir: String, schema: StructType,
               maxFilesPerTrigger: Int = 10): DataFrame =
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger).parquet(dir)

  /** Tumbling-window counts/sums per event type with a watermark. */
  def windowedAgg(feed: DataFrame, watermark: String = "1 hour",
                  windowLen: String = "1 hour"): DataFrame =
    feed.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))
}
