package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.StructType

/** Open session being accumulated for one user (all times epoch ms). */
case class SessionAgg(startMs: Long, lastMs: Long, n: Long)

/** A closed session emitted by [[EventStream.sessionize]]. */
case class SessionOut(user_id: Long, session_start_ms: Long,
                      session_end_ms: Long, n_events: Long)

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

  /** Stream-stream interval join: every click correlated with the same
    * user's purchases in the preceding `horizon` — the two-feed
    * correlation shape (attribution, feature freshness). BOTH sides
    * carry watermarks and the join condition bounds event-time
    * distance, so Spark provably expires join state: memory stays
    * O(horizon · rate) at any corpus size.
    */
  def intervalJoin(feed: DataFrame, watermark: String = "1 hour",
                   horizonExpr: String = "INTERVAL 1 HOUR"): DataFrame = {
    val clicks = feed.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("click_ts"), col("event_id").as("click_id"))
      .withWatermark("click_ts", watermark)
    val purchases = feed.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"))
      .withWatermark("p_ts", watermark)
    clicks.join(purchases,
      expr(s"user_id = p_user AND p_ts BETWEEN click_ts - $horizonExpr AND click_ts"))
      .select(col("click_id"), col("user_id"), col("purchase_id"),
        col("click_ts"), col("p_ts"))
  }

  /** Streaming sessionization with CUSTOM state (the capability the
    * windowed APIs can't express): per-user sessions closed after
    * `gapMinutes` of inactivity, via
    * `flatMapGroupsWithState` + event-time timeout. State per key is a
    * single open-session triple; the watermark both bounds state and
    * fires the timeouts that flush idle sessions. Gap semantics match
    * the batch `q_events_sessionize` operator (a gap strictly greater
    * than `gapMinutes` starts a new session).
    */
  def sessionize(feed: DataFrame, gapMinutes: Int = 30): Dataset[SessionOut] = {
    val spark = feed.sparkSession
    import spark.implicits._
    val gapMs = gapMinutes * 60000L
    feed
      .withWatermark("ts", s"$gapMinutes minutes")
      // keep the watermarked ts column itself — projecting it away
      // (e.g. to epoch ms) severs watermark tracking and event-time
      // timeouts are rejected at analysis
      .select(col("user_id").cast("long").as[Long],
        col("ts").as[java.sql.Timestamp])
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionAgg, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (uid, rows, state: GroupState[SessionAgg]) =>
          if (state.hasTimedOut) {
            // watermark passed lastMs + gap: the open session is final
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(uid, s.startMs, s.lastMs, s.n))
          } else {
            val times = rows.map(_._2.getTime).toArray.sorted
            val closed = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
            var cur = state.getOption
            times.foreach { t =>
              cur = cur match {
                case Some(s) if t - s.lastMs <= gapMs =>
                  Some(SessionAgg(s.startMs, math.max(s.lastMs, t), s.n + 1))
                case Some(s) =>
                  closed += SessionOut(uid, s.startMs, s.lastMs, s.n)
                  Some(SessionAgg(t, t, 1))
                case None => Some(SessionAgg(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastMs + gapMs + 1)
            }
            closed.iterator
          }
      }
  }
}
