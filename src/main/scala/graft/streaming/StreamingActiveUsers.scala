package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Streaming daily-active-users: watermarked tumbling-day windows with
  * an HLL++ `approx_count_distinct` per window — the Structured
  * Streaming face of [[graft.operators.Analytics.activeUsers]]'s DAU
  * column for the regime where an exact per-day user set no longer
  * fits the state store (at 100 TB the state per window is one
  * fixed-size sketch, not a user set; watermark expiry bounds the
  * number of live sketches).
  *
  * HLL sketches merge associatively and commutatively, so the
  * micro-batched result is IDENTICAL to a batch `approx_count_distinct`
  * over the same rows at the same precision — which is what the spec
  * asserts (not just a tolerance band).
  */
object StreamingActiveUsers {

  def dailyActive(events: DataFrame, watermark: String = "1 day",
                  rsd: Double = 0.05): DataFrame =
    events
      .select(
        (events.schema("ts").dataType match {
          case LongType => timestamp_micros(expr("ts div 1000L"))
          case _        => col("ts").cast("timestamp")
        }).as("ts"),
        col("user_id"))
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 day"))
      .agg(approx_count_distinct(col("user_id"), rsd).as("dau_approx"))
      .select(col("window.start").as("day"), col("dau_approx"))
}
