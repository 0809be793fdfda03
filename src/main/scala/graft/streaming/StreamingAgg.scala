package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming variant of the TSDB aggregation: the same
  * epoch-aligned bucket/group semantics as `graft.tsdb.AggBuilder`, over
  * an unbounded source with watermarked state cleanup.
  *
  * Shape: `readStream` → canonicalize → watermark → window agg →
  * `writeStream`. At scale the state store is keyed by (metric, tag,
  * window) and the watermark bounds state size; late data past the
  * watermark is dropped exactly like any Spark streaming agg.
  */
object StreamingAgg {

  /** Raw events schema (ts as timestamp[µs], read as TIMESTAMP_NTZ). */
  val EventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampNTZType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-stream source over the events table (parquet). The glob must
    * target only event files — a whole-SF directory would project other
    * tables' files to all-null rows.
    */
  def eventsStream(spark: SparkSession, dir: String): DataFrame =
    // a glob (not a bare file path) lets the source derive its basePath
    // from the parent directory while selecting only event files
    spark.readStream.schema(EventsSchema).parquet(s"$dir/events*")

  /** Canonicalize + watermark + tumbling-window average per
    * (metric, tag_user). `width` is the bucket width.
    */
  def bucketedAvg(events: DataFrame, width: String = "1 day",
                  watermark: String = "1 hour"): DataFrame =
    events
      .select(
        col("event_type").as("metric"),
        // NTZ→TIMESTAMP is an identity on the stored micros under the
        // session's pinned UTC timezone; legacy int64-ns inputs are
        // likewise truncated to µs instants
        (events.schema("ts").dataType match {
          case LongType => timestamp_micros(expr("ts div 1000L"))
          case _        => col("ts").cast("timestamp")
        }).as("ts"),
        col("value"),
        col("user_id").cast("string").as("tag_user"))
      .withWatermark("ts", watermark)
      .groupBy(col("metric"), col("tag_user"), window(col("ts"), width))
      .agg(count(lit(1)).as("n"), avg(col("value")).as("value"))
      .select(col("metric"), col("tag_user").as("grp"),
        col("window.start").as("bucket_start"), col("n"), col("value"))

  /** Streaming bucketed SKETCH quantile — the unbounded-source face of
    * `Db.quantileApprox`: per (metric, tag_user, window), a
    * Greenwald-Khanna `approx_percentile` whose aggregation state is a
    * bounded-size summary (never the window's raw values) merged
    * associatively across micro-batches — the only quantile shape whose
    * streaming state survives a hot series. GK compression decisions
    * depend on merge order, so streamed and batch sketches need not be
    * bit-equal; both honor the same rank-error contract, which is what
    * the spec asserts.
    */
  def bucketedQuantile(events: DataFrame, q: Double = 0.95,
                       accuracy: Int = 10000, width: String = "1 day",
                       watermark: String = "1 hour"): DataFrame =
    events
      .select(
        col("event_type").as("metric"),
        (events.schema("ts").dataType match {
          case LongType => timestamp_micros(expr("ts div 1000L"))
          case _        => col("ts").cast("timestamp")
        }).as("ts"),
        col("value"),
        col("user_id").cast("string").as("tag_user"))
      .withWatermark("ts", watermark)
      .groupBy(col("metric"), col("tag_user"), window(col("ts"), width))
      .agg(count(lit(1)).as("n"),
        expr(s"approx_percentile(value, ${q}d, $accuracy)").as("value"))
      .select(col("metric"), col("tag_user").as("grp"),
        col("window.start").as("bucket_start"), col("n"), col("value"))
}
