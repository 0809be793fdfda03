package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StreamingAggSpec extends SparkSpec with graft.TimedSpec {

  test("streaming windowed avg matches the batch aggregation") {
    val stream = StreamingAgg.eventsStream(spark, sfDir)
    assert(stream.isStreaming)
    val q = StreamingAgg.bucketedAvg(stream)
      .writeStream.format("memory").queryName("stream_agg")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("stream_agg")

    val batch = spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("event_type").as("metric"),
        col("ts").cast("timestamp").as("ts"),
        col("value"), col("user_id").cast("string").as("grp"))
      .groupBy(col("metric"), col("grp"), window(col("ts"), "1 day"))
      .agg(count(lit(1)).as("n"), avg(col("value")).as("value"))
      .select("metric", "grp", "n", "value")

    assert(got.count() == batch.count())
    val g = got.groupBy("metric").agg(sum("n").as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = batch.groupBy("metric").agg(sum("n").as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(g == b)
  }
}
