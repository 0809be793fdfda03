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

  test("streaming sketch quantile honors the GK rank-error contract per window") {
    val stream = StreamingAgg.eventsStream(spark, sfDir)
      .where(col("event_type") === "view")
    val q = StreamingAgg.bucketedQuantile(stream)
      .writeStream.format("memory").queryName("stream_q")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("stream_q").collect()
      .map(r => (r.getString(0), r.getString(1), r.getTimestamp(2).getTime) ->
        (r.getLong(3), r.getDouble(4))).toMap
    assert(got.nonEmpty)

    val grouped = spark.read.parquet(s"$sfDir/events.parquet")
      .where(col("event_type") === "view")
      .select(col("event_type").as("metric"), col("ts").cast("timestamp").as("ts"),
        col("value"), col("user_id").cast("string").as("grp"))
      .groupBy(col("metric"), col("grp"), window(col("ts"), "1 day"))
      .agg(collect_list(col("value")).as("vs"))
      .collect()
      .map(r => (r.getString(0), r.getString(1),
        r.getStruct(2).getTimestamp(0).getTime) ->
        r.getSeq[Double](3).sorted).toMap
    assert(got.keySet == grouped.keySet)
    got.foreach { case (k, (n, v)) =>
      val vs = grouped(k)
      assert(n == vs.length)
      val firstRank = vs.indexWhere(_ == v) + 1
      assert(firstRank >= 1, s"window $k: $v is not an actual data point")
      val lastRank = vs.lastIndexWhere(_ == v) + 1
      val target = math.ceil(0.95 * vs.length).toInt
      val slack = math.ceil(vs.length / 10000.0).toInt + 1
      assert(firstRank - slack <= target && target <= lastRank + slack,
        s"window $k: $v ranks [$firstRank,$lastRank], target $target ± $slack")
    }
  }

  test("streamed decimal partials compact to the batch ts_avg, bit-exactly") {
    import org.apache.spark.sql.functions._
    val got = StreamingAgg.streamedAvg(spark, sfDir)
      .collect().map(r => (r.getAs[String]("grp"), r.getAs[Long]("bucket_start")) ->
        ((r.getAs[Long]("n"), r.getAs[Double]("value")))).toMap
    val batch = graft.tsdb.Db.fromEvents(spark, sfDir)
      .avg("purchase", "user").granularity(graft.tsdb.Duration.days(1)).build()
      .collect().map(r => (r.getAs[String]("grp"), r.getAs[Long]("bucket_start")) ->
        ((r.getAs[Long]("n"), r.getAs[Double]("value")))).toMap
    assert(got == batch)
  }
}
