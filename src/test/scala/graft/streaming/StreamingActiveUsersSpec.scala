package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StreamingActiveUsersSpec extends SparkSpec with graft.TimedSpec {

  test("streaming daily approx-distinct users equals the batch sketch and bounds the exact count") {
    val stream = StreamingAgg.eventsStream(spark, sfDir)
    val q = StreamingActiveUsers.dailyActive(stream)
      .writeStream.format("memory").queryName("dau_stream")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("dau_stream").collect()
      .map(r => r.getTimestamp(0).getTime -> r.getLong(1)).toMap

    val batch = spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("ts").cast("timestamp").as("ts"), col("user_id"))
    val batchApprox = batch
      .groupBy(window(col("ts"), "1 day"))
      .agg(approx_count_distinct(col("user_id"), 0.05).as("n"))
      .select(col("window.start").as("day"), col("n")).collect()
      .map(r => r.getTimestamp(0).getTime -> r.getLong(1)).toMap
    // HLL sketches merge associatively: micro-batched == one-shot batch
    assert(got.nonEmpty && got == batchApprox)

    // and the estimate sits within the configured error of the truth
    val exact = batch
      .groupBy(window(col("ts"), "1 day"))
      .agg(countDistinct(col("user_id")).as("n"))
      .select(col("window.start").as("day"), col("n")).collect()
      .map(r => r.getTimestamp(0).getTime -> r.getLong(1)).toMap
    assert(got.keySet == exact.keySet)
    exact.foreach { case (d, n) =>
      val est = got(d).toDouble
      assert(math.abs(est - n) <= math.max(4.0, 4 * 0.05 * n),
        s"day $d: estimate $est vs exact $n out of band")
    }
  }

  test("streamed exact DAU equals the batch distinct count per day") {
    import org.apache.spark.sql.functions._
    val got = StreamingActiveUsers.streamedDau(spark, sfDir)
      .collect().map(r => r.getAs[Long]("day") -> r.getAs[Long]("dau")).toMap
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    val ev = raw.select(graft.tsdb.Db.tsNs(raw.schema).as("tsns"), col("user_id"))
      .select((expr("tsns div 86400000000000L") * lit(86400000000000L)).as("day"),
        col("user_id"))
    val exact = ev.distinct().groupBy("day").count()
      .collect().map(r => r.getAs[Long]("day") -> r.getAs[Long]("count")).toMap
    assert(got == exact)
  }
}
