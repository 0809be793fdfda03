package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StatefulSessionizeSpec extends SparkSpec with graft.TimedSpec {

  test("stateful streaming sessionize matches the batch window sessionize") {
    val stream = StreamingAgg.eventsStream(spark, sfDir)
    val q = StatefulSessionize.sessionize(stream)
      .writeStream.format("memory").queryName("sess_state")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("sess_state")

    val batch = graft.operators.Analytics.sessionize(spark, sfDir)
    assert(got.count() == batch.count())
    // identical per-user session counts and identical max session ids
    val g = got.groupBy("user_id").agg(max("session_id").as("m")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = batch.groupBy("user_id").agg(max("session_id").as("m")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(g == b)
  }

  test("time-ordered four-batch replay reproduces the batch session ids exactly") {
    val got = StatefulSessionize.streamedSessions(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3))).toSet
    val batch = graft.operators.Analytics.sessionize(spark, sfDir)
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("ts"),
        r.getAs[String]("event_type"), r.getAs[Long]("session_id"))).toSet
    assert(got == batch)
  }
}
