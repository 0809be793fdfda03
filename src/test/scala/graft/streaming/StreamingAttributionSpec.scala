package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StreamingAttributionSpec extends SparkSpec with graft.TimedSpec {

  test("single-pass stateful credits match the batch running-frame attribution") {
    val stream = StreamingAgg.eventsStream(spark, sfDir)
    val q = StreamingAttribution.creditStream(stream)
      .writeStream.format("memory").queryName("attr_credits")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("attr_credits")
      .groupBy(col("touch"))
      .agg(count(lit(1)).as("n_conv"),
        sum(col("value").cast("decimal(28,6)")).cast("double").as("revenue"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val batch = graft.operators.Analytics.attribution(spark, sfDir)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got == batch)
  }

  test("four-batch replay reproduces batch attribution bit-exactly via state carry") {
    val got = StreamingAttribution.streamedAttribution(spark, sfDir)
      .collect().map(_.toString).sorted
    val batch = graft.operators.Analytics.attribution(spark, sfDir)
      .collect().map(_.toString).sorted
    assert(got.nonEmpty && got.sameElements(batch))
    // equality is only evidence of state carry if some purchase's
    // credited touch lands in an EARLIER quarter of the time span
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    val ev = raw.select(col("user_id"), graft.tsdb.Db.tsNs(raw.schema).as("ts"),
        col("event_id"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val lo = ev.map(_._2).min
    val span = math.max(ev.map(_._2).max - lo + 1, 4L)
    def chunk(ts: Long): Long = math.min((ts - lo) * 4 / span, 3L)
    val boundary = ev.groupBy(_._1).values.map { rows =>
      val seq = rows.sortBy(r => (r._2, r._3))
      var lastTouch: Option[Long] = None // chunk of the latest non-purchase
      var n = 0
      seq.foreach { case (_, ts, _, tpe) =>
        if (tpe == "purchase") {
          if (lastTouch.exists(_ != chunk(ts))) n += 1
        } else lastTouch = Some(chunk(ts))
      }
      n
    }.sum
    assert(boundary > 0, "no credit spans a micro-batch boundary; the replay proves nothing")
  }
}
