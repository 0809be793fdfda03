package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StreamingTransitionsSpec extends SparkSpec with graft.TimedSpec {

  test("single-pass stateful transitions match the batch lag-window matrix") {
    val stream = StreamingAgg.eventsStream(spark, sfDir)
    val q = StreamingTransitions.transitionPairs(stream)
      .writeStream.format("memory").queryName("trans_pairs")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("trans_pairs")
      .groupBy("src", "dst").agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val batch = graft.operators.Analytics.eventTransitions(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == batch)
  }

  test("four-batch replay reproduces the batch matrix bit-exactly via state carry") {
    val got = StreamingTransitions.streamedTransitions(spark, sfDir)
      .collect().map(_.toString).sorted
    val batch = graft.operators.Analytics.eventTransitions(spark, sfDir)
      .collect().map(_.toString).sorted
    assert(got.nonEmpty && got.sameElements(batch))
    // the equality above is only evidence of state carry if transitions
    // actually SPAN chunk boundaries: count per-user adjacent pairs
    // whose events land in different quarters of the time span
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    val ev = raw.select(col("user_id"), graft.tsdb.Db.tsNs(raw.schema).as("ts"),
        col("event_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val lo = ev.map(_._2).min
    val span = math.max(ev.map(_._2).max - lo + 1, 4L)
    def chunk(ts: Long): Long = math.min((ts - lo) * 4 / span, 3L)
    val boundary = ev.groupBy(_._1).values.map { rows =>
      val seq = rows.sortBy(r => (r._2, r._3))
      seq.zip(seq.drop(1)).count(p => chunk(p._1._2) != chunk(p._2._2))
    }.sum
    assert(boundary > 0, "no transition spans a micro-batch boundary; the replay proves nothing")
  }
}
