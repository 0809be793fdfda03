package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StreamingAlertsSpec extends SparkSpec with graft.TimedSpec {

  test("four-batch replay reproduces the batch islands minus each series' open day") {
    val out = StreamingAlerts.streamedAlerts(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getString(4))).sorted
    assert(out.nonEmpty)
    // brute: per series, exact-micros day totals in time order, the
    // literal state machine with gap resets, last day never finalized
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    val pts = raw.where(col("event_type") === "error")
      .select(col("user_id").cast("string").as("grp"),
        graft.tsdb.Db.tsNs(raw.schema).as("ts"), col("value"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val dayNs = 86400L * 1000000000L
    def mic(x: Double): Long =
      (BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        * BigDecimal(1000000)).toLongExact
    val expected = Seq.newBuilder[(String, Long, Double, Long, String)]
    pts.groupBy(_._1).foreach { case (grp, rows) =>
      val byDay = rows.groupBy(_._2 / dayNs).view
        .mapValues(_.map(r => mic(r._3)).sum).toSeq.sortBy(_._1)
      var run = 0L
      byDay.zipWithIndex.foreach { case ((day, total), i) =>
        val isLast = i == byDay.length - 1
        val gapBefore = i > 0 && day > byDay(i - 1)._1 + 1
        if (gapBefore) run = 0L
        val breach = total > 60000000L
        run = if (breach) run + 1 else 0L
        if (breach && !isLast)
          expected += ((grp, day * dayNs, total.toDouble / 1000000.0, run,
            if (run >= 3) "firing" else "pending"))
      }
    }
    assert(out.sameElements(expected.result().sorted))
    // both lifecycle states must occur, or the gate proves nothing
    val states = out.map(_._5).toSet
    assert(states == Set("pending", "firing"), s"degenerate states: $states")
  }
}
