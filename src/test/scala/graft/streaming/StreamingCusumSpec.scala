package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StreamingCusumSpec extends SparkSpec with graft.TimedSpec {

  test("four-batch replay lands the exact batch drawdown integers via two-long state") {
    val out = StreamingCusum.streamedCusum(spark, sfDir, "signup").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getBoolean(5))).sorted
    assert(out.nonEmpty)
    // brute: per series, thresholds off the round-6 chain, then the
    // literal recursion in int64 half-micros over (ts, value) order
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    val pts = raw.where(col("event_type") === "signup")
      .select(
        concat_ws("|", col("user_id").cast("string"),
          coalesce(nullif(regexp_extract(col("props"), "\"k\":\\s*(\\d+)", 1),
            lit("")), lit("∅"))).as("series"),
        graft.tsdb.Db.tsNs(raw.schema).as("ts"), col("value"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def hm(x: Double): Long =
      (BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        * BigDecimal(2000000)).toLongExact
    val expected = Seq.newBuilder[(String, Long, Double, Double, Double, Boolean)]
    pts.groupBy(_._1).foreach { case (series, rows) =>
      val vs = rows.map(_._3)
      val dec = vs.map(v => BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP))
      val s = dec.sum.toDouble
      val sq = dec.map(d => d * d).sum.toDouble
      val mu = r6(s / vs.length)
      val sigma = r6(math.sqrt(math.max((sq - s * s / vs.length) / vs.length, 0.0)))
      val (mu2, sig1) = (hm(mu), hm(sigma) / 2)
      val (thHi, thLo, alarmH) = (mu2 + sig1, mu2 - sig1, 5 * sig1)
      var (sHi, sLo) = (0L, 0L)
      rows.sortBy(r => (r._2, r._3)).foreach { case (_, ts, v) =>
        sHi = math.max(0L, sHi + hm(v) - thHi)
        sLo = math.max(0L, sLo + thLo - hm(v))
        expected += ((series, ts, v, sHi.toDouble / 2000000.0,
          sLo.toDouble / 2000000.0, sHi > alarmH || sLo > alarmH))
      }
    }
    assert(out.sameElements(expected.result().sorted))
    // the carry is only proven if series genuinely span chunk boundaries
    val lo = pts.map(_._2).min
    val span = math.max(pts.map(_._2).max - lo + 1, 4L)
    def chunk(ts: Long): Long = math.min((ts - lo) * 4 / span, 3L)
    val spanning = pts.groupBy(_._1).values
      .count(rows => rows.map(r => chunk(r._2)).distinct.length > 1)
    assert(spanning > 0, "no series spans a micro-batch boundary; the replay proves nothing")
  }
}
