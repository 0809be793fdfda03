package graft.tsdb

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Seeded property fuzz for the round-4 TSDB operators: random series
  * against straightforward Scala references.
  */
class TsdbFuzzSpec extends SparkSpec {

  private val rnd = new scala.util.Random(20260812L)

  private def randomDb(n: Int, users: Int, spanNs: Long): Db = {
    import spark.implicits._
    val rows = (1 to n).map { _ =>
      ("m", (rnd.nextDouble() * spanNs).toLong, (rnd.nextInt(2000) - 1000) / 10.0,
        s"u${rnd.nextInt(users)}")
    }
    new Db(rows.toDF("metric", "ts", "value", "tag_user"))
  }

  test("rollup == direct aggregation on random series for random aligned widths") {
    (1 to 4).foreach { trial =>
      val db = randomDb(200 + rnd.nextInt(800), 1 + rnd.nextInt(6),
        Duration.days(3))
      val rw = Duration.minutes(1 + rnd.nextInt(120))
      val mult = 1 + rnd.nextInt(6)
      val dir = s"/root/repo/out/test_rollup_fuzz"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
      Ingest.writeRollup(db, dir, rw)
      val rollup = Ingest.openRollup(spark, dir, rw)
      def key(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
      for (kind <- Seq[AggKind](AggKind.Avg, AggKind.Sum, AggKind.Min,
        AggKind.Max, AggKind.Count)) {
        val direct = AggBuilder(db, kind, "m", "user")
          .granularity(rw * mult).build()
        assert(key(rollup.agg(kind, "m", "user", rw * mult)) == key(direct),
          s"trial $trial kind $kind rollup width $rw mult $mult")
      }
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("gapfill invariants on random sparse series") {
    (1 to 3).foreach { trial =>
      val db = randomDb(30 + rnd.nextInt(60), 1 + rnd.nextInt(4), Duration.days(20))
      val w = Duration.days(1)
      val out = db.avg("m", "user").granularity(w).buildGapFilled().collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getDouble(3), r.getBoolean(4)))
      val byGrp = out.groupBy(_._1)
      byGrp.foreach { case (g, rows) =>
        val buckets = rows.map(_._2).sorted
        // contiguous: every width-multiple between min and max present once
        assert(buckets.distinct.length == buckets.length)
        assert(buckets.zip(buckets.tail).forall { case (a, b) => b - a == w },
          s"trial $trial grp $g not contiguous")
        // filled rows carry n=0 and the previous real value; real rows n>0
        val sorted = rows.sortBy(_._2)
        var lastReal = Double.NaN
        sorted.foreach { case (_, _, n, v, filled) =>
          if (filled) {
            assert(n == 0)
            assert(v == lastReal)
          } else {
            assert(n > 0)
            lastReal = v
          }
        }
        // first bucket of a span is never filled
        assert(!sorted.head._5)
      }
    }
  }

  test("asofAlign == per-row brute force on random two-metric streams") {
    import spark.implicits._
    (1 to 3).foreach { trial =>
      val users = 1 + rnd.nextInt(3)
      val left = (1 to 40).map(_ =>
        ("l", rnd.nextInt(1000).toLong, rnd.nextInt(100).toDouble, s"u${rnd.nextInt(users)}"))
      val right = (1 to 40).map(_ =>
        ("r", rnd.nextInt(1000).toLong, rnd.nextInt(100).toDouble, s"u${rnd.nextInt(users)}"))
      val db = new Db((left ++ right).toDF("metric", "ts", "value", "tag_user"))
      val got = db.asofAlign("l", "r").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)) ->
          (Option(r.getAs[java.lang.Double]("asof_value")),
            Option(r.getAs[java.lang.Long]("asof_ts")))).toMap
      // brute force: per left row, the max right value at the greatest ts' <= ts
      val rightByUser = right.groupBy(_._4)
      left.foreach { case (_, ts, v, u) =>
        val cands = rightByUser.getOrElse(u, Seq.empty).filter(_._2 <= ts)
        val expect = if (cands.isEmpty) (None, None) else {
          val bestTs = cands.map(_._2).max
          (Some(cands.filter(_._2 == bestTs).map(_._3).max), Some(bestTs))
        }
        assert(got((u, ts, v)) == expect, s"trial $trial user $u ts $ts")
      }
    }
  }

  test("plan: the rollup query partition-prunes the metric directory") {
    val dir = "/root/repo/out/test_rollup_plan"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    Ingest.writeRollup(Db.fromEvents(spark, sfDir), dir, Duration.hours(1))
    val plan = Ingest.openRollup(spark, dir, Duration.hours(1))
      .avg("purchase", "user", Duration.days(1))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("purchase"), s"plan:\n${plan.take(2000)}")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }
}
