package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.tsdb.{Db, Duration}

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  private val Day  = Duration.days(1)
  private val Week = Duration.weeks(1)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Db.fromEvents(spark, "/root/testdata/sf0.001")
      .avg("purchase", "user").granularity(Day).build()

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- TSDB core (talna parity) ----
    "ts_avg" -> ((s, d) => Db.fromEvents(s, d).avg("purchase", "user").granularity(Day).build()),
    "ts_sum" -> ((s, d) => Db.fromEvents(s, d).sum("click", "user").granularity(Day).build()),
    "ts_min" -> ((s, d) => Db.fromEvents(s, d).min("error", "user").granularity(Day).build()),
    "ts_max" -> ((s, d) => Db.fromEvents(s, d).max("view", "user").granularity(Day).build()),
    "ts_count" -> ((s, d) => Db.fromEvents(s, d).count("signup", "user").granularity(Day).build()),
    "ts_filter_and" -> ((s, d) =>
      Db.fromEvents(s, d).avg("view", "user").filter("k:1* AND user:1*").granularity(Day).build()),
    "ts_filter_or" -> ((s, d) =>
      Db.fromEvents(s, d).sum("click", "user").filter("k:11 OR k:22 OR k:33").granularity(Day).build()),
    "ts_filter_not" -> ((s, d) =>
      Db.fromEvents(s, d).count("error", "user").filter("!k:1*").granularity(Day).build()),
    "ts_filter_wildcard" -> ((s, d) =>
      Db.fromEvents(s, d).avg("purchase", "k").filter("user:1*").granularity(Day).build()),
    "ts_filter_nested" -> ((s, d) =>
      Db.fromEvents(s, d).avg("purchase", "user")
        .filter("user:1* AND (k:2* OR k:3*)").granularity(Day).build()),
    "ts_filter_allstar" -> ((s, d) =>
      Db.fromEvents(s, d).count("view", "user").filter("*").granularity(Day).build()),
    "ts_range" -> ((s, d) =>
      Db.fromEvents(s, d).sum("purchase", "user")
        .start(1704844800000000000L) // 2024-01-10
        .end(1705708800000000000L)   // 2024-01-20 (inclusive, like the reference)
        .granularity(Day).build()),
    "ts_latest" -> ((s, d) => Db.fromEvents(s, d).latest("purchase", 5)),
    "ts_raw" -> ((s, d) => Db.fromEvents(s, d).scan("error", "user:1*")),
    "ts_multi_tag_group" -> ((s, d) =>
      Db.fromEvents(s, d).avg("purchase", "k").granularity(Week).build()),
  )

  // ---- DuckDB oracle SQL ----
  // Canonical series view: DuckDB truncates parquet ns timestamps to µs,
  // so the Spark side (Db.fromEvents) truncates its ns longs identically.
  private val Ev =
    """WITH ev AS (
      |  SELECT event_type AS metric, epoch_ns(ts) AS ts, value,
      |         CAST(user_id AS VARCHAR) AS tag_user,
      |         regexp_extract(props, '"k":\s*(\d+)', 1) AS tag_k
      |  FROM events
      |)""".stripMargin

  private def bucket(width: Long) = s"(ts // ${width}) * ${width}"
  private val AvgV = "round(CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE)/COUNT(*), 6) AS value"
  private val SumV = "CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS value"
  private val CntV = "CAST(COUNT(*) AS DOUBLE) AS value"

  private def tsAgg(metric: String, grp: String, valueSql: String,
                    where: String = "TRUE", width: Long = Day): String =
    s"""$Ev
       |SELECT tag_$grp AS grp, ${bucket(width)} AS bucket_start,
       |       COUNT(*) AS n, $valueSql
       |FROM ev
       |WHERE metric = '$metric' AND tag_$grp IS NOT NULL AND ($where)
       |GROUP BY 1, 2""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "ts_avg"   -> tsAgg("purchase", "user", AvgV),
    "ts_sum"   -> tsAgg("click", "user", SumV),
    "ts_min"   -> tsAgg("error", "user", "MIN(value) AS value"),
    "ts_max"   -> tsAgg("view", "user", "MAX(value) AS value"),
    "ts_count" -> tsAgg("signup", "user", CntV),
    "ts_filter_and" -> tsAgg("view", "user", AvgV,
      "tag_k LIKE '1%' AND tag_user LIKE '1%'"),
    "ts_filter_or" -> tsAgg("click", "user", SumV,
      "tag_k = '11' OR tag_k = '22' OR tag_k = '33'"),
    "ts_filter_not" -> tsAgg("error", "user", CntV,
      "NOT coalesce(tag_k LIKE '1%', FALSE)"),
    "ts_filter_wildcard" -> tsAgg("purchase", "k", AvgV, "tag_user LIKE '1%'"),
    "ts_filter_nested" -> tsAgg("purchase", "user", AvgV,
      "tag_user LIKE '1%' AND (tag_k LIKE '2%' OR tag_k LIKE '3%')"),
    "ts_filter_allstar" -> tsAgg("view", "user", CntV),
    "ts_range" -> tsAgg("purchase", "user", SumV,
      "ts >= 1704844800000000000 AND ts <= 1705708800000000000"),
    "ts_latest" ->
      s"""$Ev
         |SELECT metric, ts, value, tag_user, tag_k FROM (
         |  SELECT *, row_number() OVER (
         |    PARTITION BY tag_user, tag_k ORDER BY ts DESC, value DESC) AS rn
         |  FROM ev WHERE metric = 'purchase'
         |) WHERE rn <= 5""".stripMargin,
    "ts_raw" ->
      s"""$Ev
         |SELECT metric, ts, value, tag_user, tag_k
         |FROM ev WHERE metric = 'error' AND tag_user LIKE '1%'""".stripMargin,
    "ts_multi_tag_group" -> tsAgg("purchase", "k", AvgV, width = Week),
  )
}
