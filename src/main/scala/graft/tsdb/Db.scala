package graft.tsdb

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Aggregation kinds, parity with reference talna `src/agg/{avg,sum,min,max,count}.rs`. */
sealed trait AggKind
object AggKind {
  case object Avg   extends AggKind
  case object Sum   extends AggKind
  case object Min   extends AggKind
  case object Max   extends AggKind
  case object Count extends AggKind
}

/** Spark-native analog of the reference Database (talna `src/db.rs`).
  *
  * Wraps a canonical *series frame* with columns:
  *   - `metric: string` — metric name (talna MetricName)
  *   - `ts: long` — nanoseconds since epoch (talna's ns Timestamp)
  *   - `value: double` — the data-point value
  *   - `tag_<key>: string` — one flat column per tag key
  *
  * Flat tag columns (instead of a map) are deliberate: parquet
  * dictionary/min-max pushdown on them is the distributed analog of the
  * reference's inverted TagIndex — the scan skips row groups the way
  * talna skips series.
  */
final class Db(val frame: DataFrame) {
  import Db.TagPrefix

  def avg(metric: String, groupBy: String): AggBuilder   = AggBuilder(this, AggKind.Avg, metric, groupBy)
  def sum(metric: String, groupBy: String): AggBuilder   = AggBuilder(this, AggKind.Sum, metric, groupBy)
  def min(metric: String, groupBy: String): AggBuilder   = AggBuilder(this, AggKind.Min, metric, groupBy)
  def max(metric: String, groupBy: String): AggBuilder   = AggBuilder(this, AggKind.Max, metric, groupBy)
  def count(metric: String, groupBy: String): AggBuilder = AggBuilder(this, AggKind.Count, metric, groupBy)

  def tagCol(key: String): Column = col(TagPrefix + key)

  /** Raw series scan: metric + filter DSL + optional bounds, no aggregation. */
  def scan(metric: String, filterExpr: String = "*",
           minTs: Option[Long] = None, maxTs: Option[Long] = None): DataFrame = {
    var df = frame.where(col("metric") === lit(metric))
    minTs.foreach(t => df = df.where(col("ts") >= lit(t)))
    maxTs.foreach(t => df = df.where(col("ts") <= lit(t)))
    df.where(FilterParser.compileString(filterExpr, tagCol))
  }

  /** Newest-N data points per series (metric × full tagset), mirroring the
    * reference's newest-first primary-key scan (timestamps stored negated
    * big-endian so forward scans read newest first — README "Data model").
    */
  def latest(metric: String, n: Int, filterExpr: String = "*"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = scan(metric, filterExpr)
    val tagCols = base.columns.filter(_.startsWith(TagPrefix)).sorted.map(col(_))
    val w = Window.partitionBy(tagCols.toSeq: _*).orderBy(col("ts").desc, col("value").desc)
    base.withColumn("rn", row_number().over(w)).where(col("rn") <= n).drop("rn")
  }
}

object Db {
  val TagPrefix = "tag_"

  /** Canonical series frame from the driver's `events` table:
    * metric = event_type, ts = ns epoch, value = value,
    * tags = { user = user_id, k = props.k }.
    */
  def fromEvents(spark: SparkSession, sfDir: String,
                 propsTags: Seq[String] = Seq("k")): Db = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // ts arrives as int64 nanoseconds; truncate to µs precision so results
    // are comparable with engines whose TIMESTAMP is µs (e.g. DuckDB).
    val tagCols = propsTags.map(k =>
      regexp_extract(col("props"), "\"" + k + "\":\\s*(\\d+)", 1).as(TagPrefix + k))
    val df = spark.read.parquet(s"$sfDir/events.parquet")
      .select(Seq(
        col("event_type").as("metric"),
        (expr("ts div 1000L") * lit(1000L)).as("ts"),
        col("value"),
        col("user_id").cast("string").as(TagPrefix + "user")) ++ tagCols: _*)
    new Db(df)
  }
}

/** Fluent grouped-aggregation builder, parity with talna `src/agg/builder.rs`.
  *
  * Output schema: `grp string, bucket_start long, n long, value double`.
  * Bucketing is epoch-aligned tumbling: `bucket_start = (ts div width) *
  * width` — deterministic under parallel merge, unlike the reference's
  * scan-anchored buckets (`src/agg/stream.rs:73`) which are inherently
  * sequential. One hash-aggregate, map-side partial combine, single
  * shuffle on (group, bucket).
  *
  * Double aggregates are computed via exact DECIMAL sums then converted,
  * so results are bit-identical regardless of partitioning/merge order
  * (and identical to a DuckDB oracle running the same arithmetic).
  */
final case class AggBuilder(
    db: Db,
    kind: AggKind,
    metric: String,
    groupBy: String,
    filterExpr: String = "*",
    minTs: Option[Long] = None,
    maxTs: Option[Long] = None,
    widthNs: Long = Duration.minutes(1)) {

  def filter(e: String): AggBuilder      = copy(filterExpr = e)
  def start(ns: Long): AggBuilder        = copy(minTs = Some(ns))
  def end(ns: Long): AggBuilder          = copy(maxTs = Some(ns))
  def granularity(ns: Long): AggBuilder  = copy(widthNs = ns)

  def build(): DataFrame = {
    val grpCol = db.tagCol(groupBy)
    val base = db.scan(metric, filterExpr, minTs, maxTs)
      .where(grpCol.isNotNull) // reference skips series lacking the group tag (agg/builder.rs:121)
    val bucketStart = (expr(s"ts div ${widthNs}L") * lit(widthNs)).as("bucket_start")
    val n = count(lit(1)).as("n")
    val decSum = sum(col("value").cast("decimal(28,6)"))
    val valueCol = (kind match {
      case AggKind.Avg   => round(decSum.cast("double") / count(lit(1)), 6)
      case AggKind.Sum   => decSum.cast("double")
      case AggKind.Min   => min(col("value"))
      case AggKind.Max   => max(col("value"))
      case AggKind.Count => count(lit(1)).cast("double")
    }).as("value")
    base.groupBy(grpCol.as("grp"), bucketStart).agg(n, valueCol)
  }
}
