package graft.tsdb

import org.apache.spark.sql.{Column, DataFrame, functions}
import org.apache.spark.sql.functions._

/** A materialized rollup layout: per (metric × tagset × fixed-width
  * bucket) partial aggregates `(n, sum_value, sum_sq, min_value,
  * max_value)`,
  * written once at ingest by [[Ingest.writeRollup]] — the continuous-
  * aggregate feature every production metrics store grows (the
  * reference's embedded engine re-scans raw points per query;
  * at 100 TB the rollup answers dashboard-width queries from data
  * thousands of times smaller than the raw table).
  *
  * Queries at any width that is a MULTIPLE of the rollup width
  * re-aggregate the partials: counts and decimal sums add, mins/maxes
  * combine — all associative, so results are bit-identical to running
  * the same aggregation over the raw points (spec-asserted, and the
  * driver oracle for `ts_rollup_avg` is literally the raw-data SQL).
  * The `sum_sq` partial (layout v4) extends the same argument to
  * population stddev — anomaly bands answered from partials.
  * Quantiles are NOT decomposable into these partials and stay on the
  * raw path ([[Db.quantile]]).
  */
final class Rollup(val frame: DataFrame, val widthNs: Long) {
  import Db.TagPrefix

  private def tagCol(key: String): Column =
    if (frame.columns.contains(TagPrefix + key)) col(TagPrefix + key)
    else lit(null).cast("string")

  def avg(metric: String, groupBy: String, width: Long,
          filterExpr: String = "*"): DataFrame =
    agg(AggKind.Avg, metric, groupBy, width, filterExpr)
  def sum(metric: String, groupBy: String, width: Long,
          filterExpr: String = "*"): DataFrame =
    agg(AggKind.Sum, metric, groupBy, width, filterExpr)
  def min(metric: String, groupBy: String, width: Long,
          filterExpr: String = "*"): DataFrame =
    agg(AggKind.Min, metric, groupBy, width, filterExpr)
  def max(metric: String, groupBy: String, width: Long,
          filterExpr: String = "*"): DataFrame =
    agg(AggKind.Max, metric, groupBy, width, filterExpr)
  def count(metric: String, groupBy: String, width: Long,
            filterExpr: String = "*"): DataFrame =
    agg(AggKind.Count, metric, groupBy, width, filterExpr)
  /** Population stddev from partials (needs the v4 `sum_sq` column). */
  def stddev(metric: String, groupBy: String, width: Long,
             filterExpr: String = "*"): DataFrame =
    agg(AggKind.Stddev, metric, groupBy, width, filterExpr)

  /** Re-aggregate the partials at `width` (a multiple of the rollup
    * width). Output schema matches [[AggBuilder.build]]:
    * `grp, bucket_start, n, value`.
    */
  def agg(kind: AggKind, metric: String, groupBy: String, width: Long,
          filterExpr: String = "*"): DataFrame = {
    require(width % widthNs == 0,
      s"query width $width is not a multiple of the rollup width $widthNs")
    kind match {
      case AggKind.Quantile(_) => throw new IllegalArgumentException(
        "quantiles are not decomposable into rollup partials; use Db.quantile over raw points")
      case AggKind.Stddev if !frame.columns.contains("sum_sq") =>
        throw new IllegalArgumentException(
          "this rollup layout predates the sum_sq partial (LayoutVersion < 4); " +
            "rebuild with Ingest.writeRollup or use Db.stddev over raw points")
      case _ => ()
    }
    val grpCol = tagCol(groupBy)
    val base = frame
      .where(col("metric") === lit(Db.validated(metric)))
      .where(FilterParser.compileString(filterExpr, tagCol))
      .where(grpCol.isNotNull)
    val bucket = (expr(s"bucket_start div ${width}L") * lit(width)).as("bucket_start")
    val n = functions.sum(col("n")).as("n")
    val decSum = functions.sum(col("sum_value"))
    val valueCol = (kind match {
      case AggKind.Avg   => round(decSum.cast("double") / functions.sum(col("n")), 6)
      case AggKind.Sum   => decSum.cast("double")
      case AggKind.Min   => functions.min(col("min_value"))
      case AggKind.Max   => functions.max(col("max_value"))
      case AggKind.Count => functions.sum(col("n")).cast("double")
      // IDENTICAL op chain to AggKind.Stddev over raw points: both Σv
      // and Σv² re-aggregate exactly (decimal adds are associative), so
      // the partial-merged σ is bit-equal to the raw-scan σ
      case AggKind.Stddev =>
        val sq = functions.sum(col("sum_sq")).cast("double")
        val sv = decSum.cast("double")
        val cnt = functions.sum(col("n"))
        round(sqrt(greatest((sq - (sv * sv) / cnt) / cnt, lit(0.0))), 6)
      case AggKind.Quantile(_) =>
        throw new IllegalStateException("unreachable")
    }).as("value")
    base.groupBy(grpCol.as("grp"), bucket).agg(n, valueCol)
  }
}
