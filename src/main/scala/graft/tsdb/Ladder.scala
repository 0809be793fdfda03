package graft.tsdb

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Storage-aware read routing over a multi-resolution rollup LADDER —
  * the reference's `granularity()` query surface (talna
  * `src/agg/builder.rs:53-60`) made aware of materialized levels: the
  * caller still declares only WHAT to compute (agg kind, metric,
  * group-by, granularity, filter); the ladder decides WHERE to read —
  * the COARSEST materialized level whose width divides the query
  * granularity and whose partials can answer the agg kind — falling
  * back to raw points when no level qualifies.
  *
  * This is the piece [[Rollup]] + [[Ingest.writeRollupFrom]] were
  * missing: the cascade proves every level bit-exact against raw
  * (counts and decimal sums add, mins/maxes combine — associativity),
  * but level CHOICE was manual. With the router, a weekly dashboard
  * query reads the day level (≈ 24× smaller than hour, ~10⁴× smaller
  * than raw at typical point rates), an hourly drill-down reads the
  * hour level, and a quantile — not decomposable into these partials —
  * silently takes the raw path. At 100 TB this routing is the
  * difference between a dashboard query costing a partials scan of a
  * few thousand rows and costing the full point scan; because every
  * level is exact (spec + driver-hash-proven), routing can never
  * change a result, only its cost.
  *
  * Level selection is driver-side metadata-only: widths are known from
  * the layout, `sum_sq` presence from the schema — no data is read to
  * choose.
  */
final class Ladder(val db: Db, val levels: Seq[Rollup]) {

  /** The coarsest level that can answer `kind` at `widthNs`, or None →
    * raw points. A level qualifies iff its width divides the query
    * width (tumbling buckets re-aggregate exactly only along the
    * divisibility chain) and its partials decompose the agg kind
    * (quantiles never do; stddev needs the v4 `sum_sq` column).
    */
  def select(kind: AggKind, widthNs: Long): Option[Rollup] = {
    val ok = levels.filter { r =>
      widthNs % r.widthNs == 0 && (kind match {
        case AggKind.Quantile(_) | AggKind.QuantileApprox(_, _) => false
        case AggKind.Stddev => r.frame.columns.contains("sum_sq")
        case _ => true
      })
    }
    if (ok.isEmpty) None else Some(ok.maxBy(_.widthNs))
  }

  /** Route and run: identical output contract to [[AggBuilder.build]]
    * (`grp, bucket_start, n, value`) whichever storage level answers.
    */
  def agg(kind: AggKind, metric: String, groupBy: String, widthNs: Long,
          filterExpr: String = "*"): DataFrame =
    select(kind, widthNs) match {
      case Some(level) =>
        level.agg(kind, metric, groupBy, widthNs, filterExpr)
      case None =>
        AggBuilder(db, kind, Db.validated(metric), groupBy,
          filterExpr = filterExpr, widthNs = widthNs).build()
    }

  def avg(metric: String, groupBy: String, widthNs: Long,
          filterExpr: String = "*"): DataFrame =
    agg(AggKind.Avg, metric, groupBy, widthNs, filterExpr)
  def max(metric: String, groupBy: String, widthNs: Long,
          filterExpr: String = "*"): DataFrame =
    agg(AggKind.Max, metric, groupBy, widthNs, filterExpr)
}

object Ladder {
  /** Materialize (or reopen, content-cached) the standard hour → day
    * cascade for `sfDir` and wrap it with the raw events Db as
    * fallback. The day level is folded FROM the hour level
    * ([[Ingest.ensureRollupCascade]]) — the M3/Thanos downsampling
    * build — so adding a level never re-reads raw points.
    */
  def ensure(spark: SparkSession, sfDir: String): Ladder = {
    val hourW = Duration.hours(1)
    val dayW = Duration.days(1)
    val hourPath = Ingest.ensureRollup(spark, sfDir, hourW)
    val dayPath = Ingest.ensureRollupCascade(spark, sfDir, hourW, dayW)
    new Ladder(Db.fromEvents(spark, sfDir),
      Seq(Ingest.openRollup(spark, hourPath, hourW),
        Ingest.openRollup(spark, dayPath, dayW)))
  }
}
