package graft.tsdb

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Batch ingest: writes a canonical series frame in the graft on-disk
  * layout — parquet partitioned by `metric` (directory-level pruning is
  * the distributed analog of the reference's per-metric posting lists,
  * talna `src/tag_index.rs`), rows sorted by `ts` within files so
  * parquet row-group min/max statistics prune time ranges.
  *
  * At 100 TB: one directory per metric, `repartition(metric, bucket(ts))`
  * ahead of the write keeps file counts bounded per partition, and time
  * locality within files makes `start/end` scans IO-minimal.
  */
object Ingest {

  def write(db: Db, path: String, filesPerMetric: Int = 4): Unit =
    db.frame
      .repartition(filesPerMetric, col("metric"),
        expr(s"ts div ${Duration.days(7)}L"))
      .sortWithinPartitions(col("metric"), col("ts"))
      .write.partitionBy("metric").mode("overwrite").parquet(path)

  /** Append a batch to an existing layout — the Spark re-expression of
    * the reference's `Database::write` ingestion path (talna
    * `src/db.rs:319`): micro-batched appends instead of per-point LSM
    * inserts.
    */
  def append(db: Db, path: String, filesPerMetric: Int = 4): Unit =
    db.frame
      .repartition(filesPerMetric, col("metric"),
        expr(s"ts div ${Duration.days(7)}L"))
      .sortWithinPartitions(col("metric"), col("ts"))
      .write.partitionBy("metric").mode("append").parquet(path)

  /** Reopen a graft layout as a Db. The `metric` partition column comes
    * back as a string column; tag columns keep their `tag_` prefix.
    */
  def open(spark: SparkSession, path: String): Db =
    new Db(spark.read.parquet(path)
      .withColumn("metric", col("metric").cast("string")))
}
