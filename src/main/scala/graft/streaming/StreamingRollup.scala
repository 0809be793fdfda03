package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.tsdb.{Db, Ingest}

/** Streaming maintenance of a [[graft.tsdb.Rollup]] layout: each
  * micro-batch is aggregated into partials and APPENDED
  * ([[Ingest.appendRollup]]) — per-batch cost proportional to the
  * batch, never to the rollup, and the query-time merge handles
  * partials of the same (series, bucket) arriving across batches.
  *
  * Delivery contract: `foreachBatch` re-executes a batch after a
  * failure, so a crash between the append and the checkpoint commit
  * can duplicate that batch's partials (inflating counts/sums for its
  * buckets). The standard remedies — stage to `_batchId=<id>`
  * subdirectories and prune incomplete ones at open, or land in a
  * table format with transactional rewrite — are deployment choices
  * layered on the same append; the layout and merge semantics here are
  * what they build on.
  */
object StreamingRollup {

  /** Drain every event file under `eventsDir` into the rollup layout at
    * `dest`, micro-batched with a checkpoint, blocking until done.
    * Same canonicalization as [[graft.tsdb.Db.fromEvents]].
    */
  def rollupAvailable(spark: SparkSession, eventsDir: String, dest: String,
                      checkpoint: String, widthNs: Long,
                      propsTags: Seq[String] = Seq("k")): Unit = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(eventsDir).schema
    val tagCols = propsTags.map(k =>
      nullif(regexp_extract(col("props"), "\"" + k + "\":\\s*(\\d+)", 1), lit(""))
        .as(Db.TagPrefix + k))
    val canonical = spark.readStream
      .schema(schema)
      .parquet(eventsDir)
      .select(Seq(
        col("event_type").as("metric"),
        (expr("ts div 1000L") * lit(1000L)).as("ts"),
        col("value"),
        col("user_id").cast("string").as(Db.TagPrefix + "user")) ++ tagCols: _*)
    val q = canonical.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Ingest.appendRollup(new Db(batch), dest, widthNs)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
