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
  * Delivery contract: EXACTLY-ONCE. `foreachBatch` re-executes a batch
  * after a failure, so each batch's partials land in their own
  * `batch_id=<id>` partition directory with overwrite semantics
  * ([[Ingest.appendRollupBatch]]) — a replayed batch rewrites its
  * directory instead of appending a second copy, and a batch whose
  * write crashed before its `_SUCCESS` marker is pruned at open
  * ([[Ingest.openRollup]]) until the replay lands it. Spec-asserted:
  * replaying a batch leaves every aggregate unchanged.
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
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        Ingest.appendRollupBatch(new Db(batch), dest, widthNs, batchId)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
