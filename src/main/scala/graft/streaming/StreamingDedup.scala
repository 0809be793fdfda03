package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming exact deduplication — the streaming counterpart of
  * [[graft.operators.Dedup.exact]] for a documents landing zone: as
  * document files arrive, emit only the first occurrence of each
  * normalized-content fingerprint.
  *
  * Spark-first shape: `dropDuplicatesWithinWatermark` on the md5
  * fingerprint keyed state. The watermark bounds the dedup state — a
  * duplicate arriving within the watermark horizon of its original is
  * dropped; state for older fingerprints is reclaimed, so the state
  * store stays proportional to the horizon's ingest volume instead of
  * the all-time corpus (the unbounded-state trap of a plain
  * `dropDuplicates` on an infinite stream). For all-time exact dedup at
  * rest, run the batch [[graft.operators.Dedup.exact]] over the landed
  * corpus — the two compose: streaming keeps the landing zone clean at
  * ingest latency, batch certifies the corpus.
  */
object StreamingDedup {

  /** Deduplicated stream of (doc_id, fp, event_ts) from a documents
    * directory. `tsCol` must be an event-time column the watermark can
    * bound state with.
    */
  def dedupStream(spark: SparkSession, docsDir: String,
                  watermark: String = "1 hour",
                  tsCol: String = "event_ts"): DataFrame = {
    val schema = spark.read.parquet(docsDir).schema
    spark.readStream
      .schema(schema)
      .parquet(docsDir)
      .withColumn("fp", graft.functions.TextFunctions.md5Fingerprint(col("text")))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("fp")
      .select(col("doc_id"), col("fp"), col(tsCol))
  }
}
