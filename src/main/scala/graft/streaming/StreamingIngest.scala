package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.tsdb.Db

/** Structured-Streaming ingestion into the graft on-disk layout: the
  * streaming re-expression of the reference's point-write path (talna
  * `src/db.rs:319` `Database::write`) — micro-batched file-source
  * ingestion instead of per-point LSM inserts.
  *
  * The canonicalization is the same as [[graft.tsdb.Db.fromEvents]]
  * (metric/ts/value/tag columns, µs-truncated ns timestamps, NULL for
  * absent props keys); the sink appends metric-partitioned parquet that
  * [[graft.tsdb.Ingest.open]] reads back, so a streaming-fed layout and
  * a batch-written one are interchangeable. `Trigger.AvailableNow`
  * drains everything currently available then stops — the idiomatic
  * batch-backfill-through-the-streaming-path mode; a resident deployment
  * drops the trigger and lets micro-batches run continuously with
  * exactly-once file-sink semantics from the checkpoint.
  */
object StreamingIngest {

  /** Ingest every event parquet file under the directory `eventsDir`
    * into the layout at `dest`, blocking until the available data is
    * drained. The source is a directory (the streaming file source
    * watches it for arriving files — exactly how a 100 TB deployment's
    * landing zone works).
    */
  def ingestAvailable(spark: SparkSession, eventsDir: String, dest: String,
                      checkpoint: String,
                      propsTags: Seq[String] = Seq("k")): Unit = {
    val schema = spark.read.parquet(eventsDir).schema
    val tagCols = propsTags.map(k =>
      nullif(regexp_extract(col("props"), "\"" + k + "\":\\s*(\\d+)", 1), lit(""))
        .as(Db.TagPrefix + k))
    val canonical = spark.readStream
      .schema(schema)
      .parquet(eventsDir)
      .select(Seq(
        col("event_type").as("metric"),
        Db.tsNs(schema).as("ts"),
        col("value"),
        col("user_id").cast("string").as(Db.TagPrefix + "user")) ++ tagCols: _*)
      // same write-boundary guard as the batch path (Ingest.write):
      // reference MetricName::try_from rejects invalid names at ingest,
      // and graft's own query APIs refuse to read them back
      .withColumn("metric", graft.tsdb.Ingest.validatedMetric)
    val q = canonical.writeStream
      .format("parquet")
      .option("path", dest)
      .option("checkpointLocation", checkpoint)
      .partitionBy("metric")
      .trigger(Trigger.AvailableNow())
      .start()
    StreamAwait.drain(q)
  }

  /** Ingest the events table through the streaming path once into a
    * content-fingerprint-keyed graft layout (the shared `ensure*`
    * recipe: symlinked landing zone, exactly-once file sink off the
    * checkpoint, `_DONE`-guarded idempotent reopen). The returned path
    * opens with [[graft.tsdb.Ingest.open]] like any batch-written
    * layout — which is the interchangeability claim the driver entry
    * proves against the raw-events oracle.
    */
  def ensureStreamedLayout(spark: SparkSession, sfDir: String): String = {
    import java.nio.file.{Files, Paths}
    val base = graft.Conf.resolveWorkDir(spark, "")
    val fp = graft.tsdb.Ingest.contentFingerprint(s"$sfDir/events.parquet")
    val root = s"$base/graft_ingest_streamed_" +
      s"${Integer.toHexString(sfDir.hashCode)}_$fp"
    val layout = s"$root/layout"
    val done = Paths.get(root, "_DONE")
    if (!Files.exists(done)) {
      val landing = Paths.get(s"$root.landing")
      Files.createDirectories(landing)
      val link = landing.resolve("events.parquet")
      if (!Files.exists(link)) Files.createSymbolicLink(link,
        Paths.get(s"$sfDir/events.parquet").toAbsolutePath.normalize())
      ingestAvailable(spark, landing.toString, layout, s"$root.ckpt")
      Files.createFile(done)
    }
    layout
  }
}
