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

  /** Distributed metric-name validation: the reference rejects invalid
    * names at the write boundary (`src/db.rs:319` via
    * `MetricName::try_from`, `src/metric_name.rs:15-25`). Wrapping the
    * column in a `raise_error` guard fails the write job on the first
    * invalid value without a separate validation pass.
    */
  private[graft] def validatedMetric: org.apache.spark.sql.Column =
    when(col("metric").rlike("^[a-z_.]+$"), col("metric"))
      .otherwise(raise_error(concat(
        lit("invalid metric name: '"), col("metric"), lit("' (allowed: a-z _ .)"))))

  /** Shuffle key ahead of a layout write: (metric, week, salt). Keys the
    * exchange by layout locality — same metric+week lands together, the
    * salt caps files per (metric, week) at `filesPerWeek` — while the
    * partition COUNT stays `spark.sql.shuffle.partitions` (cluster-
    * sized), so writer parallelism scales with the cluster instead of
    * being pinned to the file-count knob.
    */
  private def layoutKey(filesPerWeek: Int) = Seq(
    col("metric"), expr(s"ts div ${Duration.days(7)}L"),
    pmod(hash(col("ts")), lit(filesPerWeek)))

  /** Stored value dtype per the reference's precision contract: talna
    * stores `Value = f32` unless the `high_precision` (f64) build flag
    * is set (`src/lib.rs:112-116`). graft defaults to f64
    * (`highPrecision = true`); opting into f32 halves value bytes —
    * 2× IO/footprint at 100 TB — while [[open]] widens back to double
    * so the query/aggregation path is unchanged (f32→f64 is exact).
    */
  private def storedValue(highPrecision: Boolean): org.apache.spark.sql.Column =
    if (highPrecision) col("value") else col("value").cast("float")

  def write(db: Db, path: String, filesPerWeek: Int = 4,
            highPrecision: Boolean = true): Unit =
    db.frame
      .withColumn("metric", validatedMetric)
      .withColumn("value", storedValue(highPrecision))
      .repartition(layoutKey(filesPerWeek): _*)
      .sortWithinPartitions(col("metric"), col("ts"))
      .write.partitionBy("metric").mode("overwrite").parquet(path)

  /** Append a batch to an existing layout — the Spark re-expression of
    * the reference's `Database::write` ingestion path (talna
    * `src/db.rs:319`): micro-batched appends instead of per-point LSM
    * inserts. `write_at` (explicit timestamp, `src/db.rs:324`) needs no
    * separate API: every row of the canonical frame carries its own
    * `ts`, so all graft writes are explicit-timestamp writes.
    */
  def append(db: Db, path: String, filesPerWeek: Int = 4,
             highPrecision: Boolean = true): Unit =
    db.frame
      .withColumn("metric", validatedMetric)
      .withColumn("value", storedValue(highPrecision))
      .repartition(layoutKey(filesPerWeek): _*)
      .sortWithinPartitions(col("metric"), col("ts"))
      .write.partitionBy("metric").mode("append").parquet(path)

  /** Reopen a graft layout as a Db. The `metric` partition column comes
    * back as a string column; tag columns keep their `tag_` prefix; a
    * float-stored `value` (see [[write]]) widens back to double so
    * aggregation always runs in f64, like the reference's query path.
    */
  def open(spark: SparkSession, path: String): Db =
    new Db(spark.read.parquet(path)
      .withColumn("metric", col("metric").cast("string"))
      .withColumn("value", col("value").cast("double")))

  /** Write-once cached graft layout for a source events dir: the first
    * call materializes `Db.fromEvents` through [[write]]; later calls
    * reuse it. Lets queries exercise the real on-disk layout (metric
    * partition dirs + materialized tag columns ⇒ partition pruning and
    * parquet tag pushdown) without rewriting per run.
    */
  /** Bucketed series layout: `bucketBy` on the series key (metric +
    * primary tag) with in-bucket sort. Repeated series-keyed joins and
    * aggregations between tables written this way are co-located —
    * Catalyst plans them with NO shuffle exchange, the Spark analog of
    * the reference keeping a series' points contiguous under one
    * SeriesId. Requires `saveAsTable` (bucket metadata lives in the
    * catalog); at 100 TB this is the layout for series-join-heavy
    * workloads, while the plain [[write]] layout optimizes scan+filter.
    */
  def writeBucketed(db: Db, table: String, buckets: Int = 8,
                    tagKey: String = "user"): Unit =
    db.frame
      .withColumn("metric", validatedMetric)
      .write
      .bucketBy(buckets, "metric", Db.TagPrefix + tagKey)
      .sortBy("metric", Db.TagPrefix + tagKey, "ts")
      .mode("overwrite").format("parquet")
      .saveAsTable(table)

  /** Reopen a bucketed table as a Db. */
  def openTable(spark: SparkSession, table: String): Db =
    new Db(spark.table(table))

  /** Materialize a rollup layout ([[Rollup]]): one hash aggregate over
    * the raw frame into per (metric × tagset × `widthNs` bucket)
    * partials, parquet-partitioned by metric like the point layout.
    * Decimal sums keep re-aggregation exact; the rollup is typically
    * orders of magnitude smaller than its source, so the write is
    * amortized after a handful of dashboard queries.
    */
  def writeRollup(db: Db, path: String, widthNs: Long): Unit =
    rollupPartials(db, widthNs)
      .write.partitionBy("metric").mode("overwrite").parquet(path)

  private def rollupPartials(db: Db, widthNs: Long) = {
    val tags = db.tagColumns.map(col)
    db.frame
      .withColumn("metric", validatedMetric)
      .groupBy(col("metric") +: tags :+
        (expr(s"ts div ${widthNs}L") * lit(widthNs)).as("bucket_start"): _*)
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(28,6)")).as("sum_value"),
        // Σv² partial (decimal(18,6)² = decimal(37,12), exact): makes
        // population stddev decomposable at query time — anomaly bands
        // answered from partials instead of a raw 100 TB re-scan
        sum(col("value").cast("decimal(18,6)") *
          col("value").cast("decimal(18,6)")).as("sum_sq"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))
  }

  /** Incremental rollup maintenance: aggregate ONLY the new batch into
    * partials and append them. No read-modify-write of existing
    * partials is needed — [[Rollup.agg]] re-aggregates at query time,
    * so duplicate (series, bucket) partial rows from different batches
    * merge by the same associativity that merges buckets (counts and
    * decimal sums add, mins/maxes combine). Appending a batch costs
    * one aggregate over the batch, independent of the rollup's size —
    * the property that makes continuous aggregates operable at 100 TB.
    * (Periodic compaction — rewriting a partition back to one partial
    * per series-bucket — is an optimization, not a correctness need.)
    */
  def appendRollup(db: Db, path: String, widthNs: Long): Unit =
    rollupPartials(db, widthNs)
      .write.partitionBy("metric").mode("append").parquet(path)

  /** Exactly-once variant of [[appendRollup]] for replayable writers
    * (Structured Streaming `foreachBatch`): the batch's partials land
    * under a `batch_id=<id>` partition directory with OVERWRITE
    * semantics, so re-executing a batch after a crash rewrites the same
    * directory instead of appending a duplicate copy — the append is
    * idempotent per batch id. A crash mid-write leaves the directory
    * without its `_SUCCESS` marker; [[openRollup]] prunes such
    * incomplete batches at read time, and the eventual replay rewrites
    * them. Do not mix with plain [[appendRollup]] on one layout (the
    * directory depths differ).
    */
  def appendRollupBatch(db: Db, path: String, widthNs: Long,
                        batchId: Long): Unit =
    rollupPartials(db, widthNs)
      .write.partitionBy("metric").mode("overwrite")
      .parquet(s"$path/batch_id=$batchId")

  /** Compact a rollup layout: merge the partial rows accumulated by
    * [[appendRollup]] back to ONE row per (series, bucket) — the same
    * associative combination the query-time merge applies, persisted.
    * Purely an optimization (query results are identical before and
    * after, spec-asserted); run it when the partial-row multiplicity
    * makes scans noticeably wider. The rewrite stages to a sibling
    * directory, moves the live copy ASIDE, swaps the staged copy in,
    * and only then deletes the old copy — a crash at any step leaves a
    * complete rollup on disk (live or at `path + ".old"`), never a
    * destroyed one. Still not atomic against CONCURRENT readers; a
    * real deployment layers a transactional table format for that.
    */
  def compactRollup(spark: SparkSession, path: String): Unit = {
    val frame = spark.read.parquet(path)
    val tags = frame.columns.filter(_.startsWith(Db.TagPrefix)).sorted.toSeq.map(col)
    val compacted = frame
      .groupBy(col("metric") +: tags :+ col("bucket_start"): _*)
      .agg(sum(col("n")).as("n"),
        sum(col("sum_value")).as("sum_value"),
        sum(col("sum_sq")).as("sum_sq"),
        min(col("min_value")).as("min_value"),
        max(col("max_value")).as("max_value"))
    val tmp = path + ".compact"
    compacted.write.partitionBy("metric").mode("overwrite").parquet(tmp)
    val dir = new java.io.File(path)
    val old = new java.io.File(path + ".old")
    if (old.exists()) org.apache.commons.io.FileUtils.deleteDirectory(old)
    if (!dir.renameTo(old))
      throw new java.io.IOException(s"compaction aside-move failed: $path -> $old")
    if (!new java.io.File(tmp).renameTo(dir)) {
      // roll back so the live path keeps serving the pre-compaction copy
      old.renameTo(dir)
      throw new java.io.IOException(s"compaction swap failed: $tmp -> $path")
    }
    org.apache.commons.io.FileUtils.deleteDirectory(old)
  }

  /** Reopen a rollup layout written by [[writeRollup]]/[[appendRollup]]
    * or batch-staged by [[appendRollupBatch]]. Staged layouts are
    * detected by their `batch_id=` partition directories; batches whose
    * write never completed (no `_SUCCESS` marker — a crash between the
    * parquet job and the streaming checkpoint commit) are pruned here,
    * which is the read half of the exactly-once contract.
    */
  def openRollup(spark: SparkSession, path: String, widthNs: Long): Rollup = {
    val staged = Option(new java.io.File(path).listFiles()).toSeq.flatten
      .filter(f => f.isDirectory && f.getName.startsWith("batch_id="))
    val frame =
      if (staged.isEmpty) spark.read.parquet(path)
      else {
        val complete = staged.filter(f => new java.io.File(f, "_SUCCESS").exists())
        require(complete.nonEmpty, s"no complete batch under staged rollup $path")
        spark.read.option("basePath", path)
          .parquet(complete.map(_.getAbsolutePath).sorted: _*)
          .drop("batch_id")
      }
    new Rollup(frame.withColumn("metric", col("metric").cast("string")), widthNs)
  }

  /** Write-once cached rollup for a source events dir (same contract as
    * [[ensureLayout]]).
    */
  def ensureRollup(spark: SparkSession, sfDir: String, widthNs: Long,
                   base: String = ""): String = {
    val path = rollupPath(sfDir, widthNs, graft.Conf.resolveWorkDir(spark, base))
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(path, "_SUCCESS")))
      writeRollup(Db.fromEvents(spark, sfDir), path, widthNs)
    path
  }

  /** Downsample an existing rollup layout one level COARSER — the
    * multi-resolution ladder (1 m → 1 h → 1 d → …) every production
    * metrics store maintains (the M3/Thanos downsampling posture):
    * the coarser level's partials are built FROM the finer level's,
    * never from raw points, so each additional level costs one
    * aggregate over data already orders of magnitude smaller than the
    * source — at 100 TB the ladder build is a rounding error next to
    * the first rollup. Counts and decimal sums add, Σv² adds,
    * mins/maxes combine — the SAME associativity that makes
    * query-time width re-aggregation exact makes the level build
    * exact, so a query answered from a cascaded level is bit-equal to
    * one answered from raw points (the ts_rollup_cascade oracle's
    * hash-checked claim, and the property that lets a deployment
    * route each query to the coarsest level satisfying its
    * granularity).
    */
  def writeRollupFrom(spark: SparkSession, srcPath: String, srcWidth: Long,
                      path: String, widthNs: Long): Unit = {
    require(widthNs % srcWidth == 0,
      s"cascade width $widthNs is not a multiple of the source width $srcWidth")
    val src = openRollup(spark, srcPath, srcWidth).frame
    val tags = src.columns.filter(_.startsWith(Db.TagPrefix)).sorted.toSeq.map(col)
    src
      .groupBy(col("metric") +: tags :+
        (expr(s"bucket_start div ${widthNs}L") * lit(widthNs)).as("bucket_start"): _*)
      .agg(sum(col("n")).as("n"),
        sum(col("sum_value")).as("sum_value"),
        sum(col("sum_sq")).as("sum_sq"),
        min(col("min_value")).as("min_value"),
        max(col("max_value")).as("max_value"))
      .write.partitionBy("metric").mode("overwrite").parquet(path)
  }

  /** Write-once cached two-level cascade: the `widthNs` rollup built
    * from the `srcWidth` rollup (which [[ensureRollup]] builds from
    * raw). Cache-keyed by BOTH widths so a ladder and a direct build
    * at the same width never collide.
    */
  def ensureRollupCascade(spark: SparkSession, sfDir: String,
                          srcWidth: Long, widthNs: Long,
                          base: String = ""): String = {
    val srcPath = ensureRollup(spark, sfDir, srcWidth, base)
    val path = rollupPath(sfDir, widthNs,
      graft.Conf.resolveWorkDir(spark, base)) + s"_from${srcWidth}"
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(path, "_SUCCESS")))
      writeRollupFrom(spark, srcPath, srcWidth, path, widthNs)
    path
  }

  /** [[ensureRollupCascade]] over an EXISTING rollup path — e.g. the
    * batch-id-staged layout a streaming landing maintains
    * ([[graft.streaming.StreamingRollup.ensureStreamed]]): the ladder
    * does not care how its source level was landed, because
    * [[openRollup]] already normalizes staged layouts. The cache key
    * derives from the source path (itself content-fingerprinted), so
    * a re-landed source re-keys the cascade.
    */
  def ensureRollupCascadeFrom(spark: SparkSession, srcPath: String,
                              srcWidth: Long, widthNs: Long): String = {
    val path = s"${srcPath}_cascade_w$widthNs"
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(path, "_SUCCESS")))
      writeRollupFrom(spark, srcPath, srcWidth, path, widthNs)
    path
  }

  /** The content-fingerprinted cache path [[ensureRollup]] uses for a
    * source dir (no side effects — lets a benchmark evict the cache to
    * time the build separately from the query).
    */
  private[graft] def rollupPath(sfDir: String, widthNs: Long,
                                base: String): String = {
    val fp = contentFingerprint(s"$sfDir/events.parquet")
    s"$base/graft_rollup_v${LayoutVersion}_w${widthNs}_" +
      s"${Integer.toHexString(sfDir.hashCode)}_$fp"
  }

  /** Bump when the canonical frame layout changes (e.g. tag semantics),
    * so cached layouts from older code are never silently reused.
    */
  // v4: rollup partials carry the Σv² column (stddev decomposability)
  private val LayoutVersion = 4

  /** Content fingerprint of a source dir: md5 over every file's relative
    * path, size, and mtime. Keying cached layouts on it (not just the
    * dir name) means a regenerated source is never silently served from
    * a stale layout.
    */
  private[graft] def contentFingerprint(dir: String): String = {
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get(dir)
    val digest = java.security.MessageDigest.getInstance("MD5")
    java.nio.file.Files.walk(root).iterator().asScala
      .filter(java.nio.file.Files.isRegularFile(_))
      .map(p => s"${root.relativize(p)}:${java.nio.file.Files.size(p)}:" +
        s"${java.nio.file.Files.getLastModifiedTime(p).toMillis}")
      .toSeq.sorted
      .foreach(s => digest.update(s.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
    digest.digest().take(6).map("%02x".format(_)).mkString
  }

  def ensureLayout(spark: SparkSession, sfDir: String,
                   base: String = ""): String = {
    val fp = contentFingerprint(s"$sfDir/events.parquet")
    val root = graft.Conf.resolveWorkDir(spark, base)
    val path = s"$root/graft_layout_v${LayoutVersion}_" +
      s"${Integer.toHexString(sfDir.hashCode)}_$fp"
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(path, "_SUCCESS")))
      write(Db.fromEvents(spark, sfDir), path)
    path
  }
}
