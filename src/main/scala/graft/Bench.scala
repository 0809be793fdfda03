package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query at SPARK_GRAFT_SF_DIR.
  *
  * Per query: one untimed warm run (JIT + code cache + page cache),
  * then the best of two timed runs — steady-state latency, which is
  * what a resident engine (the reference keeps its LSM tree open)
  * actually serves.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // static conf, default 100: a 33-query suite generates far more
      // codegen'd classes than that, and LRU eviction forces janino to
      // recompile every generated class on every run — the round-1
      // full-suite bench spent most of its time compiling, not executing
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    val results = names.map { name =>
      val fn = SparkEntry.queries(name)
      def once(): Double = {
        val t0 = System.nanoTime()
        // noop sink: fully evaluates every output column (a count() lets
        // Catalyst prune projection-only work down to a row count)
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      // best-of-3 after warm: a single GC pause or host-load stall in
      // one timed run (observed up to tens of seconds on a busy host)
      // must not be recorded as the query's steady-state latency
      val t = try { once(); Seq(once(), once(), once()).min }
              catch { case _: Throwable => -1.0 }
      // ContextCleaner only releases broadcast blocks / shuffle state
      // after a driver GC; without this, earlier queries' debris slows
      // later ones by an order of magnitude
      System.gc()
      name -> t
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val ingest = if (sys.env.contains("SPARK_GRAFT_SKIP_INGEST")) "{}"
                 else ingestBench(spark, sfDir)
    val scale = if (sys.env.contains("SPARK_GRAFT_SKIP_SCALE")) "{}"
                else scaleBench(spark, sfDir)
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"ingest":$ingest,"scale10":$scale,"sf":"$sfDir"}""")
    spark.stop()
  }

  /** Scaling curve of the heavy family: the same query at the base sf
    * and at a content-perturbed 10× replication ([[ScaleData]]), one
    * warmed timed run each, reported as base/x10 seconds + ratio.
    * Linear-in-rows queries should land around the row ratio (10) or
    * below (fixed overhead amortizes); `dedup_embedding` is the
    * documented exception — exhaustive within label blocks, O(n²)
    * by design, kept as the LSH variant's correctness oracle. The LSH
    * variant runs with the corpus-scaled plane budget (2^b ∝ n — see
    * [[graft.operators.Dedup.embeddingNearDup]]).
    */
  private def scaleBench(spark: SparkSession, sfDir: String): String = {
    val dir10 = ScaleData.ensure(spark, sfDir, 10)
    val heavy: Seq[(String, Boolean => (SparkSession, String) => org.apache.spark.sql.DataFrame)] = Seq(
      "dedup_exact" -> (_ => SparkEntry.queries("dedup_exact")),
      "dedup_minhash" -> (_ => SparkEntry.queries("dedup_minhash")),
      "dedup_ngram_jaccard" -> (_ => SparkEntry.queries("dedup_ngram_jaccard")),
      "dedup_embedding" -> (_ => SparkEntry.queries("dedup_embedding")),
      "dedup_embedding_lsh" -> (x10 => (s, d) =>
        graft.operators.Dedup.embeddingNearDup(s, d,
          maxPlanes = if (x10) 288 else 192)),
      "ann_bruteforce" -> (_ => SparkEntry.queries("ann_bruteforce")),
      "ann_ivf" -> (_ => SparkEntry.queries("ann_ivf")),
      "ann_ivf_kmeans" -> (_ => SparkEntry.queries("ann_ivf_kmeans")),
      "ann_lsh" -> (_ => SparkEntry.queries("ann_lsh")),
      "ann_lsh_multiprobe" -> (_ => SparkEntry.queries("ann_lsh_multiprobe")),
      "q5_multijoin" -> (_ => SparkEntry.queries("q5_multijoin")),
      // TSDB core representatives: aggregation, per-series window, scan
      "ts_avg" -> (_ => SparkEntry.queries("ts_avg")),
      "ts_latest" -> (_ => SparkEntry.queries("ts_latest")),
      "ts_raw" -> (_ => SparkEntry.queries("ts_raw")))
    val parts = heavy.map { case (name, fn) =>
      // single cold run per scale: the ratio compares like with like,
      // and the section stays cheap enough to run every round
      def run(x10: Boolean, dir: String): Double = {
        val t0 = System.nanoTime()
        fn(x10)(spark, dir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val base = try run(x10 = false, sfDir) catch { case _: Throwable => -1.0 }
      System.gc()
      val x10 = try run(x10 = true, dir10) catch { case _: Throwable => -1.0 }
      System.gc()
      val ratio = if (base > 0 && x10 > 0) x10 / base else -1.0
      f""""$name":{"base_sec":$base%.3f,"x10_sec":$x10%.3f,"ratio":$ratio%.2f}"""
    }
    parts.mkString("{", ",", "}")
  }

  /** Ingest-throughput measurement (pts/s), the reference's headline
    * number (talna README "Benchmark: 1 billion data points",
    * billion/src/main.rs: 1.36M pts/s single-node).
    *
    * Three paths, each timed as one cold end-to-end write job:
    *  - synthetic: `range` → canonical frame → [[graft.tsdb.Ingest.write]]
    *    layout, default 10M points over 8 metrics / ~12 weeks — the
    *    direct analog of the reference's synthetic-series writer, at a
    *    volume where job overhead amortizes.
    *  - events: `Db.fromEvents(sfDir)` → layout — the real-data path
    *    including props-tag canonicalization.
    *  - streaming: Structured Streaming file source → layout sink
    *    (micro-batched, checkpointed, AvailableNow).
    */
  private def ingestBench(spark: SparkSession, sfDir: String): String = {
    import org.apache.spark.sql.functions._
    val base = "/root/repo/out/bench_ingest"
    def clean(p: String): Unit =
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p))
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // start from a clean heap: this section follows ~170 query
    // executions whose broadcast/shuffle debris otherwise inflates the
    // first big write's GC time
    System.gc()
    // --- synthetic: the reference-benchmark shape ---
    val n = sys.env.getOrElse("SPARK_GRAFT_INGEST_POINTS", "10000000").toLong
    val metrics = array(Seq("cpu.user", "cpu.sys", "mem.free", "disk.io",
      "net.rx", "net.tx", "load.one", "io.wait").map(lit): _*)
    val synth = spark.range(n).select(
      element_at(metrics, (col("id") % 8 + 1).cast("int")).as("metric"),
      (lit(1704067200000000000L) + col("id") * 700000000L).as("ts"),
      (col("id") % 997).cast("double").as("value"),
      (col("id") % 1000).cast("string").as("tag_user"))
    clean(s"$base/synthetic")
    val synthSec = timed {
      graft.tsdb.Ingest.write(new graft.tsdb.Db(synth), s"$base/synthetic")
    }
    System.gc()
    // --- real events through the batch path ---
    val evCount = spark.read.parquet(s"$sfDir/events.parquet").count()
    clean(s"$base/events")
    val evSec = timed {
      graft.tsdb.Ingest.write(
        graft.tsdb.Db.fromEvents(spark, sfDir), s"$base/events")
    }
    System.gc()
    // --- real events through the streaming path ---
    // the streaming file source watches a DIRECTORY (a landing zone);
    // when the sf table is a single parquet file, link it into one
    clean(s"$base/stream"); clean(s"$base/ckpt"); clean(s"$base/landing")
    val evPath = java.nio.file.Paths.get(s"$sfDir/events.parquet")
    val landing =
      if (java.nio.file.Files.isDirectory(evPath)) evPath.toString
      else {
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$base/landing"))
        java.nio.file.Files.createSymbolicLink(
          java.nio.file.Paths.get(s"$base/landing/events.parquet"), evPath)
        s"$base/landing"
      }
    val stSec = timed {
      graft.streaming.StreamingIngest.ingestAvailable(
        spark, landing, s"$base/stream", s"$base/ckpt")
    }
    System.gc()
    Seq(s"$base/synthetic", s"$base/events", s"$base/stream", s"$base/ckpt",
      s"$base/landing").foreach(clean)
    f"""{"synthetic_points":$n,"synthetic_sec":$synthSec%.3f,"synthetic_pts_per_sec":${n / synthSec}%.0f,""" +
      f""""events_points":$evCount,"events_sec":$evSec%.3f,"events_pts_per_sec":${evCount / evSec}%.0f,""" +
      f""""streaming_points":$evCount,"streaming_sec":$stSec%.3f,"streaming_pts_per_sec":${evCount / stSec}%.0f}"""
  }
}
