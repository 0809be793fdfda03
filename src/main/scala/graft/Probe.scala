package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off diagnostics for scale-leg investigations: phase-by-phase
  * timing of the embedding-LSH dedup at an arbitrary scale factor.
  * Not part of the driver contract; used to attribute wall-clock to
  * plan phases when a scale ratio needs a measured explanation.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factor = args.headOption.flatMap(_.toIntOption).getOrElse(100)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config(graft.Conf.WorkDirKey, "/root/repo/out")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Dedup

    if (args.headOption.contains("recall")) {
      import graft.operators.Similarity
      for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
                    "/root/testdata/sf0.1")) {
        val bf = Similarity.bruteForceTopK(spark, d, numQueries = 5, k = 10)
          .select("q_id", "vec_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        def recall(df: org.apache.spark.sql.DataFrame): Double = {
          val rows = df.select("q_id", "vec_id").collect()
            .map(r => (r.getLong(0), r.getLong(1))).toSet
          bf.count(rows.contains).toDouble / bf.size
        }
        for (sl <- Seq(50, 100, 200)) {
          val pqR = recall(Similarity.pqTopK(spark, d, numQueries = 5, k = 10,
            shortlist = sl))
          val ivfpqR = recall(Similarity.ivfPqTopK(spark, d, numQueries = 5,
            k = 10, shortlist = sl))
          println(s"## $d shortlist=$sl pq_recall@10=$pqR ivfpq_recall@10=$ivfpqR")
        }
      }
      spark.stop()
      return
    }

    if (args.headOption.contains("q5")) {
      // r13 scan audit for the q5 bucketed 100× leg: the formatted plan
      // (ReadSchema / PushedFilters / Sort placement over the bucketed
      // scans) plus an A/B of the as-is bucketFacts layout vs a
      // ONE-FILE-PER-BUCKET variant (writer repartitioned on the bucket
      // key): with many files per bucket Spark drops the sortBy
      // guarantee and re-sorts both SMJ sides on every query
      val dir100 = ScaleData.ensure(spark, sfDir, 100,
        tables = ScaleData.AllTables)
      import graft.operators.Analytics
      val warehouse = new java.io.File(
        new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath)
      def clean(prefix: String): Unit =
        for (t <- Seq("lineitem_b", "orders_b", "customer_b")) {
          spark.sql(s"DROP TABLE IF EXISTS ${prefix}_$t")
          org.apache.commons.io.FileUtils.deleteQuietly(
            new java.io.File(warehouse, s"${prefix}_$t"))
        }
      def leg(label: String, prefix: String, packed: Boolean): Unit = {
        clean(prefix)
        val t0 = System.nanoTime()
        Analytics.bucketFacts(spark, dir100, buckets = 32, prefix = prefix,
          onePerBucket = packed)
        println(f"## $label build: ${(System.nanoTime() - t0) / 1e9}%.2f s")
        def files(t: String) =
          new java.io.File(warehouse, s"${prefix}_$t").listFiles()
            .count(_.getName.endsWith(".parquet"))
        println(s"## $label files: lineitem_b=${files("lineitem_b")} orders_b=${files("orders_b")}")
        for (i <- 1 to 3) {
          System.gc()
          val t = System.nanoTime()
          Analytics.q5CoBucketed(spark, dir100, prefix)
            .write.format("noop").mode("overwrite").save()
          println(f"## $label q5 run$i: ${(System.nanoTime() - t) / 1e9}%.2f s")
        }
        println(s"===== $label plan =====")
        Analytics.q5CoBucketed(spark, dir100, prefix).explain("formatted")
        clean(prefix)
      }
      leg("as-is", "probe_q5a", packed = false)
      leg("one-file-per-bucket", "probe_q5b", packed = true)
      // one file per bucket + the sorted-scan flag: Spark 3+ only
      // trusts a bucketed table's sortBy when every bucket is a single
      // file AND spark.sql.legacy.bucketedTableScan.outputOrdering is
      // on — the combination that deletes the per-query SMJ sorts
      spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      try leg("packed+sortedscan", "probe_q5c", packed = true)
      finally spark.conf
        .unset("spark.sql.legacy.bucketedTableScan.outputOrdering")
      spark.stop()
      return
    }

    if (args.headOption.contains("grams")) {
      // r13 item 7: the shared gram-instance materialize at 100× —
      // codec A/B (default snappy vs zstd) on write wall + bytes, and
      // the three consumers' walls + ReadSchema over each layout
      import graft.operators.TextAnalysis
      val dir100 = ScaleData.ensure(spark, sfDir, 100,
        tables = Seq("documents", "embeddings", "events"))
      val docs100 = spark.read.parquet(s"$dir100/documents.parquet")
        .select(col("doc_id"), col("text"))
      val work = graft.Conf.resolveWorkDir(spark, "")
      def dirSize(p: String): Long = {
        val f = new java.io.File(p)
        if (!f.exists()) -1L
        else f.listFiles().filter(_.isFile).map(_.length()).sum
      }
      for (codec <- Seq("snappy", "zstd")) {
        spark.conf.set("spark.sql.parquet.compression.codec", codec)
        val tmpG = s"$work/probe_grams100_$codec"
        try {
          for (i <- 1 to 2) {
            System.gc()
            val t0 = System.nanoTime()
            TextAnalysis.gramInstances(spark, dir100)
              .write.mode("overwrite").parquet(tmpG)
            println(f"## $codec write run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s bytes=${dirSize(tmpG)}")
          }
          val inst = spark.read.parquet(tmpG)
          val consumers = Seq[(String, () => org.apache.spark.sql.DataFrame)](
            "dup_ngrams" -> (() => TextAnalysis.dupNgramsFromInstances(inst)),
            "spans" -> (() => TextAnalysis.dedupSpansFromInstances(inst)),
            "rewrite" -> (() => TextAnalysis.dedupRewriteFromInstances(docs100, inst)))
          consumers.foreach { case (n, f) =>
            f().write.format("noop").mode("overwrite").save() // warm
            System.gc()
            val t0 = System.nanoTime()
            f().write.format("noop").mode("overwrite").save()
            println(f"## $codec $n: ${(System.nanoTime() - t0) / 1e9}%.2f s")
          }
          val scan = TextAnalysis.dupNgramsFromInstances(inst)
            .queryExecution.executedPlan.toString
          scan.linesIterator.filter(_.contains("ReadSchema"))
            .take(2).foreach(l => println(s"## $codec dup_ngrams $l".take(300)))
        } finally {
          org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmpG))
        }
      }
      spark.conf.unset("spark.sql.parquet.compression.codec")
      spark.stop()
      return
    }

    if (args.headOption.contains("lshverify")) {
      // r13 verify audit (verdict item 4): materialize the invariant
      // 24M-candidate frame once, then time the shuffle-hash verify
      // with a per-task duration histogram (max/median ratio is the
      // guide §2.5 skew signal) and print the executed plan — the
      // codegen claim is checked against the WholeStageCodegen spans
      val dir100 = ScaleData.ensure(spark, sfDir, 100,
        tables = Seq("embeddings"))
      val n = 2L * spark.read.parquet(s"$dir100/embeddings.parquet").count()
      val plan = Dedup.lshPlanSized(0.9, n)
      val e = Dedup.withPlantedNearDups(spark, dir100)
      val work = graft.Conf.resolveWorkDir(spark, "")
      val tmpC = work + "/probe_emb100_cand"
      try {
        val t0 = System.nanoTime()
        Dedup.embeddingCandFrame(e, plan._1, plan._2)
          .write.mode("overwrite").parquet(tmpC)
        println(f"## cand materialize: ${(System.nanoTime() - t0) / 1e9}%.2f s")
        val cand = spark.read.parquet(tmpC)
        println(s"## candidates=${cand.count()}")
        val durs = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
        val listener = new org.apache.spark.scheduler.SparkListener {
          override def onTaskEnd(
              t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
            durs.add(t.taskInfo.duration)
        }
        // warm both shapes once
        Dedup.embeddingVerifyFrame(e, cand, 0.9, broadcastVerify = false).count()
        for (i <- 1 to 3) {
          System.gc()
          durs.clear()
          spark.sparkContext.addSparkListener(listener)
          val t = System.nanoTime()
          val nv = Dedup.embeddingVerifyFrame(e, cand, 0.9,
            broadcastVerify = false).count()
          val sec = (System.nanoTime() - t) / 1e9
          Thread.sleep(800)
          spark.sparkContext.removeSparkListener(listener)
          val ds = { val it = durs.iterator(); val b = Seq.newBuilder[Long]
            while (it.hasNext) b += it.next(); b.result().sorted }
          val med = if (ds.nonEmpty) ds(ds.size / 2) else -1L
          println(f"## verify run$i: $sec%.2f s verified=$nv tasks=${ds.size} " +
            f"max_task_ms=${if (ds.nonEmpty) ds.last else -1L} med_task_ms=$med")
        }
        println("===== verify plan (executed) =====")
        println(Dedup.embeddingVerifyFrame(e, cand, 0.9, broadcastVerify = false)
          .queryExecution.executedPlan.toString.take(12000))
      } finally {
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmpC))
      }
      spark.stop()
      return
    }

    if (args.headOption.contains("components")) {
      // r13 A/B: the uncontracted r12 loop vs the local-contraction
      // route over the SAME materialized 100× simhash pair frame —
      // walls, round counts, loop-node counts, and a full-row checksum
      // equivalence of the labels (the route must be invisible in the
      // output)
      val dir100 = ScaleData.ensure(spark, sfDir, 100,
        tables = Seq("documents", "embeddings", "events"))
      val work = graft.Conf.resolveWorkDir(spark, "")
      val tmpP = work + "/probe_simhash_pairs100"
      try {
        val t0 = System.nanoTime()
        Dedup.simhashPairs(spark, dir100).write.mode("overwrite").parquet(tmpP)
        println(f"## pairs materialize: ${(System.nanoTime() - t0) / 1e9}%.2f s")
        val pairs = spark.read.parquet(tmpP).select("doc_a", "doc_b")
        println(s"## pairs=${pairs.count()}")
        def run(label: String, contract: Boolean): Unit =
          for (i <- 1 to 3) {
            spark.catalog.clearCache()
            System.gc()
            val t = System.nanoTime()
            Dedup.clusterPairsTuned(pairs, 40, localContraction = contract)
              .write.format("noop").mode("overwrite").save()
            val sec = (System.nanoTime() - t) / 1e9
            println(f"## $label run$i: $sec%.2f s rounds=${Dedup.lastClusterRounds} loop_nodes=${Dedup.lastClusterNodes}")
          }
        run("uncontracted", contract = false)
        run("contracted", contract = true)
        def checksum(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
          // bit_xor, not sum: a sum of 500k 64-bit hashes overflows
          // Long under ANSI; xor is order-insensitive and lossless here
          val r = df.agg(count(lit(1)),
            call_function("bit_xor", xxhash64(col("doc_id"),
              col("cluster_id"), col("cluster_size"), col("is_keeper")))).head()
          (r.getLong(0), r.getLong(1))
        }
        val a = checksum(Dedup.clusterPairsTuned(pairs, 40,
          localContraction = false))
        val b = checksum(Dedup.clusterPairs(pairs))
        println(s"## labels uncontracted=(${a._1},${a._2}) contracted=(${b._1},${b._2}) equal=${a == b}")
      } finally {
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmpP))
      }
      spark.stop()
      return
    }

    if (args.headOption.contains("candjoin")) {
      // attribute the 100× candidate phase: SMJ (default) vs
      // shuffle-hash self-join, wall + peak heap per repeat
      import java.lang.management.ManagementFactory
      import scala.jdk.CollectionConverters._
      val pools = ManagementFactory.getMemoryPoolMXBeans.asScala
        .filter(_.getType == java.lang.management.MemoryType.HEAP)
      val dir = ScaleData.ensure(spark, sfDir, 100, tables = Seq("embeddings"))
      val n = 2L * spark.read.parquet(s"$dir/embeddings.parquet").count()
      val plan = Dedup.lshPlanSized(0.9, n)
      println(s"## n=$n plan=$plan")
      graft.expressions.GraftFunctions.register(spark)
      val e = Dedup.withPlantedNearDups(spark, dir)
      val banded = e.select(col("vec_id"),
        posexplode(call_function("graft_lsh_bands", col("v"),
          lit(plan._1), lit(plan._2))).as(Seq("band", "bucket")))
      def run(label: String, hint: Option[String]): Unit = {
        for (i <- 1 to 3) {
          pools.foreach(_.resetPeakUsage())
          System.gc()
          val t0 = System.nanoTime()
          val b = hint.fold(banded)(banded.hint(_))
          val cand = b.as("a").join(b.as("b"),
              col("a.band") === col("b.band") &&
              col("a.bucket") === col("b.bucket") &&
              col("a.vec_id") < col("b.vec_id"))
            .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
            .repartition(spark.sparkContext.defaultParallelism)
          cand.write.format("noop").mode("overwrite").save()
          val sec = (System.nanoTime() - t0) / 1e9
          val peak = pools.map(_.getPeakUsage.getUsed).sum / (1024L * 1024L)
          println(f"## $label run$i: $sec%.2f s peak_heap=${peak} MB")
        }
      }
      run("smj", None)
      run("shuffle_hash", Some("shuffle_hash"))
      println("## plan (shuffle_hash):")
      banded.hint("shuffle_hash").as("a").join(
        banded.hint("shuffle_hash").as("b"),
        col("a.band") === col("b.band") &&
        col("a.bucket") === col("b.bucket") &&
        col("a.vec_id") < col("b.vec_id")).explain()
      spark.stop()
      return
    }

    val dir = if (factor == 1) sfDir
              else ScaleData.ensure(spark, sfDir, factor, tables = Seq("embeddings"))
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"## $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val n = 2L * spark.read.parquet(s"$dir/embeddings.parquet").count()
    val plan = Dedup.lshPlanSized(0.9, n)
    println(s"## n=$n plan=(rowsPerBand=${plan._1}, bands=${plan._2})")

    val planted = Dedup.withPlantedNearDups(spark, dir)
    timed("planted frame scan")(planted.write.format("noop").mode("overwrite").save())
    graft.expressions.GraftFunctions.register(spark)
    val banded = planted.select(col("vec_id"),
      posexplode(call_function("graft_lsh_bands", col("v"),
        lit(plan._1), lit(plan._2))).as(Seq("band", "bucket")))
    timed("banded signatures (1 side)")(
      banded.write.format("noop").mode("overwrite").save())
    val cand = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
        col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
    val nCand = timed("candidates (self-join+count)")(cand.count())
    println(s"## candidates=$nCand (${nCand.toDouble / (n / 2)} per source row)")
    timed("full query, warm 1")(
      Dedup.embeddingNearDup(spark, dir).write.format("noop").mode("overwrite").save())
    timed("full query, warm 2")(
      Dedup.embeddingNearDup(spark, dir).write.format("noop").mode("overwrite").save())
    val out = Dedup.embeddingNearDup(spark, dir)
    println(s"## verified pairs=${out.count()}")
    spark.stop()
  }
}
