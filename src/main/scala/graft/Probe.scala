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
