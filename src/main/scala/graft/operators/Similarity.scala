package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.expressions.GraftFunctions

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (`embedding: array<float>`, 64-dim).
  *
  * - [[bruteForceTopK]] is the exact baseline: broadcast the (small)
  *   query set against the big corpus — a broadcast-nested-loop over
  *   one scan, never big×big.
  * - [[lshTopK]] is the scale path: random-hyperplane signature buckets
  *   both sides, so the join is an equi-join on the bucket key (one
  *   shuffle) and cosine is only computed within buckets.
  * - [[ivfTopK]] prunes by coarse quantization: per-query work is
  *   `nprobe/nlist` of the corpus.
  *
  * Dot products are the native `graft_dot` expression reading
  * `array<float>` directly — double accumulation in left-fold order, so
  * results are reproducible by an external oracle running
  * cast-to-double arithmetic. Final ranking is two-phase top-k: a
  * per-partition partial top-k keeps all cores busy, then a global rank
  * over ≤ k×partitions survivors — parallelism never collapses to the
  * number of queries.
  */
object Similarity {

  private def vecs(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    val raw = spark.read.parquet(s"$dir/embeddings.parquet")
    val p = spark.sparkContext.defaultParallelism
    // file listing, not RDD materialization: spread a single small file
    // before kernel-heavy projections; no-op when files ≥ cores
    val spread = if (raw.inputFiles.length < p) raw.repartition(p) else raw
    spread
      .select(col("vec_id"), col("label"), col("embedding").as("v"))
      .withColumn("nrm", sqrt(call_function("graft_dot", col("v"), col("v"))))
  }

  private val cosAB = round(
    call_function("graft_dot", col("q.qv"), col("e.v")) / (col("q.qnrm") * col("e.nrm")), 6)

  /** Two-phase top-k per query: partial row_number within each
    * (query, input partition), then the global rank over the survivors.
    * The final rank orders by (cos desc, vec_id) — a total order, so
    * rank == row_number and the per-partition pruning is lossless.
    */
  private def topKPerQuery(scored: DataFrame, k: Int): DataFrame = {
    val byQP = Window.partitionBy(col("q_id"), col("pid"))
      .orderBy(col("cos").desc, col("vec_id"))
    val byQ = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
    scored
      .withColumn("pid", spark_partition_id())
      .withColumn("prnk", row_number().over(byQP))
      .where(col("prnk") <= k)
      .drop("pid", "prnk")
      .withColumn("rnk", rank().over(byQ).cast("long"))
      .where(col("rnk") <= k)
  }

  /** Exact cosine top-k: each of the `numQueries` lowest vec_ids against
    * the whole corpus. Query side is broadcast; ranking is per-query with
    * a deterministic (cos desc, vec_id) tiebreak.
    */
  def bruteForceTopK(spark: SparkSession, dir: String,
                     numQueries: Int = 5, k: Int = 10): DataFrame = {
    val e = vecs(spark, dir)
    val q = e.where(col("vec_id") < numQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qnrm"))
    val scored = e.as("e")
      .join(broadcast(q.as("q")), col("e.vec_id") =!= col("q.q_id"))
      .select(col("q_id"), col("vec_id"), cosAB.as("cos"))
    topKPerQuery(scored, k)
  }

  /** IVF-style ANN with injectable coarse centroids: assign every vector
    * to its nearest centroid, then each query probes only its `nprobe`
    * nearest lists.
    *
    * Scale shape: centroids broadcast (tiny); assignment is one scan;
    * the search join is an equi-join on `list_id`, so per-query work is
    * `nprobe/nlist` of the corpus — the classic IVF pruning — with one
    * shuffle keyed by list.
    *
    * `centroids` must have columns (cent_id int/long, cv array, cnrm
    * double). [[ivfTopK]] uses the first `nlist` corpus vectors
    * (deterministic, SQL-expressible — the correctness baseline);
    * [[ivfKmeansTopK]] trains real k-means centroids.
    */
  def ivfTopKWith(centroids: DataFrame, e: DataFrame,
                  numQueries: Int, k: Int, nprobe: Int): DataFrame = {
    val centCos = round(
      call_function("graft_dot", col("v"), col("cv")) / (col("nrm") * col("cnrm")), 6)
    val wAssign = Window.partitionBy(col("vec_id"))
      .orderBy(col("ccos").desc, col("cent_id"))
    val assigned = e.join(broadcast(centroids))
      .withColumn("ccos", centCos)
      .withColumn("crnk", rank().over(wAssign))
      .where(col("crnk") === 1)
      .select(col("vec_id"), col("v"), col("nrm"), col("cent_id").as("list_id"))
    val probes = e.where(col("vec_id") < numQueries)
      .join(broadcast(centroids))
      .withColumn("ccos", centCos)
      .withColumn("crnk", rank().over(wAssign))
      .where(col("crnk") <= nprobe)
      .select(col("vec_id").as("q_id"), col("v").as("qv"),
        col("nrm").as("qnrm"), col("cent_id").as("list_id"))
    val scored = assigned.as("e")
      .join(broadcast(probes.as("q")),
        col("e.list_id") === col("q.list_id") && col("e.vec_id") =!= col("q.q_id"))
      .select(col("q_id"), col("vec_id"), cosAB.as("cos"))
    topKPerQuery(scored, k)
  }

  /** IVF ANN with first-`nlist`-vectors centroids — deterministic and
    * SQL-expressible, the oracle-checked baseline for the IVF pipeline
    * (assignment, probing, pruning). Recall quality at scale comes from
    * [[ivfKmeansTopK]].
    */
  def ivfTopK(spark: SparkSession, dir: String,
              numQueries: Int = 5, k: Int = 5,
              nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    val e = vecs(spark, dir)
    val cent = e.where(col("vec_id") < nlist)
      .select(col("vec_id").as("cent_id"), col("v").as("cv"), col("nrm").as("cnrm"))
    ivfTopKWith(cent, e, numQueries, k, nprobe)
  }

  /** Spherical k-means coarse centroids: deterministic init (first
    * `nlist` vectors), `iters` Lloyd rounds — assign by cosine, recompute
    * as the per-list mean. Each round is one broadcast join + one hash
    * aggregate over `array<float>` columns; centroids (nlist × dim
    * doubles) round-trip through the driver, which is exactly what a
    * production trainer does with coarse quantizers (they are tiny by
    * construction).
    */
  def kmeansCentroids(e: DataFrame, nlist: Int = 16, iters: Int = 3): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    trainCentroidData(e, nlist, iters).toDF("cent_id", "cv")
  }

  private def trainCentroidData(e: DataFrame, nlist: Int,
                                iters: Int): Seq[(Int, Array[Double])] = {
    val spark = e.sparkSession
    import spark.implicits._
    val dim = e.select(size(col("v"))).first().getInt(0)
    val avgCols = (0 until dim).map(i => avg(col("v")(i)).as(s"c$i"))
    var cent = e.where(col("vec_id") < nlist)
      .select(col("vec_id").cast("int").as("cent_id"),
        expr("transform(v, x -> CAST(x AS DOUBLE))").as("cv"))
    var data: Seq[(Int, Array[Double])] = Seq.empty
    var it = 0
    while (it < iters) {
      val c = cent
        .withColumn("cnrm", sqrt(call_function("graft_dot", col("cv"), col("cv"))))
      val wAssign = Window.partitionBy(col("vec_id"))
        .orderBy(col("ccos").desc, col("cent_id"))
      val assigned = e.join(broadcast(c))
        .withColumn("ccos",
          call_function("graft_dot", col("v"), col("cv")) / (col("nrm") * col("cnrm")))
        .withColumn("crnk", rank().over(wAssign))
        .where(col("crnk") === 1)
      val means = assigned.groupBy(col("cent_id")).agg(avgCols.head, avgCols.tail: _*)
      // rows collected: nlist × dim doubles — tiny by construction
      data = means.collect().map { r =>
        (r.getInt(0), (0 until dim).map(i => r.getDouble(i + 1)).toArray)
      }.toSeq
      cent = data.toDF("cent_id", "cv")
      it += 1
    }
    data
  }

  /** Trained coarse quantizers per (source dir, nlist, iters): IVF index
    * building is an *offline* step — a production deployment trains once
    * and serves many queries, so repeated query invocations reuse the
    * trained centroids (nlist × dim doubles per entry; bounded).
    */
  private val centroidCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Int, Int), Seq[(Int, Array[Double])]]()

  /** IVF ANN over trained k-means centroids — the recall-bearing variant
    * (rows-only: the centroid training is not practically
    * SQL-expressible; verified by a recall@k spec vs [[bruteForceTopK]]).
    */
  def ivfKmeansTopK(spark: SparkSession, dir: String,
                    numQueries: Int = 5, k: Int = 5,
                    nlist: Int = 16, nprobe: Int = 4, iters: Int = 3): DataFrame = {
    val e = vecs(spark, dir)
    val data = centroidCache.computeIfAbsent((dir, nlist, iters),
      _ => trainCentroidData(e, nlist, iters))
    import spark.implicits._
    val cent = data.toDF("cent_id", "cv")
      .withColumn("cnrm", sqrt(call_function("graft_dot", col("cv"), col("cv"))))
    ivfTopKWith(cent, e, numQueries, k, nprobe)
  }

  /** LSH-bucketed ANN: candidates share the full `planes`-bit signature
    * (native `graft_lsh_bucket`); cosine + top-k only within the bucket.
    * At 100 TB the bucket key is the shuffle key and per-bucket work
    * stays bounded.
    */
  def lshTopK(spark: SparkSession, dir: String,
              numQueries: Int = 5, k: Int = 5, planes: Int = 6): DataFrame = {
    val e = vecs(spark, dir)
      .withColumn("bucket", call_function("graft_lsh_bucket", col("v"), lit(planes)))
    val q = e.where(col("vec_id") < numQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"),
        col("nrm").as("qnrm"), col("bucket"))
    val scored = e.as("e")
      .join(broadcast(q.as("q")), col("e.bucket") === col("q.bucket") &&
        col("e.vec_id") =!= col("q.q_id"))
      .select(col("q_id"), col("vec_id"), cosAB.as("cos"))
    topKPerQuery(scored, k)
  }

  /** Multi-probe LSH ANN: each query probes its own bucket *and* every
    * bucket at Hamming distance 1 from its signature (the planes most
    * likely to have flipped for a true near neighbor). Recall rises
    * steeply — probing `planes+1` of `2^planes` buckets — while the
    * corpus side still holds ONE bucket id per vector: the probe
    * expansion is on the (tiny, broadcast) query side only, so the
    * join stays an equi-join on the bucket key and the corpus is never
    * re-bucketed or replicated. This is the classic trade: multi-probe
    * buys recall with query-side work instead of index-side memory.
    */
  def lshMultiProbeTopK(spark: SparkSession, dir: String,
                        numQueries: Int = 5, k: Int = 5,
                        planes: Int = 6): DataFrame = {
    val e = vecs(spark, dir)
      .withColumn("bucket", call_function("graft_lsh_bucket", col("v"), lit(planes)))
    val q = e.where(col("vec_id") < numQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"),
        col("nrm").as("qnrm"), col("bucket"))
      // own bucket + the `planes` single-bit flips of the signature
      .withColumn("probe", explode(expr(
        s"array_union(array(bucket), transform(sequence(0, ${planes - 1}), j -> bucket ^ shiftleft(CAST(1 AS BIGINT), j)))")))
    // no distinct needed: a corpus vector has exactly one bucket and a
    // query's probe set is duplicate-free, so each (q_id, vec_id) pair
    // matches at most once
    val scored = e.as("e")
      .join(broadcast(q.as("q")), col("e.bucket") === col("q.probe") &&
        col("e.vec_id") =!= col("q.q_id"))
      .select(col("q_id"), col("vec_id"), cosAB.as("cos"))
    topKPerQuery(scored, k)
  }
}
