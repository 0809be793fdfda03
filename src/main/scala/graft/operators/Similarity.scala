package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (`embedding: array<float>`, 64-dim).
  *
  * - [[bruteForceTopK]] is the exact baseline: broadcast the (small)
  *   query set against the big corpus — a broadcast-nested-loop over
  *   one scan, never big×big.
  * - [[lshTopK]] is the scale path: random-hyperplane signature buckets
  *   both sides, so the join is an equi-join on the bucket key (one
  *   shuffle) and cosine is only computed within buckets.
  *
  * Dot products are left-fold `aggregate` over doubles — deterministic
  * and reproducible by an external oracle.
  */
object Similarity {

  private def vecs(spark: SparkSession, dir: String): DataFrame = {
    graft.expressions.GraftFunctions.register(spark)
    val raw = spark.read.parquet(s"$dir/embeddings.parquet")
    val p = spark.sparkContext.defaultParallelism
    val spread = if (raw.rdd.getNumPartitions < p) raw.repartition(p) else raw
    spread
      .select(col("vec_id"), col("label"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      // norm once per vector via the native codegen'd dot; identical
      // left-fold order keeps it bit-comparable to the external oracle
      .withColumn("nrm", sqrt(expr("graft_dot(v, v)")))
  }

  private val cosAB = round(
    expr("graft_dot(q.qv, e.v)") / (col("q.qnrm") * col("e.nrm")), 6)

  /** Exact cosine top-k: each of the `numQueries` lowest vec_ids against
    * the whole corpus. Query side is broadcast; ranking is per-query with
    * a deterministic (cos desc, vec_id) tiebreak.
    */
  def bruteForceTopK(spark: SparkSession, dir: String,
                     numQueries: Int = 5, k: Int = 10): DataFrame = {
    val e = vecs(spark, dir)
    val q = e.where(col("vec_id") < numQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qnrm"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
    e.as("e")
      .join(broadcast(q.as("q")), col("e.vec_id") =!= col("q.q_id"))
      .select(col("q_id"), col("vec_id"), cosAB.as("cos"))
      .withColumn("rnk", rank().over(w).cast("long"))
      .where(col("rnk") <= k)
  }

  /** Random-hyperplane LSH bucket for a double-array column: `planes`
    * sign bits, plane j's components are deterministic ±1 derived from
    * xxhash64(j, dim index).
    */
  private def lshBucket(vCol: String, planes: Int): org.apache.spark.sql.Column =
    expr(
      s"""aggregate(
         |  transform(sequence(0, ${planes - 1}), j -> IF(
         |    aggregate(
         |      zip_with($vCol, transform(sequence(0, size($vCol) - 1),
         |        d -> IF((xxhash64(j, d) & 1) = 1, CAST(1.0 AS DOUBLE), CAST(-1.0 AS DOUBLE))),
         |        (x, s) -> x * s),
         |      CAST(0.0 AS DOUBLE), (s, x) -> s + x) > 0,
         |    shiftleft(CAST(1 AS BIGINT), j), CAST(0 AS BIGINT))),
         |  CAST(0 AS BIGINT), (x, y) -> x + y)""".stripMargin)

  /** IVF-style ANN: assign every vector to its nearest of `nlist` coarse
    * centroids (here: the first `nlist` corpus vectors — deterministic
    * stand-ins for k-means centroids, which a production deployment
    * would train offline), then each query probes only its `nprobe`
    * nearest lists.
    *
    * Scale shape: centroids broadcast (tiny); assignment is one scan;
    * the search join is an equi-join on `list_id`, so per-query work is
    * `nprobe/nlist` of the corpus — the classic IVF pruning — with one
    * shuffle keyed by list.
    */
  def ivfTopK(spark: SparkSession, dir: String,
              numQueries: Int = 5, k: Int = 5,
              nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    val e = vecs(spark, dir)
    val cent = e.where(col("vec_id") < nlist)
      .select(col("vec_id").as("cent_id"), col("v").as("cv"), col("nrm").as("cnrm"))
    val centCos = round(
      expr("graft_dot(v, cv)") / (col("nrm") * col("cnrm")), 6)
    val wAssign = Window.partitionBy(col("vec_id"))
      .orderBy(col("ccos").desc, col("cent_id"))
    val assigned = e.join(broadcast(cent))
      .withColumn("ccos", centCos)
      .withColumn("crnk", rank().over(wAssign))
      .where(col("crnk") === 1)
      .select(col("vec_id"), col("v"), col("nrm"), col("cent_id").as("list_id"))
    val wProbe = Window.partitionBy(col("vec_id"))
      .orderBy(col("ccos").desc, col("cent_id"))
    val probes = e.where(col("vec_id") < numQueries)
      .join(broadcast(cent))
      .withColumn("ccos", centCos)
      .withColumn("crnk", rank().over(wProbe))
      .where(col("crnk") <= nprobe)
      .select(col("vec_id").as("q_id"), col("v").as("qv"),
        col("nrm").as("qnrm"), col("cent_id").as("list_id"))
    val wTop = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
    assigned.as("e")
      .join(broadcast(probes.as("q")),
        col("e.list_id") === col("q.list_id") && col("e.vec_id") =!= col("q.q_id"))
      .select(col("q_id"), col("vec_id"), cosAB.as("cos"))
      .withColumn("rnk", rank().over(wTop).cast("long"))
      .where(col("rnk") <= k)
  }

  /** LSH-bucketed ANN: candidates share the full `planes`-bit signature;
    * cosine + top-k only within the bucket. At 100 TB the bucket key is
    * the shuffle key and per-bucket work stays bounded.
    */
  def lshTopK(spark: SparkSession, dir: String,
              numQueries: Int = 5, k: Int = 5, planes: Int = 6): DataFrame = {
    val e = vecs(spark, dir).withColumn("bucket", lshBucket("v", planes))
    val q = e.where(col("vec_id") < numQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"),
        col("nrm").as("qnrm"), col("bucket"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
    e.as("e")
      .join(broadcast(q.as("q")), col("e.bucket") === col("q.bucket") &&
        col("e.vec_id") =!= col("q.q_id"))
      .select(col("q_id"), col("vec_id"), cosAB.as("cos"))
      .withColumn("rnk", rank().over(w).cast("long"))
      .where(col("rnk") <= k)
  }
}
