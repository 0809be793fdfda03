package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.md5Fingerprint

/** Deduplication operators for training-data pipelines, over `documents`.
  *
  * Scale design: every variant avoids the O(n²) all-pairs cartesian —
  * exact dedup is a hash aggregate; MinHash/SimHash turn similarity into
  * equality on banded keys (one shuffle on the band key, then pairwise
  * only *within* buckets); n-gram Jaccard uses prefix blocking. All
  * hashing is Spark-native `xxhash64` (codegen'd, no UDFs).
  */
object Dedup {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")

  /** Spread a small-file scan across the cluster before compute-heavy
    * per-row work. A single small parquet file arrives as one split;
    * without this the expensive HOF projections run on one core. No-op
    * when the input already has enough splits (the 100 TB case).
    */
  private[operators] def parallelize(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p) else df
  }

  // ---------------------------------------------------------------- exact
  /** Exact dedup: md5 of normalized text → (fingerprint, group size,
    * keeper = lowest doc_id). A 100 TB corpus dedups in one hash
    * aggregate with map-side combine.
    */
  def exact(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .groupBy(md5Fingerprint(col("text")).as("fp"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keeper"))

  // ------------------------------------------------------------- shingles
  /** Distinct word 3-shingles of a document. */
  private val wordShingles = expr(
    """array_distinct(transform(
      |  sequence(1, greatest(size(split(text, ' ')) - 2, 1)),
      |  i -> concat_ws(' ', slice(split(text, ' '), i, 3))))""".stripMargin)

  /** Distinct char 3-grams of a document. */
  private val charGrams = expr(
    """array_distinct(transform(
      |  sequence(1, greatest(length(text) - 2, 1)),
      |  i -> substr(text, i, 3)))""".stripMargin)

  private def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    round(inter / (size(a) + size(b) - size(array_intersect(a, b))), 6)
  }

  // -------------------------------------------------------------- minhash
  /** MinHash + LSH near-dup pairs: word-3-shingle sets → `numHashes`
    * minhash signature (seeded xxhash64) → `bands` banded keys →
    * candidates = pairs sharing a band bucket → verified true Jaccard ≥
    * `threshold`.
    *
    * The band-bucket self-join is the scale path: at 1000 executors the
    * shuffle key is (band index, band hash), bucket sizes stay tiny for
    * non-duplicate data, and AQE handles the skewed buckets created by
    * large duplicate clusters.
    */
  def minhashLsh(spark: SparkSession, dir: String,
                 numHashes: Int = 32, bands: Int = 16,
                 threshold: Double = 0.5): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rowsPerBand = numHashes / bands
    // hash every shingle ONCE, then derive the i-th permutation with
    // universal hashing mod the Mersenne prime 2^31-1 — 32x fewer hash
    // evaluations than re-seeding xxhash, and products stay < 2^62 so
    // ANSI-mode long arithmetic cannot overflow
    val P = 2147483647L
    val sigCols = (0 until numHashes).map { i =>
      val a = (0x9E3779B9L * (i + 1)) % (P - 1) + 1
      val b = (0x85EBCA6BL * (i + 1)) % P
      array_min(transform(col("hs"), h => (h * lit(a) + lit(b)) % lit(P)))
    }
    // persist: the signature frame feeds both sides of the self-join and
    // the verification joins — without it the shingle+signature pipeline
    // is recomputed four times
    val base = parallelize(docs(spark, dir))
      .select(col("doc_id"), wordShingles.as("shingles"))
      .withColumn("hs", expr(s"transform(shingles, s -> pmod(xxhash64(s), ${P}L))"))
      .withColumn("sig", array(sigCols: _*))
      .persist()
    val banded = base.select(
      col("doc_id"),
      posexplode(expr(
        s"transform(sequence(0, ${bands - 1}), j -> hash(slice(sig, j*$rowsPerBand + 1, $rowsPerBand)))"))
        .as(Seq("band", "band_hash")))
    val cand = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.band_hash") === col("b.band_hash") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val sh = base.select(col("doc_id"), col("shingles"))
    cand
      .join(sh.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sh.as("sb"), col("doc_b") === col("sb.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        jaccard(col("sa.shingles"), col("sb.shingles")).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  // -------------------------------------------------------------- simhash
  /** 64-bit SimHash per document: per-token xxhash64, ±1 vote per bit,
    * sign → bit. One pass over the token array via codegen'd
    * higher-order functions — no shuffle at all.
    */
  def simhash(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      // materialize the 64 per-bit vote counters once per row (a second
      // projection keeps the aggregate from being inlined 64×)
      .select(
        col("doc_id"),
        expr(
          """aggregate(
            |  transform(split(text, ' '), t -> xxhash64(t)),
            |  array_repeat(CAST(0 AS BIGINT), 64),
            |  (acc, h) -> zip_with(acc,
            |    transform(sequence(0, 63),
            |      bb -> IF((shiftright(h, bb) & 1) = 1,
            |               CAST(1 AS BIGINT), CAST(-1 AS BIGINT))),
            |    (x, y) -> x + y))""".stripMargin).as("votes"))
      .select(
        col("doc_id"),
        expr(
          """aggregate(
            |  transform(sequence(0, 63), b -> IF(element_at(votes, b + 1) > 0,
            |    shiftleft(CAST(1 AS BIGINT), b), CAST(0 AS BIGINT))),
            |  CAST(0 AS BIGINT), (x, y) -> x + y)""".stripMargin).as("simhash"))

  /** SimHash banded candidates verified by Hamming distance ≤ `hamMax`.
    * 4 × 16-bit bands: a pair within Hamming ≤ 3 of 64 bits must agree
    * on at least one full band (pigeonhole), so equality on band keys is
    * a complete candidate generator for hamMax ≤ 3.
    */
  def simhashPairs(spark: SparkSession, dir: String, hamMax: Int = 3): DataFrame = {
    val sh = simhash(spark, dir)
    val banded = sh.select(
      col("doc_id"), col("simhash"),
      posexplode(expr(
        "transform(sequence(0, 3), j -> (shiftright(simhash, j*16) & 65535))"))
        .as(Seq("band", "band_val")))
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.band_val") === col("b.band_val") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        expr("bit_count(a.simhash ^ b.simhash)").as("hamming"))
      .distinct()
      .where(col("hamming") <= hamMax)
  }

  /** Exhaustive prefix-blocked *word-shingle* Jaccard — the ground-truth
    * oracle for [[minhashLsh]] (same similarity measure, no hashing).
    */
  def wordJaccardBlocked(spark: SparkSession, dir: String,
                         threshold: Double = 0.3): DataFrame = {
    val g = docs(spark, dir).select(
      col("doc_id"), substring(col("text"), 1, 16).as("blk"), wordShingles.as("grams"))
    g.as("a")
      .join(g.as("b"),
        col("a.blk") === col("b.blk") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        jaccard(col("a.grams"), col("b.grams")).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  // ------------------------------------------------------- n-gram jaccard
  /** Char-3-gram Jaccard over prefix-blocked candidate pairs. Blocking on
    * the first 16 chars keeps the join linear; the quadratic part runs
    * only inside blocks.
    */
  def ngramJaccard(spark: SparkSession, dir: String,
                   threshold: Double = 0.3): DataFrame = {
    val g = parallelize(docs(spark, dir)).select(
      col("doc_id"), substring(col("text"), 1, 16).as("blk"), charGrams.as("grams"))
    g.as("a")
      .join(g.as("b"),
        col("a.blk") === col("b.blk") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        jaccard(col("a.grams"), col("b.grams")).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  // --------------------------------------------------- embedding near-dup
  /** Embedding-cosine near-dup pairs, blocked by `label` (the cheap
    * cluster key): exact double-precision cosine, deterministic
    * left-fold dot products, pairs with rounded cosine ≥ `threshold`.
    */
  def embeddingCosine(spark: SparkSession, dir: String,
                      threshold: Double = 0.35): DataFrame = {
    // per-vector norms are computed ONCE here; the per-pair work is a
    // single dot product. sqrt(dotAA)*sqrt(dotBB) is bit-identical to
    // computing the norms inline, so the external oracle still matches.
    graft.expressions.GraftFunctions.register(spark)
    val e = parallelize(spark.read.parquet(s"$dir/embeddings.parquet"))
      .select(col("vec_id"), col("label"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      .withColumn("nrm", sqrt(expr("graft_dot(v, v)")))
    val dotAB = expr("graft_dot(a.v, b.v)")
    e.as("a")
      .join(e.as("b"),
        col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
      // re-spread: a 10-label equi-join leaves only 10 busy partitions
      .repartition(col("a.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        round(dotAB / (col("a.nrm") * col("b.nrm")), 6).as("cos"))
      .where(col("cos") >= threshold)
  }
}
