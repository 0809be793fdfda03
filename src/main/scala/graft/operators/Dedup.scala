package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.expressions.GraftFunctions
import graft.functions.TextFunctions.md5Fingerprint

/** Deduplication operators for training-data pipelines, over `documents`.
  *
  * Scale design: every variant avoids the O(n²) all-pairs cartesian —
  * exact dedup is a hash aggregate; MinHash/SimHash/embedding-LSH turn
  * similarity into equality on banded keys (one shuffle on the band key,
  * then pairwise only *within* buckets); n-gram Jaccard uses prefix
  * blocking. The per-row inner loops (shingling, signatures, dot
  * products) are native codegen'd expressions (`graft.expressions`), not
  * interpreted HOFs.
  */
object Dedup {

  private def docs(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    spark.read.parquet(s"$dir/documents.parquet")
  }

  /** Spread a small-file scan across the cluster before compute-heavy
    * per-row work. A single small parquet file arrives as one split;
    * without this the expensive kernel projections run on one core.
    * File counting is a listing, not an RDD materialization; at real
    * scale (files ≥ cores) this is a no-op.
    */
  private[operators] def parallelize(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.inputFiles.length < p) df.repartition(p) else df
  }

  // ------------------------------------------------------------------ exact
  /** Exact dedup: md5 of normalized text → (fingerprint, group size,
    * keeper = lowest doc_id). A 100 TB corpus dedups in one hash
    * aggregate with map-side combine.
    */
  def exact(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .groupBy(md5Fingerprint(col("text")).as("fp"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keeper"))

  // --------------------------------------------------------------- shingles
  /** Distinct word 3-shingles (native kernel). */
  private val wordShingles = call_function("graft_word_shingles", col("text"))

  /** Distinct char 3-grams (native kernel). */
  private val charGrams = call_function("graft_char_grams", col("text"))

  private def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    round(inter / (size(a) + size(b) - size(array_intersect(a, b))), 6)
  }

  // ---------------------------------------------------------------- minhash
  /** MinHash + LSH near-dup pairs: word-3-shingle sets → `numHashes`
    * minhash signature (one xxhash per shingle, permutations derived by
    * universal re-mixing — `graft_minhash_sig`) → `bands` banded keys →
    * candidates = pairs sharing a band bucket → verified true Jaccard ≥
    * `threshold`.
    *
    * The band-bucket self-join is the scale path: at 1000 executors the
    * shuffle key is (band index, band hash), bucket sizes stay tiny for
    * non-duplicate data, and AQE handles the skewed buckets created by
    * large duplicate clusters. The signature projection is cheap native
    * code, so the branches of the self-join simply recompute it — no
    * cached state pinned in a resident session. (At 100 TB, checkpoint
    * the signature frame to durable storage instead and join from that.)
    */
  def minhashLsh(spark: SparkSession, dir: String,
                 numHashes: Int = 32, bands: Int = 16,
                 threshold: Double = 0.5, salt: Int = 1): DataFrame =
    minhashLshFrame(parallelize(docs(spark, dir)), numHashes, bands, threshold, salt)

  /** [[minhashLsh]] over an arbitrary (doc_id, text) frame.
    *
    * `salt > 1` spreads each band bucket over `salt` sub-keys: the left
    * side keeps one deterministic salt per doc, the right side is
    * replicated to all salts, so every candidate pair still meets
    * exactly once and the result is identical — but a pathological
    * duplicate cluster's O(c²) pairs land on `salt`× more reducers
    * instead of one straggler task. (AQE's skew-join split does this
    * adaptively; the salt is the explicit, planner-independent form.)
    */
  def minhashLshFrame(docsDf: DataFrame,
                      numHashes: Int = 32, bands: Int = 16,
                      threshold: Double = 0.5, salt: Int = 1): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    require(salt >= 1, "salt must be >= 1")
    GraftFunctions.register(docsDf.sparkSession)
    val rowsPerBand = numHashes / bands
    val base = docsDf
      .select(col("doc_id"), wordShingles.as("shingles"))
      .withColumn("sig", call_function("graft_minhash_sig", col("shingles"), lit(numHashes)))
    val banded = base.select(
      col("doc_id"),
      posexplode(expr(
        s"transform(sequence(0, ${bands - 1}), j -> hash(slice(sig, j*$rowsPerBand + 1, $rowsPerBand)))"))
        .as(Seq("band", "band_hash")))
    val cand = (if (salt <= 1) {
      banded.as("a")
        .join(banded.as("b"),
          col("a.band") === col("b.band") && col("a.band_hash") === col("b.band_hash") &&
            col("a.doc_id") < col("b.doc_id"))
    } else {
      val a = banded.withColumn("salt", pmod(hash(col("doc_id")), lit(salt)))
      val b = banded.withColumn("salt", explode(expr(s"sequence(0, ${salt - 1})")))
      a.as("a")
        .join(b.as("b"),
          col("a.band") === col("b.band") && col("a.band_hash") === col("b.band_hash") &&
            col("a.salt") === col("b.salt") && col("a.doc_id") < col("b.doc_id"))
    })
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

  // ---------------------------------------------------------------- simhash
  /** 64-bit SimHash per document: per-token xxhash64, ±1 vote per bit,
    * sign → bit — one native kernel call per row (`graft_simhash`), one
    * scan, no shuffle.
    */
  def simhash(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(
        col("doc_id"),
        call_function("graft_simhash", split(col("text"), " ")).as("simhash"))

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

  // --------------------------------------------------------- n-gram jaccard
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

  // ----------------------------------------------------- embedding near-dup
  private def embFrame(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    parallelize(spark.read.parquet(s"$dir/embeddings.parquet"))
      .select(col("vec_id"), col("label"), col("embedding").as("v"))
      // norm once per vector; graft_dot reads array<float> directly and
      // accumulates in double — bit-identical to dotting cast-to-double
      // arrays, with no per-row transform(CAST) materialization
      .withColumn("nrm", sqrt(call_function("graft_dot", col("v"), col("v"))))
  }

  /** Embedding-cosine near-dup pairs, blocked by `label` (the cheap
    * cluster key): exact double-precision cosine, deterministic
    * left-fold dot products, pairs with rounded cosine ≥ `threshold`.
    *
    * All-pairs *within a label block* — O(N²/labels): fine when label
    * blocks are small, quadratic when they aren't. The scale path is
    * [[embeddingCosineLsh]]; this variant is its correctness oracle
    * (exhaustive within blocks, SQL-expressible).
    */
  def embeddingCosine(spark: SparkSession, dir: String,
                      threshold: Double = 0.35): DataFrame = {
    val e = embFrame(spark, dir)
    e.as("a")
      .join(e.as("b"),
        col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
      // re-spread: a 10-label equi-join leaves only 10 busy partitions
      .repartition(col("a.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        round(call_function("graft_dot", col("a.v"), col("b.v"))
          / (col("a.nrm") * col("b.nrm")), 6).as("cos"))
      .where(col("cos") >= threshold)
  }

  /** Scale-safe embedding near-dup: banded random-hyperplane LSH
    * candidate generation + exact cosine verify. No label blocking, no
    * all-pairs: candidates are an equi-join on (band, bucket), so the
    * shuffle key bounds the work exactly like MinHash LSH.
    *
    * Amplification: a pair is a candidate iff it agrees on all
    * `rowsPerBand` sign bits of at least one band. For threshold `t`,
    * P(agree on one plane) = 1 - acos(t)/π; recall =
    * 1 - (1 - p^rowsPerBand)^bands. The defaults (2×12) give >99% recall
    * at cos ≥ 0.35 — chosen for this corpus's low-cosine regime; a
    * near-dup corpus (t ≥ 0.9) wants deeper bands (8×16) where LSH
    * prunes aggressively.
    */
  def embeddingCosineLsh(spark: SparkSession, dir: String,
                         threshold: Double = 0.35,
                         rowsPerBand: Int = 2, bands: Int = 12): DataFrame = {
    val e = embFrame(spark, dir)
    val banded = e.select(
      col("vec_id"),
      posexplode(call_function("graft_lsh_bands", col("v"),
        lit(rowsPerBand), lit(bands))).as(Seq("band", "bucket")))
    val cand = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
      .distinct()
    val side = e.select(col("vec_id"), col("v"), col("nrm"))
    cand
      .join(side.as("sa"), col("vec_a") === col("sa.vec_id"))
      .join(side.as("sb"), col("vec_b") === col("sb.vec_id"))
      .select(col("vec_a"), col("vec_b"),
        round(call_function("graft_dot", col("sa.v"), col("sb.v"))
          / (col("sa.nrm") * col("sb.nrm")), 6).as("cos"))
      .where(col("cos") >= threshold)
  }
}
