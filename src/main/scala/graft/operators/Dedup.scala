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

  /** The clone planting for [[exactIncremental]]'s demo entry — the
    * [[chunkDedup]] planted-boiler precedent at the document grain
    * (this synthetic corpus has zero exact-duplicate documents, so an
    * unplanted incremental run would never exercise the index hit):
    * a doc with `id % 100 == 90` re-delivers the text of `id − 50`
    * (an intra-delta duplicate pair under deltaMod 10 — both ids are
    * deltas, the source text is in neither base), and a doc with
    * `id % 7 == 3` re-delivers the text of `id − 3` (a base hit when
    * the clone lands in the delta). Missing sources fall back to the
    * doc's own text. Deterministic, so the oracle replants the
    * identical corpus.
    */
  private def plantedReDelivery(d: DataFrame): DataFrame = {
    val src = when(col("doc_id") % 100 === 90, col("doc_id") - 50)
      .when(col("doc_id") % 7 === 3, col("doc_id") - 3)
      .otherwise(lit(null).cast("long"))
    d.select(col("doc_id"), src.as("src"), col("text").as("own"))
      .join(d.select(col("doc_id").as("src"), col("text").as("src_text")),
        Seq("src"), "left")
      .select(col("doc_id"), coalesce(col("src_text"), col("own")).as("text"))
  }

  /** Persisted exact-fingerprint index for [[exactIncremental]]: the
    * distinct content hashes of the BASE corpus (`doc_id % deltaMod !=
    * 0`), written once under the content-fingerprint-keyed workDir —
    * the `ensureEmbBandIndex` caching contract at the exact-dedup
    * grain.
    */
  private def ensureExactIndex(spark: SparkSession, dir: String,
                               planted: DataFrame, deltaMod: Int): String = {
    import java.nio.file.{Files, Paths}
    val base = graft.Conf.resolveWorkDir(spark, "")
    val cfp = graft.tsdb.Ingest.contentFingerprint(s"$dir/documents.parquet")
    val path = s"$base/graft_exact_fp_index_v2_${deltaMod}_" +
      s"${Integer.toHexString(dir.hashCode)}_$cfp"
    val done = Paths.get(path, "_DONE")
    if (!Files.exists(done)) {
      planted
        .where(col("doc_id") % deltaMod =!= 0)
        .select(md5Fingerprint(col("text")).as("fp"))
        .distinct()
        .write.mode("overwrite").parquet(s"$path/fps")
      Files.createFile(done)
    }
    path
  }

  /** INCREMENTAL exact dedup — [[exact]]'s corpus-maintenance posture
    * (the 25k/25l contract at the cheapest grain): today's delta
    * (`doc_id % deltaMod == 0`) probes the PERSISTED base fingerprint
    * index instead of re-hashing the corpus, so the daily cost is
    * O(delta + index-probe), never O(corpus). Per delta doc:
    * `in_base` (its content already exists in the base) and `is_kept`
    * (novel AND the min-id keeper among delta docs sharing its
    * fingerprint — intra-delta duplicates dedup against each other the
    * same pass). Runs over the [[plantedReDelivery]] corpus so all
    * three regimes (base hit, intra-delta duplicate, novel) genuinely
    * occur — the planting is deterministic and oracle-mirrored.
    *
    * Scale shape: ONE delta scan + one hash-key equi-join against the
    * index (ids-only, shuffle-hash on the fingerprint — the index
    * never self-joins) + one delta-grain aggregate for the intra-delta
    * keepers. The index append after acceptance is the same
    * distinct-union the streamed exact dedup already proves.
    */
  def exactIncremental(spark: SparkSession, dir: String,
                       deltaMod: Int = 10): DataFrame = {
    val planted = plantedReDelivery(docs(spark, dir))
    val path = ensureExactIndex(spark, dir, planted, deltaMod)
    val baseFps = spark.read.parquet(s"$path/fps")
      .withColumn("in_base_raw", lit(true))
    val delta = planted
      .where(col("doc_id") % deltaMod === 0)
      .select(col("doc_id"), md5Fingerprint(col("text")).as("fp"))
    val keepers = delta.groupBy(col("fp")).agg(min(col("doc_id")).as("keeper"))
    delta
      .join(baseFps, Seq("fp"), "left")
      .join(keepers, Seq("fp"))
      .select(col("doc_id"),
        coalesce(col("in_base_raw"), lit(false)).as("in_base"),
        (coalesce(col("in_base_raw"), lit(false)) === false &&
          col("doc_id") === col("keeper")).as("is_kept"))
  }

  // --------------------------------------------------------------- shingles
  /** Distinct word 3-shingles (native kernel). */
  private val wordShingles = call_function("graft_word_shingles", col("text"))

  /** Distinct char 3-grams (native kernel). */
  private val charGrams = call_function("graft_char_grams", col("text"))

  /** Rounded exact Jaccard as one native kernel call (single hash-set
    * pass) — the `size(array_intersect(...))` formulation materializes
    * the intersection array per candidate pair and dominated the verify
    * stage at 100× corpus scale.
    */
  private def jaccard(a: Column, b: Column): Column =
    call_function("graft_jaccard", a, b)

  // ---------------------------------------------------- hot-bucket salting
  /** Self-join `banded` on `keyCols` (+ `idCol` ordering) with
    * HOT-BUCKET-TARGETED salting.
    *
    * Blanket salting (replicate the whole right side `salt`×) is a
    * trap this repo measured: it multiplies join volume for EVERY
    * bucket to fix a straggler in one, and the round-3 skew bench came
    * out 4× slower WITH the salt. Here only buckets holding ≥ `hotMin`
    * rows — found by one ids-only aggregate, then broadcast (hot keys
    * are by definition few) — get their left rows split across `salt`
    * sub-keys and their right rows replicated; every other bucket joins
    * exactly as unsalted. Pair multiset is identical in all cases: a
    * pair in a hot bucket meets at the left row's salt, a pair
    * elsewhere meets at salt 0. This is precisely AQE's skew-join
    * split done manually — kept because the candidate join is a
    * self-join of a generated frame whose skew AQE's size estimates
    * cannot see at planning time.
    */
  private[operators] def hotSaltedSelfJoin(banded: DataFrame,
                                           keyCols: Seq[String], idCol: String,
                                           salt: Int, hotMin: Long): DataFrame = {
    val keyEq = (a: String, b: String) =>
      keyCols.map(k => col(s"$a.$k") === col(s"$b.$k")).reduce(_ && _)
    // SHUFFLE-HASH, not sort-merge: banded rows are ids-only (~24 B)
    // and the join key is the band bucket, so the per-partition hash
    // build is small and cheap while SMJ pays TWO full sorts of the
    // banded volume (n × bands rows per side) for nothing — the
    // round-10 100× embedding leg measured 17.5 s SMJ vs 11.8 s SHJ
    // at equal (~8 GB) peak heap over identical 24.05M candidates.
    // The in-memory footprint argument is unchanged: SMJ buffers a
    // bucket's matching group per key, SHJ hashes the partition's
    // rows — both bounded by the same sized-banding invariant that
    // keeps bucket volume ∝ candPerRow.
    if (salt <= 1) {
      val h = banded.hint("shuffle_hash")
      h.as("a").join(h.as("b"),
        keyEq("a", "b") && col(s"a.$idCol") < col(s"b.$idCol"))
    } else {
      val hot = banded.groupBy(keyCols.map(col): _*)
        .agg(count(lit(1)).as("cnt")).where(col("cnt") >= hotMin)
        .select(keyCols.map(col) :+ lit(true).as("is_hot"): _*)
      val tagged = banded.join(broadcast(hot), keyCols, "left")
      val a = tagged.withColumn("salt",
        when(col("is_hot"), pmod(hash(col(idCol)), lit(salt))).otherwise(lit(0)))
      val b = tagged.withColumn("salt",
        explode(when(col("is_hot"), expr(s"sequence(0, ${salt - 1})"))
          .otherwise(array(lit(0)))))
      a.hint("shuffle_hash").as("a").join(b.hint("shuffle_hash").as("b"),
        keyEq("a", "b") && col("a.salt") === col("b.salt") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
    }
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
                 threshold: Double = 0.5, salt: Int = 1): DataFrame = {
    val d = parallelize(docs(spark, dir))
    // CENSUS-ROUTED (round 10): one fingerprint aggregate — the cheap
    // exact precursor of [[clusterSizeHist]]'s census — detects the
    // giant-boilerplate regime where the verify goes per-cluster-
    // quadratic (candidates ∝ Σ cluster²; the r9 100× leg's 22.6 s was
    // exactly this: exact-duplicate groups of ~4 from the generator's
    // 26-periodic rotation). Above the gate the query routes through
    // [[minhashLshCollapsed]]: the set-intersection kernel runs once
    // per DISTINCT-text pair and member pairs inherit the verdict —
    // identical output (spec-pinned), verify work divided by the
    // squared mean group size. Below the gate the census costs one
    // vocabulary-sized aggregate and the direct path runs unchanged.
    val maxGroup = maxExactGroup(d)
    if (maxGroup >= CollapseMinGroup)
      minhashLshCollapsed(d, numHashes, bands, threshold, salt)
    else
      minhashLshFrame(d, numHashes, bands, threshold, salt)
  }

  /** Exact-group census gate for [[minhashLsh]]: route through the
    * collapsed plan once any exact-duplicate group reaches this size.
    * At 3 the collapse already deletes ≥ 3× the kernel work of the
    * group's candidates while its own overhead is two id-only joins;
    * below it the direct path is never worse.
    */
  private[graft] val CollapseMinGroup = 3L

  /** The census [[minhashLsh]] routes on: the largest exact-duplicate
    * (identical-text) group in the frame — one fingerprint aggregate.
    * Exposed so the bench can record WHICH path the routed query takes
    * at each scale leg next to its wall (the r10 verdict's minhash
    * 100× adjudication gap).
    */
  private[graft] def maxExactGroup(d: DataFrame): Long =
    d.groupBy(md5Fingerprint(col("text")).as("fp"))
      .agg(count(lit(1)).as("c")).agg(max(col("c"))).head().getLong(0)

  /** [[maxExactGroup]] over the shipped corpus (bench hook). */
  def maxExactGroup(spark: SparkSession, dir: String): Long =
    maxExactGroup(parallelize(docs(spark, dir)))

  /** The routing census as its own GATED read — one row
    * `(max_group, n_groups, n_docs)` over [[exact]]'s fingerprint
    * groups: the number [[minhashLsh]] routes on (`max_group` vs
    * [[CollapseMinGroup]]), plus the group count and corpus size that
    * contextualize it. The observability face of the census the r10
    * verdict asked to see consumed: an operator whose plan choice
    * depends on a data property should let the user READ that
    * property through the same gate that checks the operator.
    */
  def exactCensus(spark: SparkSession, dir: String): DataFrame =
    exact(spark, dir).agg(
      max(col("n_docs")).as("max_group"),
      count(lit(1)).as("n_groups"),
      sum(col("n_docs")).as("n_docs"))

  /** [[minhashLshFrame]] with EXACT-DUPLICATE COLLAPSE — the
    * boilerplate-regime plan [[minhashLsh]]'s census routes to: docs
    * with identical text share one REPRESENTATIVE (min doc_id per text
    * fingerprint), LSH + verify run over representatives only, then
    * pairs expand back to members relationally:
    *
    *  - cross-group: every (member of A, member of B) pair inherits
    *    the representative pair's jaccard — texts are identical within
    *    a group, so the per-member kernel calls the direct path makes
    *    are literally re-computing the same number;
    *  - intra-group: members of one group pair with jaccard(s, s)
    *    evaluated ONCE per group (not per pair) — same kernel, same
    *    rounding, so parity holds even for degenerate shingle sets.
    *
    * The pair SET is identical to the direct path's (spec-pinned on a
    * planted giant cluster): identical texts ⇒ identical signatures ⇒
    * a member pair shares a band bucket iff its representative pair
    * does. Verify work drops from Σ(candidates over members) to
    * Σ(candidates over groups) — the r9 100× minhash leg's quadratic
    * term divided by the squared mean group size (~14× on the
    * 26-periodic generator corpus at 100×). All joins are id-only
    * equi-joins on rep/fp keys; the expansion's output volume equals
    * the direct path's output, which any formulation pays.
    */
  private[graft] def minhashLshCollapsed(docsDf: DataFrame,
                                         numHashes: Int = 32, bands: Int = 16,
                                         threshold: Double = 0.5,
                                         salt: Int = 1,
                                         broadcastVerify: Boolean = true,
                                         hotMin: Long = 128): DataFrame = {
    GraftFunctions.register(docsDf.sparkSession)
    val m = docsDf.select(col("doc_id"),
      md5Fingerprint(col("text")).as("fp"), col("text"))
    val reps = m.groupBy(col("fp"))
      .agg(min(col("doc_id")).as("rep"),
        count(lit(1)).as("group_size"))
    val members = m.select(col("doc_id"), col("fp"))
      .join(reps.select(col("fp"), col("rep")), "fp")
    val repDocs = m.join(reps.select(col("rep")),
      m("doc_id") === col("rep")).select(col("doc_id"), col("text"))
    val repPairs = minhashLshFrame(repDocs, numHashes, bands, threshold,
      salt, broadcastVerify, hotMin)
    val ma = members.select(col("doc_id").as("a_id"), col("rep").as("doc_a"))
    val mb = members.select(col("doc_id").as("b_id"), col("rep").as("doc_b"))
    val cross = repPairs.join(ma, "doc_a").join(mb, "doc_b")
      .select(least(col("a_id"), col("b_id")).as("doc_a"),
        greatest(col("a_id"), col("b_id")).as("doc_b"), col("jaccard"))
    // one jaccard(s, s) per multi-member group, inherited by its pairs
    val selfJ = minhashBase(repDocs, numHashes)
      .select(col("doc_id").as("rep"),
        jaccard(col("shingles"), col("shingles")).as("jaccard"))
    val intra = members.as("x").join(members.as("y"),
        col("x.fp") === col("y.fp") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        col("x.rep").as("rep"))
      .join(selfJ, "rep")
      .where(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
    cross.unionByName(intra)
  }

  /** [[minhashLsh]] over an arbitrary (doc_id, text) frame.
    *
    * `salt > 1` spreads each HOT band bucket (≥ `hotMin` rows) over
    * `salt` sub-keys via [[hotSaltedSelfJoin]]: identical pairs, but a
    * pathological duplicate cluster's O(c²) in-bucket pairs land on
    * `salt`× more reducers instead of one straggler task — while
    * ordinary buckets pay nothing.
    */
  def minhashLshFrame(docsDf: DataFrame,
                      numHashes: Int = 32, bands: Int = 16,
                      threshold: Double = 0.5, salt: Int = 1,
                      broadcastVerify: Boolean = true,
                      hotMin: Long = 128): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    require(salt >= 1, "salt must be >= 1")
    GraftFunctions.register(docsDf.sparkSession)
    val base = minhashBase(docsDf, numHashes)
    val cand = minhashCandFrame(docsDf, numHashes, bands, salt, hotMin)
    minhashVerify(base, cand, threshold, broadcastVerify)
  }

  /** The verify join over a candidate-pair frame. Joins must HASH,
    * never sort-merge: shingle-set rows are KBs each, and sorting the
    * candidate×shingles intermediate spills once the corpus outgrows
    * the auto-broadcast threshold. Default: broadcast the
    * (doc_id, shingles) side while the corpus fits executor memory;
    * `broadcastVerify = false` switches to shuffle-hash joins
    * (per-partition hash build on the fat side) for beyond-memory
    * corpora — same contract as [[embeddingCosineLshFrame]].
    */
  private def minhashVerify(base: DataFrame, cand: DataFrame,
                            threshold: Double,
                            broadcastVerify: Boolean): DataFrame =
    minhashVerifyScored(base, cand, broadcastVerify)
      .where(col("jaccard") >= threshold)

  /** The verify join WITHOUT the threshold cut — every candidate with
    * its exact Jaccard, so callers can count candidates and survivors
    * in one aggregate pass.
    */
  private def minhashVerifyScored(base: DataFrame, cand: DataFrame,
                                  broadcastVerify: Boolean): DataFrame = {
    val sh0 = base.select(col("doc_id"), col("shingles"))
    val sh = if (broadcastVerify) broadcast(sh0) else sh0.hint("shuffle_hash")
    cand
      .join(sh.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sh.as("sb"), col("doc_b") === col("sb.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        jaccard(col("sa.shingles"), col("sb.shingles")).as("jaccard"))
  }

  /** Verification of a deterministic 1-in-`sampleMod` hash-sample of
    * the minhash candidate stream — the MEASURED bound for corpora
    * whose full verify is workload-quadratic (true-dup clusters make
    * candidates ∝ Σ cluster², and each candidate's set-intersection is
    * what the 100× timed leg cannot afford). Per-candidate verify cost
    * is i.i.d. across the xxhash64 sample, so
    * `total ≈ sample_sec × sampleMod` is an unbiased estimate of the
    * full verify wall — the number the bench records next to the full
    * candidate count, replacing a leg that would otherwise be a silent
    * skip. The sample is by PAIR hash, not by document, so hot
    * clusters are sampled proportionally to their candidate volume.
    */
  def minhashSampledVerify(docsDf: DataFrame, sampleMod: Int = 16,
                           numHashes: Int = 32, bands: Int = 16,
                           threshold: Double = 0.5, salt: Int = 1,
                           hotMin: Long = 128,
                           broadcastVerify: Boolean = true): DataFrame = {
    require(sampleMod >= 1, "sampleMod must be >= 1")
    GraftFunctions.register(docsDf.sparkSession)
    val base = minhashBase(docsDf, numHashes)
    val cand = minhashCandFrame(docsDf, numHashes, bands, salt, hotMin)
      .where(pmod(xxhash64(col("doc_a"), col("doc_b")), lit(sampleMod)) === 0)
    minhashVerify(base, cand, threshold, broadcastVerify)
  }

  /** The candidate stream over the shipped corpus (bench hook). */
  def minhashCandidates(spark: SparkSession, dir: String): DataFrame =
    minhashCandFrame(parallelize(docs(spark, dir)))

  /** One-action (sampled, verified) counts for a 1-in-`sampleMod`
    * pair-hash sample of the candidate stream: the verify join runs
    * WITHOUT the threshold cut and both counts come from a single
    * aggregate, so the measured wall is exactly "candidate generation
    * + sampled verify".
    */
  def minhashSampleVerifyStats(spark: SparkSession, dir: String,
                               sampleMod: Int,
                               threshold: Double = 0.5,
                               broadcastVerify: Boolean = true): (Long, Long) = {
    val cand = minhashCandFrame(parallelize(docs(spark, dir)))
    minhashSampleVerifyStatsFrames(minhashShingleBase(spark, dir), cand,
      sampleMod, threshold, broadcastVerify)
  }

  /** The (doc_id, shingles) side of the verify join, exposed so a
    * benchmark can materialize it once and time the join phase alone.
    */
  def minhashShingleBase(spark: SparkSession, dir: String): DataFrame =
    minhashBase(parallelize(docs(spark, dir)), 32)
      .select(col("doc_id"), col("shingles"))

  /** [[minhashSampleVerifyStats]] over pre-materialized base and
    * candidate frames — the sampled verify JOIN timed alone, with the
    * one-time shingle computation and candidate generation measured as
    * their own walls (no differencing of noisy measurements, and no
    * one-time cost leaking into the ×mod extrapolation).
    */
  def minhashSampleVerifyStatsFrames(base: DataFrame, cand: DataFrame,
                                     sampleMod: Int,
                                     threshold: Double = 0.5,
                                     broadcastVerify: Boolean = true): (Long, Long) = {
    // the sampled bound is PRECISELY the methodology for corpora whose
    // full verify is unaffordable — the same beyond-memory regime where
    // broadcasting the whole (doc_id, shingles) map can OOM executors,
    // so the bound path honors the broadcastVerify escape hatch like
    // every other verify join
    GraftFunctions.register(base.sparkSession)
    val sample = cand
      .where(pmod(xxhash64(col("doc_a"), col("doc_b")), lit(sampleMod)) === 0)
    val r = minhashVerifyScored(base, sample, broadcastVerify)
      .agg(count(lit(1)).as("sampled"),
        sum(when(col("jaccard") >= threshold, 1L).otherwise(0L)).as("verified"))
      .collect()(0)
    (r.getLong(0), Option(r.get(1)).map(_.asInstanceOf[Long]).getOrElse(0L))
  }

  /** MinHash CALIBRATION — the signature-length sanity check an LSH
    * deployment runs before trusting its banding math: for every
    * verified near-dup pair, the signature-agreement ESTIMATE of
    * Jaccard (`matching positions / numHashes` — the estimator whose
    * expectation IS the Jaccard) next to the exact shingle Jaccard the
    * verify already computed, plus the |err| ≤ `band` boolean (4σ at
    * 32 hashes). The estimate is integer position-matching in one
    * in-row `zip_with`/`aggregate` chain — exact until one division.
    *
    * The oracle re-derives the TRUE jaccard INDEPENDENTLY in SQL over
    * the same word-3-shingle sets (list_slice windows), so the gate
    * additionally proves the native shingle/jaccard kernels match the
    * relational formulation — est and the band boolean ride the pinned
    * golden. The calibration CLAIM (estimates track truth) is
    * spec-asserted: mean |err| within the binomial bound, band
    * violations rare.
    */
  def minhashCalibration(spark: SparkSession, dir: String,
                         numHashes: Int = 32, bands: Int = 16,
                         threshold: Double = 0.5,
                         band: Double = 0.35): DataFrame = {
    val d = parallelize(docs(spark, dir))
    val pairs = minhashLsh(spark, dir, numHashes, bands, threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
    val sigs = minhashBase(d, numHashes).select(col("doc_id"), col("sig"))
    pairs
      .join(sigs.select(col("doc_id").as("doc_a"), col("sig").as("sa")), "doc_a")
      .join(sigs.select(col("doc_id").as("doc_b"), col("sig").as("sb")), "doc_b")
      .select(col("doc_a"), col("doc_b"), col("jaccard"),
        round(expr(
          """aggregate(zip_with(sa, sb, (x, y) -> IF(x = y, 1, 0)),
            |0, (acc, v) -> acc + v)""".stripMargin).cast("double")
          / numHashes, 6).as("jaccard_est"))
      .withColumn("within_band",
        abs(col("jaccard_est") - col("jaccard")) <= band)
  }

  private def minhashBase(docsDf: DataFrame, numHashes: Int): DataFrame =
    docsDf
      .select(col("doc_id"), wordShingles.as("shingles"))
      .withColumn("sig", call_function("graft_minhash_sig", col("shingles"), lit(numHashes)))

  /** The banded signature rows `(doc_id, band, band_hash)` — the LSH
    * index representation: one row per (doc, band), band key = hash of
    * the band's signature slice. Deterministic per document, so a
    * persisted copy ([[ensureBandIndex]]) and a fresh computation
    * bucket identically — the property incremental probing rests on.
    */
  private[graft] def bandFrame(docsDf: DataFrame, numHashes: Int,
                               bands: Int): DataFrame = {
    GraftFunctions.register(docsDf.sparkSession)
    val rowsPerBand = numHashes / bands
    minhashBase(docsDf, numHashes).select(
      col("doc_id"),
      posexplode(expr(
        s"transform(sequence(0, ${bands - 1}), j -> hash(slice(sig, j*$rowsPerBand + 1, $rowsPerBand)))"))
        .as(Seq("band", "band_hash")))
  }

  /** [[minhashLshFrame]]'s candidate pairs BEFORE verification —
    * exposed so the benchmark can record candidate volume next to the
    * timed runs (the quantity that explains scale ratios on dup-heavy
    * corpora: true-dup clusters make candidates ∝ Σ cluster², which is
    * workload, not plan).
    */
  private[graft] def minhashCandFrame(docsDf: DataFrame,
                                      numHashes: Int = 32, bands: Int = 16,
                                      salt: Int = 1, hotMin: Long = 128): DataFrame = {
    GraftFunctions.register(docsDf.sparkSession)
    require(numHashes % bands == 0, "bands must divide numHashes")
    val banded = bandFrame(docsDf, numHashes, bands)
    // distinct first (multi-band matches), then re-spread: the pair
    // stream is ~16 bytes/row but costs a full set-intersection each in
    // the verify — AQE's BYTE-based coalescing shrinks it to a
    // handful of partitions (measured: 3 tasks carrying the whole
    // verify at 10×, flat max≈median — serialized, not skewed) and
    // byte-cheap/CPU-heavy stages must pin their parallelism explicitly
    hotSaltedSelfJoin(banded, Seq("band", "band_hash"), "doc_id",
      salt, hotMin)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
      .repartition(docsDf.sparkSession.sparkContext.defaultParallelism)
  }

  /** Materialize the persisted LSH band index for `dir`'s INDEX docs
    * (`doc_id % deltaMod != 0` — the corpus already deduped by prior
    * runs): `(doc_id, band, band_hash)` parquet under the workDir,
    * content-fingerprint-keyed like every `ensure*` layout. At 100 TB
    * this is the index a daily delta probes — built once per corpus
    * version, never re-banded per run.
    */
  private[graft] def ensureBandIndex(spark: SparkSession, dir: String,
                                     numHashes: Int = 32, bands: Int = 16,
                                     deltaMod: Int = 10): String = {
    val fp = graft.tsdb.Ingest.contentFingerprint(s"$dir/documents.parquet")
    val root = graft.Conf.resolveWorkDir(spark, "")
    val path = s"$root/mh_bands_${Integer.toHexString(dir.hashCode)}_" +
      s"${fp}_h${numHashes}_b${bands}_m$deltaMod"
    if (!java.nio.file.Files.exists(
        java.nio.file.Paths.get(path, "_SUCCESS"))) {
      bandFrame(
        parallelize(docs(spark, dir)).where(col("doc_id") % deltaMod =!= 0),
        numHashes, bands)
        .write.mode("overwrite").parquet(path)
    }
    path
  }

  /** INCREMENTAL MinHash-LSH dedup — the corpus-maintenance posture: a
    * new shard (here `doc_id % deltaMod == 0`, the driver-data stand-in
    * for today's crawl) arrives against an already-deduped corpus, so
    * the only pairs anyone needs are DELTA-involving — delta×index and
    * delta×delta. The index side is the PERSISTED band layout
    * ([[ensureBandIndex]]): banding is deterministic per document, so
    * persisted and fresh bands bucket identically, and the probe is one
    * equi-join of the (tiny) delta bands against the index scan — the
    * index NEVER self-joins. That deletes the quadratic term a full
    * re-run pays: candidate work drops from O((n+d)²/2^bandbits) to
    * O(n·d/2^bandbits + d²/2^bandbits), which at a daily d ≪ n is the
    * difference between re-deduping 100 TB and probing it.
    *
    * Verify is the standard shingle-set kernel over the candidate ids
    * (broadcast / shuffle-hash gated like [[minhashLshFrame]]); the
    * shingle side is scanned fresh (projection-pruned), which a full
    * run pays too. Contract: the pair set equals the FULL run's pairs
    * restricted to delta-involving rows (spec-pinned) — same kernel,
    * same jaccard, same banding.
    */
  def minhashIncremental(spark: SparkSession, dir: String,
                         numHashes: Int = 32, bands: Int = 16,
                         threshold: Double = 0.5, deltaMod: Int = 10,
                         broadcastVerify: Boolean = true): DataFrame = {
    val d = parallelize(docs(spark, dir))
    val idxBands = spark.read.parquet(
      ensureBandIndex(spark, dir, numHashes, bands, deltaMod))
    minhashIncrementalFrame(d, idxBands, numHashes, bands, threshold,
      deltaMod, broadcastVerify)
  }

  /** [[minhashIncremental]] over caller-supplied corpus and index-band
    * frames (the persisted layout, or a fresh banding in specs).
    */
  private[graft] def minhashIncrementalFrame(d: DataFrame,
                                             idxBands: DataFrame,
                                             numHashes: Int, bands: Int,
                                             threshold: Double, deltaMod: Int,
                                             broadcastVerify: Boolean): DataFrame = {
    val spark = d.sparkSession
    val delta = d.where(col("doc_id") % deltaMod === 0)
    val deltaBands = bandFrame(delta, numHashes, bands)
    // the probe: delta bands against the index layout scan — an
    // equi-join on the band key, shuffle-hash (ids-only rows; the
    // hotSaltedSelfJoin SMJ argument applies verbatim)
    val cross = deltaBands.as("a").hint("shuffle_hash")
      .join(idxBands.as("b"),
        col("a.band") === col("b.band") &&
          col("a.band_hash") === col("b.band_hash"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
    // delta×delta: the standard salted self-join over the new shard
    val intra = hotSaltedSelfJoin(deltaBands, Seq("band", "band_hash"),
        "doc_id", 1, 128)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
    // cache the candidate ids once: they feed BOTH the verify join and
    // the involved-docs restriction below. persist, NOT localCheckpoint
    // — a checkpoint's LogicalRDD re-enters downstream zipped codegen
    // stages with its frozen partition count and trips "Can't zip RDDs
    // with unequal numbers of partitions" under AQE (measured in-spec);
    // persist keeps the plan and dedups the banding work the same way
    val cand = cross.unionByName(intra)
      .select(least(col("doc_a"), col("doc_b")).as("doc_a"),
        greatest(col("doc_a"), col("doc_b")).as("doc_b"))
      .distinct()
      .repartition(spark.sparkContext.defaultParallelism)
      .persist()
    // shingle ONLY candidate-involved docs: the full path pays the
    // kernel over the whole corpus because ~every doc appears in some
    // candidate; here involved ≈ delta + its matches ≪ n, so the
    // verify side shrinks with the delta, not the corpus
    val ids = cand.select(col("doc_a").as("doc_id"))
      .unionByName(cand.select(col("doc_b").as("doc_id"))).distinct()
    val involved = d.join(ids, Seq("doc_id"), "left_semi")
    minhashVerify(minhashBase(involved, numHashes), cand, threshold,
      broadcastVerify)
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
  def simhashPairs(spark: SparkSession, dir: String, hamMax: Int = 3): DataFrame =
    simhashPairsFrame(docs(spark, dir), hamMax)

  /** [[simhashPairs]] over an arbitrary (doc_id, text) frame. Verify
    * cost is a single `bit_count` per candidate — constant per pair,
    * unlike shingle-set intersection — which is what lets the
    * end-to-end composition ([[pipelineSimhash]]) scale through
    * corpora whose true-dup clusters make set-verification quadratic.
    *
    * CENSUS-ROUTED + CORPUS-SIZED (round 12, the r11 verdict's one
    * remaining superlinear plan): one hash-group aggregate over the
    * (cheap, shuffle-light — 16 bytes/row) simhash projection decides
    * both plan knobs —
    *
    *  - ≥ [[WideBandMinHashes]] distinct hashes switch the banding to
    *    the 10 × ~26-bit two-sub-band keys (see [[bandedHashFrame]]),
    *    killing the 16-bit buckets' density term that grew candidates
    *    597× for 100× data in the r11 `lsh_counts` record. Under wide
    *    keys the member-level candidate set is ≈ the TRUE pair set
    *    (identical-hash members of near-dup representatives are all
    *    true pairs, which any correct emitter pays as OUTPUT) plus a
    *    vanishing 2^-26-bucket collision term — i.e. candidates track
    *    output, the optimal shape;
    *  - identical-HASH groups ≥ [[SimhashCollapseMinGroup]] route
    *    through [[simhashPairsCollapsed]]. NOTE the gate is 1024, not
    *    minhash's 3: SimHash verify is ONE `bit_count` per candidate,
    *    so the collapse saves no kernel work (the minhash rationale) —
    *    its value here is SKEW protection: a boilerplate group of c
    *    identical hashes lands c banded rows in the SAME band bucket
    *    and the self-join emits c² rows inside one shuffle bucket/task,
    *    where the collapsed route emits the same rows through an
    *    AQE-splittable rep-key expansion join. Measured at 100×
    *    (groups ≤ 12): direct-wide ~3 s vs collapsed ~6.8 s — the
    *    collapse's extra joins cost more than they save until groups
    *    reach the hot-bucket regime.
    *
    * Every route is a complete candidate generator for hamMax ≤ 3, so
    * the verified output is the exact Hamming-≤-hamMax pair set
    * regardless of route (spec-pinned on a planted giant cluster,
    * classic × wide × collapsed × direct). hamMax > 3 keeps the
    * classic banding — the wide pigeonhole needs ≤ 3 dirty sub-bands —
    * and collapse stays exact at any hamMax (identical hashes band
    * identically under every scheme).
    */
  def simhashPairsFrame(docsDf: DataFrame, hamMax: Int = 3): DataFrame = {
    val hashed = simhashFrame(docsDf)
    val (maxGroup, _, nDistinct) = simhashCensus(hashed)
    val wide = hamMax <= 3 && nDistinct >= WideBandMinHashes
    if (maxGroup >= SimhashCollapseMinGroup)
      simhashPairsCollapsed(hashed, hamMax, wide)
    else
      hammingCandFrame(hashed, "doc_id", "simhash", wide)
        .where(col("hamming") <= hamMax)
  }

  /** Identical-hash-group gate for [[simhashPairsCollapsed]] — the
    * HOT-BUCKET threshold, not a verify-cost threshold (see
    * [[simhashPairsFrame]]: simhash verify is constant-cost, so the
    * collapse pays off only when a group's c² in-bucket join rows
    * would form a straggler task; 1024² = ~1M rows in one bucket is
    * the same order [[hotSaltedSelfJoin]]'s `hotMin = 128` targets at
    * its 16-row banding multiplier).
    */
  private[graft] val SimhashCollapseMinGroup = 1024L

  /** The (doc_id, simhash) projection — one native kernel call per
    * row, one scan, no shuffle; cheap enough that census and plan
    * recompute it rather than pin a corpus-sized cache (the
    * [[minhashLsh]] precedent).
    */
  private[graft] def simhashFrame(docsDf: DataFrame): DataFrame = {
    GraftFunctions.register(docsDf.sparkSession)
    docsDf.select(
      col("doc_id"),
      call_function("graft_simhash", split(col("text"), " ")).as("simhash"))
  }

  /** Distinct-hash threshold for the wide banding: below it the 16-bit
    * buckets' incidental-collision term is ≤ ~n²·4/2^17 ≈ a few
    * thousand pairs and the classic plan's 4-rows-per-doc banding is
    * never worse; above it the density term starts dominating true
    * pairs (at 50k distinct hashes it is already ~10× the corpus
    * size). The sf0.1 base corpus (5k docs) stays classic; the 10×/
    * 100× legs go wide.
    */
  private[graft] val WideBandMinHashes = 20000L

  /** The routing census: `(max identical-hash group, n rows, n
    * distinct hashes)` in ONE aggregate over the hash projection —
    * what [[simhashPairsFrame]] routes on, exposed so the bench can
    * record WHICH plan ran next to its wall.
    */
  private[graft] def simhashCensus(hashed: DataFrame): (Long, Long, Long) = {
    val r = hashed.groupBy(col("simhash")).agg(count(lit(1)).as("c"))
      .agg(max(col("c")), sum(col("c")), count(lit(1))).head()
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  /** [[simhashPairsFrame]] with IDENTICAL-HASH COLLAPSE — the
    * giant-boilerplate-group plan (the [[minhashLshCollapsed]] recipe
    * at the 64-bit-hash grain, where it is *simpler*: Hamming distance
    * depends only on the hash values, so collapsing on the hash is
    * exact by construction, no per-group re-verify needed; and where
    * its JOB is different — skew protection for the band-bucket
    * self-join, not verify savings, see [[simhashPairsFrame]]):
    *
    *  - banding + `bit_count` verify run over one REPRESENTATIVE per
    *    distinct hash (min doc_id);
    *  - cross-group: every (member of A, member of B) pair inherits
    *    the representative pair's hamming — hashes are equal within a
    *    group, so `bit_count(h_a ^ h_b)` is literally the same number;
    *  - intra-group: members of one group pair at hamming 0, which
    *    passes any hamMax ≥ 0 — emitted relationally, no kernel work.
    *
    * Pair-set identity with the direct path holds for hamMax ≤ 3
    * (both are complete generators, so both emit exactly the true
    * Hamming-≤-hamMax set) AND for any hamMax with matching banding
    * (identical hashes ⇒ identical band keys ⇒ a member pair shares a
    * band iff its representative pair does). Candidate volume drops
    * from Σ(member-level bucket pairs) to Σ(distinct-hash bucket
    * pairs) — the r11 597× growth divided by the squared mean
    * replica-group size; output volume equals the direct path's,
    * which any correct formulation pays.
    */
  private[graft] def simhashPairsCollapsed(hashed: DataFrame, hamMax: Int,
                                           wide: Boolean): DataFrame = {
    val groups = hashed.groupBy(col("simhash"))
      .agg(min(col("doc_id")).as("rep"))
    val members = hashed.join(groups, "simhash")
    val reps = groups.select(col("rep").as("doc_id"), col("simhash"))
    val repPairs = hammingCandFrame(reps, "doc_id", "simhash", wide)
      .where(col("hamming") <= hamMax)
    val ma = members.select(col("doc_id").as("a_id"), col("rep").as("doc_a"))
    val mb = members.select(col("doc_id").as("b_id"), col("rep").as("doc_b"))
    val cross = repPairs.join(ma, "doc_a").join(mb, "doc_b")
      .select(least(col("a_id"), col("b_id")).as("doc_a"),
        greatest(col("a_id"), col("b_id")).as("doc_b"), col("hamming"))
    val intra = members.as("x").join(members.as("y"),
        col("x.simhash") === col("y.simhash") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        lit(0).as("hamming"))
    cross.unionByName(intra)
  }

  /** [[simhashPairsFrame]]'s distinct band-sharing candidates (with
    * their Hamming distance) BEFORE the `hamMax` threshold — the
    * DIRECT (uncollapsed) generator, exposed for benchmark
    * candidate-volume evidence like [[minhashCandFrame]].
    */
  private[graft] def simhashCandFrame(docsDf: DataFrame,
                                      wide: Boolean = false): DataFrame =
    hammingCandFrame(simhashFrame(docsDf), "doc_id", "simhash", wide)

  /** The simhash routing census as its own GATED read — one row
    * `(max_group, n_groups, n_docs)` over identical-SIMHASH groups:
    * the numbers [[simhashPairsFrame]] routes on (`max_group` vs
    * [[CollapseMinGroup]] for the collapse, `n_groups` vs
    * [[WideBandMinHashes]] for the banding width), in the
    * [[exactCensus]] observability contract: an operator whose plan
    * choice depends on a data property lets the user READ that
    * property through the same gate that checks the operator.
    */
  def simhashCensusRead(spark: SparkSession, dir: String): DataFrame =
    simhashFrame(docs(spark, dir))
      .groupBy(col("simhash")).agg(count(lit(1)).as("c"))
      .agg(max(col("c")).as("max_group"), count(lit(1)).as("n_groups"),
        sum(col("c")).as("n_docs"))

  /** The band rows of an (id, 64-bit hash) frame — the banding both
    * sides of every Hamming join share. Two CORPUS-SIZED schemes, both
    * complete candidate generators for Hamming ≤ 3:
    *
    *  - `wide = false` (small corpora): 4 contiguous 16-bit bands.
    *    Pigeonhole: ≤ 3 differing bits dirty ≤ 3 of the 4 bands, so a
    *    true pair agrees exactly on ≥ 1 band. 4 band rows per row,
    *    2^16 buckets per band — dense once the corpus outgrows ~10^4
    *    distinct hashes (the r11 597×-growth defect).
    *  - `wide = true` (large corpora): 5 sub-bands (4 × 13 bits +
    *    1 × 12 bits) keyed PAIRWISE — ≤ 3 differing bits dirty ≤ 3 of
    *    the 5 sub-bands, so ≥ 2 stay clean and the pair agrees exactly
    *    on at least one of the C(5,2) = 10 two-sub-band keys. 10 band
    *    rows per row (2.5× the banding volume) but 2^25-26 buckets per
    *    key: the incidental-collision candidate term drops by ~three
    *    orders of magnitude, which is what keeps candidate growth
    *    ~linear as the corpus scales (the verify itself is unchanged —
    *    one `bit_count` per candidate either way).
    *
    * The wide scheme's pigeonhole needs ≥ 2 clean sub-bands, which
    * holds only for hamMax ≤ 3 — callers gate on that.
    */
  private def bandedHashFrame(hashed: DataFrame, idCol: String,
                              hashCol: String,
                              wide: Boolean = false): DataFrame =
    if (!wide)
      hashed.select(
        col(idCol).as("_id"), col(hashCol).as("_h"),
        posexplode(expr(
          s"transform(sequence(0, 3), j -> (shiftright($hashCol, j*16) & 65535))"))
          .as(Seq("band", "band_val")))
    else {
      // sub-band j of 5: bits [13j, 13j+13) for j<4, bits [52, 64) for
      // j=4; arithmetic shiftright's sign-fill is masked off. Key for
      // the (i, j) combo packs sub-band i above sub-band j (j's width
      // ≤ 13 bits, so `* 8192` cannot collide across distinct values).
      val sub = (0 to 4).map {
        case 4 => s"(shiftright($hashCol, 52) & 4095)"
        case j => s"(shiftright($hashCol, ${j * 13}) & 8191)"
      }
      val keys = for { i <- 0 until 5; j <- i + 1 until 5 }
        yield s"(${sub(i)} * 8192 + ${sub(j)})"
      hashed.select(
        col(idCol).as("_id"), col(hashCol).as("_h"),
        posexplode(expr(s"array(${keys.mkString(",")})"))
          .as(Seq("band", "band_val")))
    }

  /** Persisted SimHash index of the base corpus (`doc_id % deltaMod
    * != 0`) — (doc_id, simhash) rows under the content-fingerprint-
    * keyed workDir, the [[ensureBandIndex]] recipe at the 64-bit-hash
    * grain (the whole index row is 16 bytes; banding re-derives
    * deterministically at probe time).
    */
  private[graft] def ensureSimhashIndex(spark: SparkSession, dir: String,
                                        deltaMod: Int = 10): String = {
    val fp = graft.tsdb.Ingest.contentFingerprint(s"$dir/documents.parquet")
    val root = graft.Conf.resolveWorkDir(spark, "")
    val path = s"$root/sh_index_${Integer.toHexString(dir.hashCode)}_" +
      s"${fp}_m$deltaMod"
    if (!java.nio.file.Files.exists(
        java.nio.file.Paths.get(path, "_SUCCESS"))) {
      GraftFunctions.register(spark)
      parallelize(docs(spark, dir)).where(col("doc_id") % deltaMod =!= 0)
        .select(col("doc_id"),
          call_function("graft_simhash", split(col("text"), " ")).as("simhash"))
        .write.mode("overwrite").parquet(path)
    }
    path
  }

  /** INCREMENTAL SimHash dedup — the fourth member of the
    * incremental-maintenance family (exact 25n / minhash 25k /
    * embedding 25l / now simhash): the delta (`doc_id % deltaMod ==
    * 0`) probes the PERSISTED base hash index, so the only pairs
    * computed are DELTA-involving — delta×index through the banded
    * equi-join (the index never self-joins) plus delta×delta through
    * the standard banded self-join. Verify stays one `bit_count` per
    * candidate (SimHash's constant-cost advantage, unchanged
    * incrementally). Pigeonhole completeness carries over verbatim:
    * ≤ 3 differing bits dirty ≤ 3 of the 4 bands on ANY pair,
    * whichever side is persisted.
    */
  def simhashIncremental(spark: SparkSession, dir: String,
                         hamMax: Int = 3, deltaMod: Int = 10): DataFrame = {
    GraftFunctions.register(spark)
    val idx = spark.read.parquet(ensureSimhashIndex(spark, dir, deltaMod))
    val delta = parallelize(docs(spark, dir))
      .where(col("doc_id") % deltaMod === 0)
      .select(col("doc_id"),
        call_function("graft_simhash", split(col("text"), " ")).as("simhash"))
    // the probe joins band both sides with the SAME corpus-sized
    // scheme (completeness needs matching keys); size on the index —
    // the corpus-proportional side whose bucket density is the risk
    val wide = hamMax <= 3 && idx.count() >= WideBandMinHashes
    val bd = bandedHashFrame(delta, "doc_id", "simhash", wide)
    val bi = bandedHashFrame(idx, "doc_id", "simhash", wide)
    val cross = bd.as("a").hint("shuffle_hash")
      .join(bi.as("b"),
        col("a.band") === col("b.band") &&
          col("a.band_val") === col("b.band_val"))
      .select(least(col("a._id"), col("b._id")).as("doc_a"),
        greatest(col("a._id"), col("b._id")).as("doc_b"),
        expr("bit_count(a._h ^ b._h)").as("hamming"))
      .distinct()
    val intra = hammingCandFrame(delta, "doc_id", "simhash", wide)
    cross.unionByName(intra).where(col("hamming") <= hamMax).distinct()
  }

  /** Banded Hamming candidates over ANY (id, 64-bit hash) frame — the
    * fingerprint-agnostic core [[simhashCandFrame]] and
    * [[Multimodal.phashPairs]] share: band-key equality under either
    * [[bandedHashFrame]] scheme (classic 4 × 16-bit, or `wide`'s
    * 10 × two-sub-band keys for large corpora) is a COMPLETE candidate
    * generator for Hamming ≤ 3, and verify cost is one `bit_count` per
    * candidate. Output: (doc_a, doc_b, hamming) over `idCol`'s values.
    */
  private[graft] def hammingCandFrame(hashed: DataFrame, idCol: String,
                                          hashCol: String,
                                          wide: Boolean = false): DataFrame = {
    val banded = bandedHashFrame(hashed, idCol, hashCol, wide)
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.band_val") === col("b.band_val") &&
          col("a._id") < col("b._id"))
      .select(col("a._id").as("doc_a"), col("b._id").as("doc_b"),
        expr("bit_count(a._h ^ b._h)").as("hamming"))
      .distinct()
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
                   threshold: Double = 0.3): DataFrame =
    ngramJaccardFrame(parallelize(docs(spark, dir)), threshold)

  /** [[ngramJaccard]] over an arbitrary `(doc_id, text)` frame. */
  def ngramJaccardFrame(d: DataFrame, threshold: Double = 0.3): DataFrame = {
    GraftFunctions.register(d.sparkSession)
    val g = d.select(
      col("doc_id"), substring(col("text"), 1, 16).as("blk"), charGrams.as("grams"))
    g.as("a")
      .join(g.as("b"),
        col("a.blk") === col("b.blk") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        jaccard(col("a.grams"), col("b.grams")).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  // ------------------------------------------------------------ containment
  /** Asymmetric shingle-containment pairs — the doc-in-doc detector
    * exact/Jaccard dedup misses: a short document quoted wholesale
    * inside a long one has low Jaccard (the union is large) but
    * containment `|A∩B| / min(|A|,|B|)` ≈ 1. The standard
    * quote/boilerplate-inclusion and train-test leakage measure
    * (CCNet/Dolma-style suffix-containment family).
    *
    * Scale shape: a POSTING-LIST self-join, not blocking — explode
    * distinct word shingles, cut grams whose document frequency
    * exceeds `maxDf` (stop-grams carry no discriminative signal and
    * would square the join: per-gram pair cost is bounded by maxDf²),
    * join postings on gram equality, count shared grams per pair, then
    * one join back to per-doc gram counts. Everything is hash
    * aggregates + equi-joins on the gram key — no cartesian, no
    * driver-side state; the df cut is the documented coverage bound
    * (pairs sharing ONLY ubiquitous grams are not reported). Sizes and
    * the containment denominator are over the post-cut gram sets, so
    * the score is self-consistent with the discovered intersection.
    * The threshold compares the ROUNDED score (boundary-stable across
    * engines, the filter_chain convention).
    */
  def containment(spark: SparkSession, dir: String,
                  threshold: Double = 0.5, maxDf: Long = 20): DataFrame = {
    val g0 = parallelize(docs(spark, dir))
      .select(col("doc_id"), explode(wordShingles).as("gram"))
    val rare = g0.groupBy(col("gram"))
      .agg(count(lit(1)).as("df")).where(col("df") <= maxDf)
      .select(col("gram"))
    val g = g0.join(rare, "gram")
    val sizes = g.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val shared = g.as("a")
      .join(g.as("b"),
        col("a.gram") === col("b.gram") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
    shared
      .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
      .select(col("doc_a"), col("doc_b"), col("n_shared"),
        round(col("n_shared").cast("double")
          / least(col("na"), col("nb")).cast("double"), 6).as("containment"))
      .where(col("containment") >= threshold)
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
                      threshold: Double = 0.35): DataFrame =
    embeddingCosineFrame(embFrame(spark, dir), threshold)

  /** [[embeddingCosine]] over an arbitrary (vec_id, label, v, nrm)
    * frame — the exhaustive ground truth the LSH specs compare against.
    */
  def embeddingCosineFrame(e: DataFrame, threshold: Double): DataFrame =
    // broadcast self-join: pair generation + dot + filter all stream in
    // the probe side's map tasks — full parallelism regardless of how
    // few labels there are, zero shuffle of the O(n²/labels) pair
    // stream (a repartition here would shuffle every generated pair
    // WITH both vectors — gigabytes at 10× — to fix a parallelism
    // problem the broadcast join doesn't have). Broadcasting the corpus
    // is fine precisely because this exhaustive variant is the
    // small-scale correctness oracle; the corpus-scale path is
    // [[embeddingCosineLsh]].
    e.as("a")
      .join(broadcast(e.as("b")),
        col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        round(call_function("graft_dot", col("a.v"), col("b.v"))
          / (col("a.nrm") * col("b.nrm")), 6).as("cos"))
      .where(col("cos") >= threshold)

  /** Threshold-aware banding: the (rowsPerBand, bands) pair that holds
    * `P(candidate | cos = threshold) ≥ targetRecall` with the deepest
    * bands that fit the plane budget.
    *
    * Amplification: a pair is a candidate iff it agrees on all
    * `rowsPerBand` sign bits of at least one band; with
    * p = 1 - acos(t)/π per plane, recall = 1 - (1 - p^b)^n. Deeper
    * bands (larger b) prune harder — a random pair passes a band with
    * probability 2^-b — but need more bands n for the same recall, so
    * the plan takes the largest b whose n·b stays within `maxPlanes`.
    *
    * Sign-LSH is selective only when the threshold is well above
    * random: below t ≈ 0.6 even the planned bands admit most pairs
    * (p is too close to ½ for any depth to separate), which is
    * inherent to the family, not a parameter choice — use the
    * exhaustive [[embeddingCosine]] there, or raise the threshold.
    * If no depth fits the budget, the plan degrades to (1, maxPlanes)
    * — the max-recall shape the budget allows.
    */
  def lshPlan(threshold: Double, targetRecall: Double = 0.98,
              maxPlanes: Int = 192): (Int, Int) = {
    require(threshold > 0 && threshold < 1, "threshold must be in (0,1)")
    require(targetRecall > 0 && targetRecall < 1, "targetRecall must be in (0,1)")
    val p = 1.0 - math.acos(threshold) / math.Pi
    var b = math.min(63, maxPlanes)
    while (b >= 1) {
      val pb = math.pow(p, b)
      if (pb > 0) {
        val n = math.ceil(math.log(1.0 - targetRecall) / math.log1p(-pb)).toInt
        if (n >= 1 && n.toLong * b <= maxPlanes) return (b, n)
      }
      b -= 1
    }
    (1, maxPlanes)
  }

  /** Corpus-sized banding plan: the shallowest depth `b` whose expected
    * random-pair candidate volume stays within `candPerRow` candidates
    * per row, with the band count chosen for `targetRecall` at that
    * depth.
    *
    * Model: independent sign bits split a random pair evenly, so a
    * random pair collides in one band with probability 2^-b and the
    * expected candidates per row are ≈ n · bands / 2^b. Holding that
    * constant as the corpus grows forces **2^b ∝ n** — the invariant a
    * fixed plane budget ([[lshPlan]]) silently under-turns: a 10×
    * corpus with an unscaled budget gets ~10× the candidates *per row*
    * (≈100× total pair volume), which is exactly the measured 36.85×
    * wall-clock blow-up this planner replaces. Signature cost is linear
    * in planes (cached ±1 rows), so buying depth is cheap relative to
    * quadratic candidate growth; `maxPlanes` is a safety cap — if the
    * sized plan exceeds it (sub-0.6 thresholds, where sign-LSH cannot
    * prune), degrade to the budget-capped [[lshPlan]].
    */
  def lshPlanSized(threshold: Double, n: Long,
                   targetRecall: Double = 0.98,
                   candPerRow: Double = 32.0,
                   maxPlanes: Int = 4096): (Int, Int) = {
    require(n > 0, "corpus size must be positive")
    require(candPerRow > 0, "candPerRow must be positive")
    require(threshold > 0 && threshold < 1, "threshold must be in (0,1)")
    require(targetRecall > 0 && targetRecall < 1, "targetRecall must be in (0,1)")
    val p = 1.0 - math.acos(threshold) / math.Pi
    var b = 1
    while (b <= 62) {
      val pb = math.pow(p, b)
      val bands = math.max(1,
        math.ceil(math.log(1.0 - targetRecall) / math.log1p(-pb)).toLong)
      if (n.toDouble * bands / math.pow(2.0, b) <= candPerRow) {
        if (bands * b <= maxPlanes) return (b, bands.toInt)
        else return lshPlan(threshold, targetRecall, maxPlanes)
      }
      b += 1
    }
    lshPlan(threshold, targetRecall, maxPlanes)
  }

  /** Scale-safe embedding near-dup: banded random-hyperplane LSH
    * candidate generation + exact cosine verify, with banding planned
    * from the threshold by [[lshPlan]]. No label blocking, no
    * all-pairs: candidates are an equi-join on (band, bucket), so the
    * shuffle key bounds the work exactly like MinHash LSH — at the
    * planned depth the key has `bands × 2^rowsPerBand` values (e.g.
    * 17 × 1024 at t = 0.9), plenty of reducer parallelism.
    */
  def embeddingCosineLsh(spark: SparkSession, dir: String,
                         threshold: Double = 0.35,
                         targetRecall: Double = 0.98,
                         maxPlanes: Int = 192, salt: Int = 1): DataFrame = {
    // verify strategy sized from the parquet footers like the banding
    // plan — the dir-level entry must never broadcast an oversized
    // payload (the measured 39 GB-heap failure mode); only the
    // frame-level API leaves the knob to callers who cannot count
    val n = spark.read.parquet(s"$dir/embeddings.parquet").count()
    embeddingCosineLshFrame(embFrame(spark, dir), threshold, targetRecall,
      maxPlanes, salt, broadcastVerify = n <= BroadcastVerifyMaxRows)
  }

  /** SemDeDup-style semantic dedup (Abbas et al. 2023,
    * arXiv:2303.09540): k-means-partition the embedding space, then
    * prune near-duplicates ONLY within each cluster — pair cost drops
    * from O(n²) to O(n²/nlist) with recall bounded by how often true
    * dups straddle a cluster boundary (near-identical vectors land in
    * the same cell except within ~ε of a boundary). The clustering is
    * [[Similarity]]'s deterministic trainer (first-vectors init, fixed
    * Lloyd iterations), so the whole pipeline is reproducible and
    * golden-pinnable; assignment is a shuffle-free projection, and the
    * intra-cluster pair join shuffles on `list_id` — at corpus scale
    * nlist grows ∝ √n (the SemDeDup paper's regime) so per-cluster
    * blocks stay bounded and the shuffle is the co-partitioning you
    * want anyway. Keeper rule: the LOWEST vec_id among mutual
    * near-dups survives (deterministic greedy — the paper keeps the
    * lowest-centroid-similarity exemplar; min-id is the
    * engine-reproducible variant, same dedup rate).
    *
    * Output: every vector with its cluster and verdict —
    * (vec_id, list_id, keep).
    */
  /** Corpus-sized cell count for [[semantic]]: `nlist ≈ √n` — the
    * SemDeDup paper's regime, and the sizing that keeps intra-cell pair
    * cost O(n²/nlist) = O(n^1.5) instead of quadratic. A FIXED nlist
    * silently degrades: pairs/cell grow linearly with the corpus, so a
    * 100× corpus pays 100× the per-cell work (the r08 scale10 ratio
    * 4.06 was the early signature). Floored at 16 so tiny corpora keep
    * enough cells to exercise the blocking at all; capped so the
    * centroid broadcast stays bounded (64-dim doubles: 65536 centroids
    * ≈ 34 MB — the k-means trainer and assignment broadcast both ride
    * it). Mirrors [[lshPlanSized]]: the knob is derived from the data,
    * so no per-scale configuration exists to mis-set.
    */
  def nlistSized(n: Long, min: Int = 16, max: Int = 65536): Int =
    math.min(max.toLong, math.max(min.toLong,
      math.round(math.sqrt(math.max(n, 0L).toDouble)))).toInt

  def semantic(spark: SparkSession, dir: String,
               nlist: Int = -1, iters: Int = 3,
               threshold: Double = 0.35): DataFrame = {
    // nlist < 0 → corpus-sized (√n from the parquet footers' row count,
    // no scan): the default deployment never pins a cell count
    val sized =
      if (nlist > 0) nlist
      else nlistSized(spark.read.parquet(s"$dir/embeddings.parquet").count())
    // reuse the SAME cached kmeans trainer/assignment layout as the IVF
    // family ([[IvfIndex.ensure]], keyed by (corpus content, variant,
    // nlist, iters)): at matching nlist the dedup cells provably
    // coincide with the index cells — no retrain, no re-assignment
    val e = Similarity.vecs(spark, dir)
    val index = graft.operators.IvfIndex.ensure(spark, dir, "kmeans",
      sized, iters,
      train = () => Similarity.trainedCentroids(e, sized, iters), corpus = e)
    semanticOverAssigned(
      spark.read.parquet(s"${index.path}/assign")
        .select(col("vec_id"), col("v"), col("nrm"),
          col("list_id").cast("long").as("list_id")),
      threshold)
  }

  /** [[semantic]] over an arbitrary (vec_id, v, nrm) frame. */
  def semanticFrame(e: DataFrame, nlist: Int = 16, iters: Int = 3,
                    threshold: Double = 0.35): DataFrame = {
    val cents = Similarity.trainedCentroids(e, nlist, iters)
    semanticOverAssigned(Similarity.assignFrame(e, cents), threshold)
  }

  /** The pruning half over a pre-assigned (vec_id, v, nrm, list_id)
    * frame — shared by the cached-index and ad-hoc paths.
    */
  private def semanticOverAssigned(assignedIn: DataFrame,
                                   threshold: Double): DataFrame = {
    val assigned = assignedIn
    val a = assigned.select(col("list_id"), col("vec_id").as("vec_a"),
      col("v").as("va"), col("nrm").as("na"))
    val b = assigned.select(col("list_id").as("lb"), col("vec_id").as("vec_b"),
      col("v").as("vb"), col("nrm").as("nb"))
    val drops = a.join(b, col("list_id") === col("lb") && col("vec_a") < col("vec_b"))
      .where(round(call_function("graft_dot", col("va"), col("vb"))
        / (col("na") * col("nb")), 6) >= threshold)
      .select(col("vec_b").as("dup_id")).distinct()
    assigned.select(col("vec_id"), col("list_id"))
      .join(drops, col("vec_id") === col("dup_id"), "left_outer")
      .select(col("vec_id"), col("list_id").cast("long").as("list_id"),
        col("dup_id").isNull.as("keep"))
  }

  /** [[embeddingCosineLsh]] over an arbitrary (vec_id, v, nrm) frame.
    *
    * `salt > 1` spreads each HOT band bucket (≥ `hotMin` rows) over
    * `salt` sub-keys exactly like [[minhashLshFrame]]: identical pairs,
    * but a pathological near-dup cluster's O(c²) in-bucket pairs land
    * on `salt`× more reducers instead of one straggler task — while
    * ordinary buckets pay nothing.
    */
  def embeddingCosineLshFrame(e: DataFrame, threshold: Double,
                              targetRecall: Double = 0.98,
                              maxPlanes: Int = 192, salt: Int = 1,
                              broadcastVerify: Boolean = true,
                              planOverride: Option[(Int, Int)] = None,
                              hotMin: Long = 128): DataFrame = {
    require(salt >= 1, "salt must be >= 1")
    GraftFunctions.register(e.sparkSession)
    val (rowsPerBand, bands) =
      planOverride.getOrElse(lshPlan(threshold, targetRecall, maxPlanes))
    val cand = embeddingCandFrame(e, rowsPerBand, bands, salt, hotMin)
    embeddingVerifyFrame(e, cand, threshold, broadcastVerify)
  }

  /** The cosine verify join over a pre-built candidate-pair frame —
    * exposed so a benchmark can materialize the candidates once and
    * time the verify phase as its own wall (the Probe decomposition,
    * in-artifact). Payload fetch: the side is only (vec_id, v, nrm) —
    * broadcast it while the corpus stays under
    * [[BroadcastVerifyMaxRows]] (measured, not guessed: at 400k rows
    * the broadcast verify cost 97 s / 39 GB peak heap at 100× while
    * shuffle-hash runs the same spec join on partitioned relations),
    * making both fetches map-side with no shuffle of the candidate
    * stream. Beyond the ceiling, `broadcastVerify = false` switches to
    * shuffle-HASH joins: the post-join-1 rows carry a vector each, and
    * a sort-merge join would sort that fat intermediate — measured
    * 10-30× slower and spill-prone. Catalyst can't see this from size
    * estimates (the frame is a union with generated columns), hence
    * the explicit hints.
    */
  private[graft] def embeddingVerifyFrame(e: DataFrame, cand: DataFrame,
                                          threshold: Double,
                                          broadcastVerify: Boolean = true): DataFrame = {
    val side0 = e.select(col("vec_id"), col("v"), col("nrm"))
    val side = if (broadcastVerify) broadcast(side0) else side0.hint("shuffle_hash")
    cand
      .join(side.as("sa"), col("vec_a") === col("sa.vec_id"))
      .join(side.as("sb"), col("vec_b") === col("sb.vec_id"))
      .select(col("vec_a"), col("vec_b"),
        round(call_function("graft_dot", col("sa.v"), col("sb.v"))
          / (col("sa.nrm") * col("sb.nrm")), 6).as("cos"))
      .where(col("cos") >= threshold)
      .distinct()
  }

  /** [[embeddingCosineLshFrame]]'s candidate pairs BEFORE cosine
    * verification — exposed for benchmark candidate-volume evidence
    * like [[minhashCandFrame]]. Counted WITH multi-band multiplicity
    * (each row is one verify-kernel invocation; the production path's
    * exactly-once `distinct` runs on the thresholded output).
    *
    * Banded rows are ids-only (vec_id, band, bucket): the self-join
    * shuffles the minimum possible volume — bands × ~24 bytes per
    * vector — and payloads are fetched per CANDIDATE, not replicated
    * per band (carrying v on banded rows multiplies shuffle bytes by
    * the band count and spills at scale). A pair matching in k bands
    * is verified k times (measured multiplicity ~1.07 at the planned
    * depth — banding makes multi-band agreement rare for non-dups).
    * Ids-only candidates are byte-cheap but CPU-heavy downstream (a
    * 64-dim dot product each): re-spread to cluster parallelism so
    * AQE's byte-based coalescing can't serialize the verify stage
    * (same finding as minhashLshFrame; one tiny extra shuffle).
    */
  private[graft] def embeddingCandFrame(e: DataFrame, rowsPerBand: Int,
                                        bands: Int, salt: Int = 1,
                                        hotMin: Long = 128): DataFrame = {
    GraftFunctions.register(e.sparkSession)
    val banded = embBandFrame(e, rowsPerBand, bands)
    hotSaltedSelfJoin(banded, Seq("band", "bucket"), "vec_id", salt, hotMin)
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
      .repartition(e.sparkSession.sparkContext.defaultParallelism)
  }

  /** The sign-LSH banded rows `(vec_id, band, bucket)` — the embedding
    * index representation; deterministic per vector given the plan, so
    * a persisted copy and a fresh banding bucket identically (the
    * [[bandFrame]] property, embedding-side).
    */
  private[graft] def embBandFrame(e: DataFrame, rowsPerBand: Int,
                                  bands: Int): DataFrame = {
    GraftFunctions.register(e.sparkSession)
    e.select(
      col("vec_id"),
      posexplode(call_function("graft_lsh_bands", col("v"),
        lit(rowsPerBand), lit(bands))).as(Seq("band", "bucket")))
  }

  /** Persisted sign-LSH band layout for the embedding INDEX side
    * (`vec_id % deltaMod != 0` of [[withPlantedNearDups]]'s corpus —
    * the same frame the full entry runs on) — [[ensureBandIndex]]'s
    * embedding sibling, keyed by content fingerprint AND the banding
    * plan (a re-planned corpus re-banding is a new index version).
    */
  private[graft] def ensureEmbBandIndex(spark: SparkSession, dir: String,
                                        rowsPerBand: Int, bands: Int,
                                        deltaMod: Int = 10): String = {
    val fp = graft.tsdb.Ingest.contentFingerprint(s"$dir/embeddings.parquet")
    val root = graft.Conf.resolveWorkDir(spark, "")
    val path = s"$root/emb_bands_${Integer.toHexString(dir.hashCode)}_" +
      s"${fp}_r${rowsPerBand}_b${bands}_m$deltaMod"
    if (!java.nio.file.Files.exists(
        java.nio.file.Paths.get(path, "_SUCCESS"))) {
      embBandFrame(
        withPlantedNearDups(spark, dir).where(col("vec_id") % deltaMod =!= 0),
        rowsPerBand, bands)
        .write.mode("overwrite").parquet(path)
    }
    path
  }

  /** INCREMENTAL embedding-LSH dedup — [[minhashIncremental]]'s
    * embedding sibling, and the OPERATIONAL answer to the candidate
    * phase being the cost center at 100× (r9 verdict): a daily delta
    * (`vec_id % deltaMod == 0`) probes the persisted band layout with
    * one equi-join plus a delta-only salted self-join — the index
    * never self-joins, so the banded self-join whose intermediate
    * dominates the full run's wall simply never forms. Candidate work
    * drops from O((n+d)²/2^b) to O((n·d + d²)/2^b); at a daily
    * d ≪ n the full-corpus re-pair is a one-time backfill, not a
    * recurring cost.
    *
    * Deliberately IDENTICAL knobs to the full entry it replaces
    * ([[embeddingNearDup]]: planted corpus, t = 0.9, corpus-sized
    * [[lshPlanSized]] banding, sized verify strategy), so a scale
    * leg's wall next to `dedup_embedding_lsh`'s measures exactly the
    * probe-vs-re-pair difference. Contract: pairs equal the full run
    * restricted to delta-involving rows (spec-pinned; banding is
    * deterministic per vector under a fixed plan, so persisted and
    * fresh bands agree).
    */
  def embeddingLshIncremental(spark: SparkSession, dir: String,
                              threshold: Double = 0.9,
                              candPerRow: Double = 32.0,
                              deltaMod: Int = 10): DataFrame = {
    val n = 2L * spark.read.parquet(s"$dir/embeddings.parquet").count()
    val (rowsPerBand, bands) = lshPlanSized(threshold, n, candPerRow = candPerRow)
    val idxBands = spark.read.parquet(
      ensureEmbBandIndex(spark, dir, rowsPerBand, bands, deltaMod))
    embeddingLshIncrementalFrame(withPlantedNearDups(spark, dir), idxBands,
      rowsPerBand, bands, threshold, deltaMod,
      broadcastVerify = n <= BroadcastVerifyMaxRows)
  }

  /** [[embeddingLshIncremental]] over caller-supplied frames. */
  private[graft] def embeddingLshIncrementalFrame(e: DataFrame,
                                                  idxBands: DataFrame,
                                                  rowsPerBand: Int, bands: Int,
                                                  threshold: Double,
                                                  deltaMod: Int,
                                                  broadcastVerify: Boolean): DataFrame = {
    val delta = e.where(col("vec_id") % deltaMod === 0)
    val deltaBands = embBandFrame(delta, rowsPerBand, bands)
    // the probe leg: ids-only rows, shuffle-hash on the band key (the
    // hotSaltedSelfJoin SMJ argument); the index side arrives from its
    // pruned layout scan
    val cross = deltaBands.as("a").hint("shuffle_hash")
      .join(idxBands.as("b"),
        col("a.band") === col("b.band") &&
          col("a.bucket") === col("b.bucket"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
    val intra = hotSaltedSelfJoin(deltaBands, Seq("band", "bucket"),
        "vec_id", 1, 128)
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
    // multiplicity candidates, like the full path; the verify's
    // exactly-once distinct runs on the thresholded output. Cached
    // once (persist, not checkpoint — see [[minhashIncrementalFrame]]):
    // the frame feeds both the verify join and the ids restriction
    val cand = cross.unionByName(intra)
      .select(least(col("vec_a"), col("vec_b")).as("vec_a"),
        greatest(col("vec_a"), col("vec_b")).as("vec_b"))
      .repartition(e.sparkSession.sparkContext.defaultParallelism)
      .persist()
    // fetch payloads ONLY for candidate-involved vectors: the r8/r9
    // broadcast-verify lesson applied at the source — the payload
    // relation shrinks with the delta, not the corpus, so the sized
    // broadcast strategy stays in its fast regime far longer
    val ids = cand.select(col("vec_a").as("vec_id"))
      .unionByName(cand.select(col("vec_b").as("vec_id"))).distinct()
    val involved = e.join(ids, Seq("vec_id"), "left_semi")
    embeddingVerifyFrame(involved, cand, threshold, broadcastVerify)
  }

  /** Candidate + verified pair counts for an LSH-family bench query at
    * its production defaults: `(candidates, verified)`. Benchmark-side
    * EVIDENCE, never part of the timed runs — the counts are what tie
    * a scale leg's wall-clock to the workload's true-duplicate
    * structure (candidates ∝ Σ cluster² on replica-heavy corpora) so
    * the artifact proves the ratio is the data, not the plan.
    */
  def lshStats(spark: SparkSession, dir: String, op: String): (Long, Long) =
    op match {
      case "dedup_minhash" =>
        val d = parallelize(docs(spark, dir))
        (minhashCandFrame(d).count(), minhashLshFrame(d).count())
      case "dedup_embedding_lsh" =>
        val n = 2L * spark.read.parquet(s"$dir/embeddings.parquet").count()
        val plan = lshPlanSized(0.9, n)
        val e = withPlantedNearDups(spark, dir)
        (embeddingCandFrame(e, plan._1, plan._2).count(),
          embeddingCosineLshFrame(e, 0.9, planOverride = Some(plan),
            broadcastVerify = n <= BroadcastVerifyMaxRows).count())
      case "dedup_simhash_pairs" =>
        // follow the ROUTED plan: candidates = the rows that actually
        // enter the bit_count verify under the census-chosen route
        // (collapsed → representative-level; direct → member-level)
        // and the census-chosen banding — the r11 record's 597× growth
        // was the unrouted member-level classic generator
        val d = docs(spark, dir)
        val hashed = simhashFrame(d)
        val (maxGroup, _, nDistinct) = simhashCensus(hashed)
        val wide = nDistinct >= WideBandMinHashes
        val candFrame =
          if (maxGroup >= SimhashCollapseMinGroup) {
            val reps = hashed.groupBy(col("simhash"))
              .agg(min(col("doc_id")).as("doc_id"))
              .select(col("doc_id"), col("simhash"))
            hammingCandFrame(reps, "doc_id", "simhash", wide)
          } else hammingCandFrame(hashed, "doc_id", "simhash", wide)
        (candFrame.count(), simhashPairsFrame(d).count())
      case other => sys.error(s"no LSH stats for $other")
    }

  /** Evidence counts for the incremental-dedup scale legs (r11 verdict
    * item 5): `(delta_rows, index_rows)` at the given `deltaMod` —
    * delta_rows is the shard the daily run actually processes,
    * index_rows the persisted layout it probes (banded grains count
    * banded rows: that IS the frame the probe scans). Pure evidence,
    * never part of a timed leg; makes the O(delta)-not-O(corpus)
    * thesis MEASURABLE from the artifact (a leg where delta_rows is
    * held constant while index_rows grows 100× should hold a ~flat
    * wall).
    */
  def incrementalStats(spark: SparkSession, dir: String, op: String,
                       deltaMod: Int = 10): (Long, Long) = op match {
    case "dedup_exact_incremental" =>
      val planted = plantedReDelivery(docs(spark, dir))
      val path = ensureExactIndex(spark, dir, planted, deltaMod)
      (planted.where(col("doc_id") % deltaMod === 0).count(),
        spark.read.parquet(s"$path/fps").count())
    case "dedup_minhash_incremental" =>
      (docs(spark, dir).where(col("doc_id") % deltaMod === 0).count(),
        spark.read.parquet(
          ensureBandIndex(spark, dir, deltaMod = deltaMod)).count())
    case "dedup_simhash_incremental" =>
      (docs(spark, dir).where(col("doc_id") % deltaMod === 0).count(),
        spark.read.parquet(ensureSimhashIndex(spark, dir, deltaMod)).count())
    case "dedup_embedding_lsh_incremental" =>
      val n = 2L * spark.read.parquet(s"$dir/embeddings.parquet").count()
      val (rowsPerBand, bands) = lshPlanSized(0.9, n, candPerRow = 32.0)
      (withPlantedNearDups(spark, dir)
        .where(col("vec_id") % deltaMod === 0).count(),
        spark.read.parquet(
          ensureEmbBandIndex(spark, dir, rowsPerBand, bands, deltaMod)).count())
    case other => sys.error(s"no incremental stats for $other")
  }

  /** Cell-blocking evidence for [[semantic]] at its production sizing:
    * `(nlist, n_cells_used, max_cell_rows, intra_cell_pairs)` over the
    * SAME cached assignment the query reads. The pair count is
    * Σ c·(c−1)/2 over cell sizes — the exact candidate volume the
    * intra-cell join generates — so the artifact can show pairs/cell
    * staying bounded as the corpus grows (the whole point of
    * [[nlistSized]]'s √n sizing; a fixed nlist shows pairs growing
    * quadratically here long before the wall-clock does).
    */
  def semanticStats(spark: SparkSession, dir: String,
                    iters: Int = 3): (Int, Long, Long, Long) = {
    val n = spark.read.parquet(s"$dir/embeddings.parquet").count()
    // fail with the actual problem, not the NullPointerException a
    // zero-row aggregate's null max/sum would deref below
    require(n > 0, s"semanticStats: empty embeddings corpus under $dir")
    val sized = nlistSized(n)
    val e = Similarity.vecs(spark, dir)
    val index = graft.operators.IvfIndex.ensure(spark, dir, "kmeans",
      sized, iters,
      train = () => Similarity.trainedCentroids(e, sized, iters), corpus = e)
    val row = spark.read.parquet(s"${index.path}/assign")
      .groupBy(col("list_id")).agg(count(lit(1)).as("c"))
      .agg(count(lit(1)).as("cells"), max(col("c")).as("max_c"),
        sum(expr("c * (c - 1) div 2")).as("pairs"))
      .head()
    (sized, row.getLong(0), row.getLong(1), row.getLong(2))
  }

  /** The clone-id offset for [[withPlantedNearDups]]: the smallest
    * power of ten above both `maxId` and 10^6, so clone ids can never
    * collide with corpus ids regardless of the corpus's id range (a
    * fixed 10^6 offset silently corrupts the planted ground truth the
    * moment a corpus holds ids ≥ 10^6). Floored at 10^6 so the shipped
    * sf tables (ids ≪ 10^6) keep stable clone ids across scale factors.
    */
  private[operators] def cloneOffset(maxId: Long): Long = {
    var off = 1000000L
    while (off <= maxId) off *= 10L
    off
  }

  /** The corpus plus one deterministic jittered near-duplicate per
    * vector (clone id = vec_id + [[cloneOffset]], same label): each
    * clone is `v + amp·‖v‖/√dim · (±1 per component)` with signs from
    * `xxhash64(vec_id, i)`, giving cos(v, clone) ≈ 1/√(1+amp²) ≈ 0.95
    * at the default. The shipped corpus has no high-cosine pairs (max
    * ≈ 0.48), so this provides the near-duplicate regime that embedding
    * dedup — and its LSH pruning — actually targets, with known planted
    * ground truth.
    */
  def withPlantedNearDups(spark: SparkSession, dir: String,
                          amp: Double = 0.33): DataFrame = {
    val e = embFrame(spark, dir)
    // one tiny agg job: the max id bounds the clone offset; collecting
    // a single row is not a driver-side loop
    val maxId = e.agg(max(col("vec_id"))).head().getLong(0)
    val clones = e.select(
      (col("vec_id") + cloneOffset(maxId)).as("vec_id"), col("label"),
      call_function("graft_jitter", col("v"), col("vec_id"), lit(amp)).as("v"))
    e.select(col("vec_id"), col("label"), col("v"))
      .union(clones)
      .withColumn("nrm", sqrt(call_function("graft_dot", col("v"), col("v"))))
  }

  /** Embedding near-dup detection in its operating regime: LSH over the
    * planted-near-dup frame at a near-duplicate threshold, with banding
    * sized from the CORPUS ([[lshPlanSized]]): candidates per row stay
    * ≈ `candPerRow` at any scale because 2^rowsPerBand grows ∝ n. At
    * sf0.1 (n = 4000 with clones) the plan is 12 planes × 24 bands; a
    * 10× corpus gets 16 × 45 — deeper bands, constant per-row work,
    * total candidate volume ~linear in n. Planted pairs (cos ≈ 0.95)
    * are recalled with p > 0.99 by construction of the band count —
    * the pruning regime a 100 TB dedup runs in, unlike sub-0.6
    * thresholds where sign-LSH cannot separate pairs from noise (see
    * [[lshPlan]]).
    */
  /** Verify-side fetch ceiling for the broadcast strategy: above this
    * many corpus rows the (vec_id, v, nrm) payload relation stops being
    * "dimension-table small" (64-dim double arrays ≈ 600 B/row unsafe —
    * ~60 MB hashed at the ceiling) and the verify joins switch to
    * shuffle-hash. The r08 100× leg measured the cost of NOT switching:
    * a 400k-row broadcast verify ran 97 s with 12 s of GC and a 39 GB
    * peak heap, while the plan's candidate volume held exactly the
    * sized invariant — the wall was purely the oversized broadcast
    * relation. Like the banding plan, the strategy is derived from the
    * corpus size, so no per-scale knob exists to mis-set.
    */
  private[graft] val BroadcastVerifyMaxRows = 100000L

  def embeddingNearDup(spark: SparkSession, dir: String,
                       threshold: Double = 0.9,
                       candPerRow: Double = 32.0): DataFrame = {
    // corpus size from parquet footers (row-count metadata, no scan);
    // the planted frame doubles it
    val n = 2L * spark.read.parquet(s"$dir/embeddings.parquet").count()
    embeddingCosineLshFrame(withPlantedNearDups(spark, dir), threshold,
      planOverride = Some(lshPlanSized(threshold, n, candPerRow = candPerRow)),
      broadcastVerify = n <= BroadcastVerifyMaxRows)
  }

  // -------------------------------------------------- duplicate clustering
  /** Connected components over a near-dup pair frame `(doc_a, doc_b)` —
    * the last step of every dedup pipeline: pairwise candidates only say
    * "a~b"; keeping one document per TRANSITIVE group needs the
    * components. Output: one row per document that appears in any pair,
    * with its `cluster_id` (the component's minimum doc id — a
    * deterministic canonical representative), the `cluster_size`, and
    * `is_keeper` (true exactly for the representative).
    *
    * Distributed shape: min-label propagation — every node starts as its
    * own label; each round replaces a node's label with the minimum over
    * itself and its neighbors (one shuffle join + one aggregate per
    * round); a fixed point is reached after O(component diameter)
    * rounds — with a pointer-doubling shortcut each round (a node's
    * label jumps through the previous round's label table: comp values
    * only decrease and comp(x) ≤ x, so the jump is always downhill),
    * which shortens the longest label path multiplicatively per round
    * and keeps convergence O(log diameter) even on adversarial
    * long-path graphs. Each round's label frame (small — two longs per
    * *paired* doc, not per corpus doc) is eagerly `localCheckpoint`ed:
    * the next round references it three times, so without plan
    * truncation the logical plan multiplies per round and explodes
    * exponentially — caching alone (persist) keeps the data but not
    * the plan flat. Driver cost per round is exactly ONE job: the
    * convergence flag is an `observe` metric collected by the
    * checkpoint-materializing job itself, not a separate action.
    *
    * Materialization picks RELIABLE `checkpoint` automatically when
    * the SparkContext has a checkpoint directory configured (the
    * cluster deployment posture — survives executor loss; set it to
    * durable storage) and `localCheckpoint` otherwise (single-machine
    * speed; blocks die with executors). Same contract either way,
    * spec-asserted identical results.
    */
  /** Eager materialization + plan truncation, reliable iff the context
    * has a checkpoint dir (see [[clusterPairs]] doc).
    */
  private def materialize(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
      df.checkpoint(eager = true)
    else df.localCheckpoint(eager = true)

  /** Rounds the last [[clusterPairs]] call took to converge — loop
    * telemetry for the bench's staged component walls (the per-round
    * job overhead is the loop's scarce resource at every scale, so a
    * round-count change IS the optimization evidence). Thread-LOCAL
    * (r12 ADVICE): the driver-side loop runs on the calling thread, so
    * concurrent clusterPairs calls (parallel test suites in one JVM)
    * each read their own run's count instead of racing on a global.
    */
  private val clusterRoundsTL: ThreadLocal[Int] =
    ThreadLocal.withInitial(() => -1)
  private[graft] def lastClusterRounds: Int = clusterRoundsTL.get

  /** Label frames at or under this row count broadcast the per-round
    * pointer-jump table instead of shuffling the stepped frame on the
    * (skew-prone) `comp` key: near convergence most labels equal a
    * few cluster minima, so the shuffled jump join hashes whole
    * clusters to single partitions — the broadcast route removes that
    * exchange AND the repartition needed to restore id-partitioning
    * after it (guide §3.1 / §2.4). The cap is derived from the DRIVER
    * heap, not a constant (r12 ADVICE): a LongHashedRelation costs
    * several times its 16 B/row raw size, the driver collects the
    * table once per round, and the explicit broadcast() hint bypasses
    * autoBroadcastJoinThreshold's safety — so budget ~64 B/row built
    * and keep the whole build under 1/8 of the driver heap (per-round
    * broadcasts accumulate until ContextCleaner runs after a driver
    * GC). 5M rows stays the ceiling even on huge heaps; corpus-sized
    * label frames keep the shuffle route, so the plan stays
    * scale-safe rather than local-tuned.
    */
  private[graft] val ClusterJumpBroadcastMaxRows: Long =
    math.min(5000000L, Runtime.getRuntime.maxMemory / (64L * 8L))

  def clusterPairs(pairs: DataFrame, maxIters: Int = 40): DataFrame =
    clusterPairsTuned(pairs, maxIters, foldInit = true,
      broadcastJumpMaxRows = ClusterJumpBroadcastMaxRows)

  /** [[clusterPairs]] with the convergence/plan knobs exposed for A/B
    * measurement (probe/spec use):
    *  - `foldInit`: seed each node's label with min(id, min neighbor)
    *    inside the init aggregate (replacing the same-cost distinct),
    *    which is round 1's hop for free — measured one full round
    *    saved at every scale (sf0.1 ngram graph 3→2 rounds,
    *    100× simhash graph 15→14);
    *  - `broadcastJumpMaxRows`: see [[ClusterJumpBroadcastMaxRows]];
    *    0 forces the shuffle route;
    *  - `localContraction`: run a partition-level union-find first and
    *    propagate over the contracted boundary graph only (round 13 —
    *    the loop's rounds are hop-limited by chain structure, so the
    *    fix is to collapse the chains before the loop); false forces
    *    the uncontracted loop (spec/A-B use).
    * (A `jumps > 1` variant — chaining extra pointer-jump joins per
    * round — was measured and REJECTED: the loop is hop-limited, not
    * chain-limited (100× rounds stayed 14 with double jumps), and the
    * extra join on the skewed comp key blew the round cost up 8×.)
    * All knobs preserve the fixed point exactly: comp values only
    * step downhill through node ids of the same component, and
    * convergence still means "no label changed across a full
    * hop+jump round".
    */
  /** Partition-local union-find over one edge partition: every node
    * that appears in the partition is mapped to the MINIMUM node id of
    * its partition-local component (union-by-min + path compression,
    * amortized near-linear). Runs on the src-partitioned symmetric
    * edge frame, so a node's full local neighborhood lands in one
    * partition and chains/stars collapse to a single representative
    * before any distributed round runs. Emits one (id, rep) row per
    * node per partition (a node split across partitions emits several
    * rows — the cross-partition disagreement IS the boundary graph).
    */
  private def unionFindPartition(
      it: Iterator[(Long, Long)]): Iterator[(Long, Long)] = {
    val parent = scala.collection.mutable.LongMap.empty[Long]
    def find(x: Long): Long = {
      var r = x
      var p = parent.getOrElse(r, r)
      while (p != r) { r = p; p = parent.getOrElse(r, r) }
      // path compression: repoint the walked chain at the root
      var c = x
      while (c != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    it.foreach { case (a, b) =>
      if (!parent.contains(a)) parent(a) = a
      if (!parent.contains(b)) parent(b) = b
      val ra = find(a); val rb = find(b)
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    // materialize the key set first: find() mutates the map (path
    // compression) and LongMap iteration under mutation is undefined
    val ids = parent.keys.toArray
    ids.iterator.map(id => (id, find(id)))
  }

  /** Loop-node count of the last [[propagateLabels]] call (the row
    * count the broadcast-jump gate already pays for) — with local
    * contraction on, this is the CONTRACTED node count, the evidence
    * that the distributed loop ran on the boundary graph, not the
    * corpus pair graph. Thread-local like [[lastClusterRounds]].
    */
  private val clusterNodesTL: ThreadLocal[Long] =
    ThreadLocal.withInitial(() => -1L)
  private[graft] def lastClusterNodes: Long = clusterNodesTL.get

  /** Pair graphs below this edge count skip the local contraction: the
    * contraction costs ~4 fixed jobs and 3 label-sized shuffles
    * (union-find pass, per-node min-rep aggregate, boundary-edge
    * distinct, member label-back join) and pays by deleting loop
    * ROUNDS — on a tiny graph the loop is already 2-3 rounds and the
    * fixed jobs cost more than they remove (measured sf0.1
    * dedup_cluster 0.84 → 1.52 s ungated), while at 100× (1.07M
    * pairs, 14 rounds) the contraction deletes 10 rounds and 7 s. A
    * corpus statistic, not a core count: the count runs over the
    * already-persisted symmetric edge frame the loop materializes
    * anyway, so the gate costs one cache-scan job.
    */
  private[graft] val ClusterContractionMinPairs = 100000L

  private[graft] def clusterPairsTuned(pairs: DataFrame, maxIters: Int = 40,
                                       foldInit: Boolean = true,
                                       broadcastJumpMaxRows: Long =
                                         ClusterJumpBroadcastMaxRows,
                                       localContraction: Boolean = true,
                                       contractionMinPairs: Long =
                                         ClusterContractionMinPairs): DataFrame = {
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
    // symmetrize once: propagation must flow both directions.
    // PRE-PARTITIONED on the probe key before the persist (round 12):
    // every round's neighbor join probes sym on `src`, and a cached
    // frame with hashpartitioning(src) as its output partitioning
    // satisfies the join's required distribution — so the edge frame
    // (the largest frame in the loop) shuffles ONCE instead of once
    // per round. Same for the labels side below: re-partitioned on
    // `id` before each round's checkpoint, so the two per-round label
    // joins probe it exchange-free. Measured at 100× (1.07M pairs,
    // 500k nodes, 15 rounds): 29.8 s → 19.1 s, identical labels.
    val sym = edges.union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .repartition(col("src"))
      .persist()
    // LOCAL-CONTRACTION preprocessing (round 13, guide §2.1/§2.2): the
    // distributed loop costs one shuffle + one action PER ROUND and the
    // round count is hop-limited by the graph's chain structure
    // (measured r12: extra pointer jumps don't reduce it). A
    // partition-level union-find collapses every chain/star that is
    // local to a partition in ONE pass, and the loop then runs on the
    // CONTRACTED boundary graph — nodes = local representatives, edges
    // = (rep, min-rep) disagreements of nodes seen in several
    // partitions. Component minima survive contraction exactly: a
    // node's local rep is ≤ the node and in its component, the global
    // minimum is its own rep everywhere, and every rep of a multi-rep
    // component appears in a boundary edge (a rep with no boundary
    // edge is provably its whole component's only rep, handled by the
    // coalesce fallback below). Labels are therefore checksum-identical
    // to the uncontracted route — spec-pinned in DedupSpec.
    // Guarded to Long ids (every caller today): exotic id types fall
    // back to the uncontracted loop rather than risk a cast. Size-gated
    // by [[ClusterContractionMinPairs]]; the count scans the persisted
    // frame the loop materializes anyway.
    val contract = localContraction &&
      sym.schema.fields.forall(_.dataType ==
        org.apache.spark.sql.types.LongType) &&
      sym.count() >= 2L * contractionMinPairs
    val labels =
      if (contract) {
        val sp = sym.sparkSession
        import sp.implicits._
        val mapping = sym.as[(Long, Long)]
          .mapPartitions(unionFindPartition _)
          .toDF("id", "rep")
        // one row per node: its minimum rep across partitions, plus
        // the distinct reps (≤ #partitions holding the node) that seed
        // the boundary edges
        val byNode = mapping.groupBy(col("id"))
          .agg(min(col("rep")).as("mrep"), collect_set(col("rep")).as("reps"))
          .persist()
        // boundary graph: each non-minimal rep of a node links to the
        // node's min rep. rep > mrep always holds here, so the
        // distinct is collision-free and the symmetric union below
        // cannot re-duplicate.
        val cEdges = byNode
          .select(explode(col("reps")).as("src"), col("mrep").as("dst"))
          .where(col("src") =!= col("dst"))
          .distinct()
        val cSym = cEdges
          .union(cEdges.select(col("dst").as("src"), col("src").as("dst")))
          .repartition(col("src"))
          .persist()
        val repLabels = propagateLabels(cSym, maxIters, foldInit,
          broadcastJumpMaxRows)
        // label every member through its min rep; reps that never hit
        // a boundary edge are their own component's minimum
        val out = byNode
          .join(repLabels.select(col("id").as("rid"), col("comp").as("rcomp")),
            col("mrep") === col("rid"), "left")
          .select(byNode("id").as("id"),
            coalesce(col("rcomp"), col("mrep")).as("comp"))
          .transform(materialize)
        cSym.unpersist()
        byNode.unpersist()
        out
      } else propagateLabels(sym, maxIters, foldInit, broadcastJumpMaxRows)
    val out = labels
      .withColumn("cluster_size",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("comp"))))
      .select(col("id").as("doc_id"), col("comp").as("cluster_id"),
        col("cluster_size"), (col("id") === col("comp")).as("is_keeper"))
    sym.unpersist()
    out
  }

  /** The distributed min-label-propagation loop over a persisted,
    * src-partitioned symmetric edge frame; returns the fixed-point
    * (id, comp) label frame (checkpointed). See [[clusterPairs]] for
    * the per-round shape; [[clusterPairsTuned]] decides what graph
    * this runs on (corpus pair graph or contracted boundary graph).
    */
  private def propagateLabels(sym: DataFrame, maxIters: Int,
                              foldInit: Boolean,
                              broadcastJumpMaxRows: Long): DataFrame = {
    var labels =
      (if (foldInit)
         // round 1's hop folded into the init aggregate: same shuffle
         // the distinct would pay, but labels start one hop ahead
         sym.groupBy(col("src"))
           .agg(least(col("src"), min(col("dst"))).as("comp"))
           .select(col("src").as("id"), col("comp"))
       else
         sym.select(col("src").as("id")).distinct()
           .withColumn("comp", col("id")))
        .repartition(col("id")).transform(materialize)
    // route the per-round pointer-jump join ONCE from the label-frame
    // size (cheap count over the checkpointed init frame): broadcast
    // when it fits, shuffle when corpus-sized
    val loopNodes = labels.count()
    clusterNodesTL.set(loopNodes)
    val bcastJump = broadcastJumpMaxRows > 0 &&
      loopNodes <= broadcastJumpMaxRows
    var converged = false
    var iter = 0
    while (!converged && iter < maxIters) {
      val nbrMin = sym.join(labels, sym("src") === labels("id"))
        .groupBy(col("dst").as("id2")).agg(min(col("comp")).as("nbr"))
      val stepped = labels.join(nbrMin, labels("id") === nbrMin("id2"), "left")
        .select(col("id"), col("comp").as("prev"),
          least(col("comp"), coalesce(col("nbr"), col("comp"))).as("comp"))
      // shortcut: comp(v) := comp_prev(comp(v)) — the jump table is the
      // PREVIOUS round's already-materialized labels, so the whole round
      // is one plan over checkpointed inputs and needs exactly ONE
      // materializing action. (Jumping through the round's own step
      // frame doubles per-round progress slightly but costs a second
      // checkpoint per round — measured, the extra driver actions
      // dominate on these label-sized frames.) Every comp value is a
      // node id and comp only decreases, so the lookup resolves and the
      // jump is always downhill. The `chg` flag rides along so the
      // convergence probe is a metadata-cheap aggregate over the
      // checkpointed blocks, not a third join job.
      // the convergence flag rides the SAME job that materializes the
      // round (observe metrics fire on the eager checkpoint), so each
      // round is exactly ONE Spark job
      val obs = org.apache.spark.sql.Observation()
      // Jump-table route (sized once above): the comp key is SKEWED —
      // near convergence most rows carry one of a few cluster minima,
      // so a shuffled join on comp hashes whole clusters to single
      // partitions. Broadcasting the label-sized table removes that
      // exchange, and because the stepped frame is already
      // id-partitioned (labels-side join), the broadcast route also
      // makes the closing repartition a no-op it can skip — one
      // exchange per round (the neighbor-min aggregate) instead of
      // three.
      val jumpTable =
        labels.select(col("id").as("pid"), col("comp").as("pcomp"))
      val jumped = stepped.as("s")
        .join(if (bcastJump) broadcast(jumpTable) else jumpTable,
          col("s.comp") === col("pid"), "left")
        .select(col("s.id").as("id"),
          coalesce(col("pcomp"), col("s.comp")).as("comp"),
          (coalesce(col("pcomp"), col("s.comp")) =!= col("s.prev")).as("chg"))
      val next = jumped
        .observe(obs, coalesce(max(col("chg")), lit(false)).as("any"))
        // shuffle route only: restore the id hash-partitioning the
        // comp-keyed exchange destroyed — one exchange here deletes
        // two in the next round's joins
        .transform(f => if (bcastJump) f else f.repartition(col("id")))
        .transform(materialize)
      val anyChanged = obs.get("any").asInstanceOf[Boolean]
      labels = next.select(col("id"), col("comp"))
      converged = !anyChanged
      iter += 1
    }
    require(converged, s"label propagation did not converge in $maxIters rounds")
    clusterRoundsTL.set(iter)
    labels
  }

  /** [[clusterPairs]] over the n-gram-Jaccard near-dup pairs — the
    * SQL-oracle-able instantiation (DuckDB recomputes the components
    * with a recursive transitive closure over the same pair set).
    */
  def cluster(spark: SparkSession, dir: String,
              threshold: Double = 0.3): DataFrame =
    clusterPairs(ngramJaccard(spark, dir, threshold))

  /** Duplicate-cluster size census — the observability read an operator
    * does BEFORE trusting a dedup run at 100 TB: the size distribution
    * says whether duplication is long-tail pairs (healthy crawl) or a
    * few giant boilerplate clusters (the regime where verify joins go
    * quadratic per cluster and hot-bucket salting starts paying — see
    * the minhash 100× finding). One distinct + one aggregate over the
    * LABELED (paired) subset; output rows ≤ the max cluster size, so
    * the census is dashboard-sized no matter the corpus.
    */
  def clusterSizeHist(spark: SparkSession, dir: String,
                      threshold: Double = 0.3): DataFrame =
    cluster(spark, dir, threshold)
      .select(col("cluster_id"), col("cluster_size")).distinct()
      .groupBy(col("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"))

  /** Weighted keepers — dedup WITHOUT losing the duplication signal:
    * one canonical document per near-dup cluster, carrying the cluster
    * size as a `weight` column (unpaired documents keep weight 1).
    * This is the loss-reweighting posture: training on the deduped
    * corpus with per-example weights preserves the original data
    * distribution's emphasis while paying each near-duplicate's
    * compute exactly once — where a plain drop silently down-weights
    * everything that was popular enough to be duplicated. Invariant
    * (spec-pinned): Σweight == corpus row count.
    *
    * Scale shape: the labeled (paired) subset aggregates to one keeper
    * row per cluster (min doc id, the [[pipeline]] canonical rule);
    * the unpaired remainder comes from ONE left join of the corpus ids
    * against the labels on the doc key — the doc-key shuffle that
    * every split/labeling op in this library already pays, with no
    * broadcast assumption on the paired set (the [[pipelineFrame]]
    * lesson applied by construction).
    */
  def keepersWeighted(spark: SparkSession, dir: String,
                      threshold: Double = 0.3): DataFrame = {
    val labels = cluster(spark, dir, threshold)
      .select(col("doc_id"), col("cluster_id"))
    val keepers = labels.groupBy(col("cluster_id"))
      .agg(min(col("doc_id")).as("doc_id"),
        count(lit(1)).as("weight"))
      .select(col("doc_id"), col("weight"))
    val unpaired = docs(spark, dir).select(col("doc_id"))
      .join(labels, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), lit(1L).as("weight"))
    unpaired.unionByName(keepers)
  }

  /** The dedup pipeline END-TO-END — what a training-data run actually
    * executes: MinHash-LSH near-dup pairs → connected components →
    * keep one canonical document per cluster (plus every unpaired
    * document). Returns the KEPT corpus ids with their cluster size
    * (1 for unique documents).
    *
    * Scale shape: the only corpus-sized operations are the LSH pass
    * itself and one final anti-join; the component labels and drop
    * list are proportional to the *duplicated* subset.
    */
  def pipeline(spark: SparkSession, dir: String,
               threshold: Double = 0.5): DataFrame =
    pipelineFrame(parallelize(docs(spark, dir)), threshold)

  /** [[pipeline]] over an arbitrary (doc_id, text) frame.
    *
    * The final anti-join's build side is the whole paired-id set — NOT
    * guaranteed small on the corpora dedup exists for: web crawls run
    * 30-50% near-duplicate, so at 100 TB the paired ids are billions of
    * rows and an unconditional broadcast ships tens of GB to every
    * executor. The hint is therefore gated on the actual paired count
    * (free to read here — clusterPairs has already materialized the
    * labels); above `broadcastMaxIds` the plan falls back to a plain
    * shuffled anti-join on doc_id, which AQE may still convert if
    * runtime stats turn out small.
    */
  def pipelineFrame(docsDf: DataFrame, threshold: Double = 0.5,
                    broadcastMaxIds: Long = 4_000_000L): DataFrame =
    pipelineOverPairs(docsDf, minhashLshFrame(docsDf, threshold = threshold),
      broadcastMaxIds)

  /** [[pipeline]] with SimHash banded pairs as the candidate source —
    * constant verify cost per pair (`bit_count`, not shingle-set
    * intersection), the variant that keeps the end-to-end composition
    * linear on corpora with large true-dup clusters (where MinHash
    * verification is quadratic in cluster size).
    */
  def pipelineSimhash(spark: SparkSession, dir: String,
                      hamMax: Int = 3): DataFrame = {
    val d = parallelize(docs(spark, dir))
    pipelineOverPairs(d, simhashPairsFrame(d, hamMax))
  }

  /** The dedup composition over EMBEDDING near-dup pairs — semantic
    * dedup end-to-end: planted-corpus LSH pairs at a near-duplicate
    * threshold ([[embeddingNearDup]], corpus-sized banding) →
    * connected components → kept corpus. The third pair source through
    * the one [[pipelineOverPairs]] composition (minhash / simhash /
    * embedding), which is the point: a 100 TB pipeline swaps similarity
    * signals without touching the clustering or keeper semantics.
    */
  def pipelineEmbedding(spark: SparkSession, dir: String,
                        threshold: Double = 0.9): DataFrame = {
    val ids = withPlantedNearDups(spark, dir).select(col("vec_id").as("doc_id"))
    val pairs = embeddingNearDup(spark, dir, threshold)
      .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b"))
    pipelineOverPairs(ids, pairs)
  }

  /** [[pipelineOverPairs]] with a QUALITY-RANKED keeper: each duplicate
    * cluster keeps its highest-scoring document ((score desc, doc_id)
    * total order — deterministic on score ties) instead of the
    * canonical min-id — the FineWeb/CCNet-style pipeline choice where
    * dedup composes with the quality signal ("of the near-duplicates,
    * keep the best one"). `scores` is any (doc_id, quality_score)
    * frame; unpaired documents pass through with cluster_size 1. Same
    * scale shape as the canonical pipeline: the score join and keeper
    * window run over the PAIRED subset only (labels-sized), never the
    * corpus; the corpus-sized operations remain the pair pass and one
    * anti-join (broadcast-gated, see [[pipelineFrame]]).
    */
  def pipelineQualityKeeper(docsDf: DataFrame, pairs: DataFrame,
                            scores: DataFrame,
                            broadcastMaxIds: Long = 4_000_000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val clusters = clusterPairs(pairs).transform(materialize)
    val pairedCount = clusters.count()
    val byCluster = Window.partitionBy(col("cluster_id"))
      .orderBy(col("quality_score").desc, col("doc_id"))
    val kept = clusters.join(scores, "doc_id")
      .withColumn("rn", row_number().over(byCluster))
      .where(col("rn") === 1)
      .select(col("doc_id"), col("cluster_size"), col("quality_score"))
    val pairedIds = clusters.select(col("doc_id").as("paired_id"))
    // same two-way gate as [[pipelineOverPairs]]: above cap, pin the
    // non-broadcast route against optimistic post-checkpoint estimates
    val build =
      if (pairedCount <= broadcastMaxIds) broadcast(pairedIds)
      else pairedIds.hint("merge")
    docsDf.select(col("doc_id"))
      .join(build, col("doc_id") === col("paired_id"), "left_anti")
      .join(scores, "doc_id")
      .select(col("doc_id"), lit(1L).as("cluster_size"), col("quality_score"))
      .unionByName(kept)
  }

  /** [[pipelineQualityKeeper]] over the n-gram-Jaccard pairs and the
    * [[TextAnalysis.quality]] score — the SQL-oracle-able
    * instantiation (DuckDB re-derives components recursively, the
    * score, and the same per-cluster argmax).
    */
  def pipelineQuality(spark: SparkSession, dir: String,
                      threshold: Double = 0.3): DataFrame =
    pipelineQualityKeeper(
      parallelize(docs(spark, dir)),
      ngramJaccard(spark, dir, threshold),
      TextAnalysis.quality(spark, dir)
        .select(col("doc_id"), col("quality_score")))

  /** The Lee et al. 2022 substring-dedup pipeline END-TO-END — the
    * published training-corpus recipe as one composition: exact dedup
    * keeps one doc per identical text (min-id keeper), the keeper
    * corpus runs SUBSTRING dedup (duplicated-gram spans cut, survivors
    * re-joined — [[TextAnalysis.dedupRewriteFrame]]), docs that empty
    * to `''` drop (the length filter every pipeline applies), and the
    * survivors carry the quality score of their REWRITTEN text —
    * scoring the text a model would actually train on, not the
    * boilerplate-inflated original. Output: one row per surviving doc
    * `(doc_id, n_words, n_kept, quality_score)`.
    *
    * Scale shape: the exact stage is one hash aggregate + one keeper
    * join; the substring stage is the gram-volume-linear contract of
    * 31q/31r; the quality stage is a pure projection over survivors.
    * Nothing here exceeds the stages' own documented postures — the
    * composition adds only the keeper equi-join. Oracle: string
    * surgery over the SAME stage oracles (exact census → span CTEs
    * re-pointed at keepers → rewrite tail → TextQualitySql re-pointed
    * at clean_text), the dedup_yield precedent — the pipeline can
    * never drift from the gated stages.
    */
  def pipelineSubstring(spark: SparkSession, dir: String): DataFrame = {
    val d = parallelize(docs(spark, dir))
    val keeperIds = exact(spark, dir).select(col("keeper").as("doc_id"))
    val keepers = d.join(keeperIds, "doc_id")
      .select(col("doc_id"), col("text"))
    val rewritten = TextAnalysis.dedupRewriteFrame(keepers)
    val survivors = rewritten.where(col("n_kept") > 0)
    val scores = TextAnalysis.qualityFrame(
        survivors.select(col("doc_id"), col("clean_text").as("text")))
      .select(col("doc_id"), col("quality_score"))
    survivors.join(scores, "doc_id")
      .select(col("doc_id"), col("n_words"), col("n_kept"),
        col("quality_score"))
  }

  /** The generic composition: any `(doc_a, doc_b)` near-dup pair frame
    * → connected components → kept corpus (see [[pipelineFrame]] for
    * the broadcast-gate contract).
    */
  def pipelineOverPairs(docsDf: DataFrame, pairs: DataFrame,
                        broadcastMaxIds: Long = 4_000_000L): DataFrame = {
    val clusters = clusterPairs(pairs)
      .transform(materialize)
    val pairedCount = clusters.count()
    val kept = clusters.where(col("is_keeper"))
      .select(col("doc_id"), col("cluster_size"))
    // dropped ∪ keepers = every paired id
    val pairedIds = clusters.select(col("doc_id").as("paired_id"))
    // the gate is authoritative in BOTH directions: below cap the hint
    // broadcasts a set the planner can't size (checkpointed lineage);
    // above cap `merge` pins the sort-merge route that unknown stats
    // used to produce — since r13 the checkpoint PROPAGATES its origin
    // plan's estimates, and a wrong (too-small) estimate over >cap
    // paired ids must not re-introduce the broadcast cliff the exact
    // count just ruled out
    val build =
      if (pairedCount <= broadcastMaxIds) broadcast(pairedIds)
      else pairedIds.hint("merge")
    docsDf.select(col("doc_id"))
      .join(build, col("doc_id") === col("paired_id"), "left_anti")
      .select(col("doc_id"), lit(1L).as("cluster_size"))
      .unionByName(kept)
  }

  /** Per-source pipeline YIELD report — the provenance accounting every
    * production data pipeline publishes next to its output: for each
    * document source, how many documents entered, and how many survive
    * each stage of the standard chain — exact dedup (min-id keeper per
    * normalized-text fingerprint), near-dup dedup over the exact
    * survivors ([[ngramJaccardFrame]] pairs → connected components →
    * canonical keeper, the [[pipelineOverPairs]] semantics), and the
    * quality gate (`quality_score ≥ minQuality` on the delivered
    * text). The count columns are NOT nested percentages — they are
    * absolute survivor counts per source, so Σ n_after_* across
    * sources is monotone down the funnel while a single source can
    * gain or lose share (the keeper of a cross-source duplicate group
    * attributes to the KEEPER's source — real provenance semantics).
    *
    * This corpus has zero exact-duplicate documents, so the entry
    * re-delivers clones with [[plantedReDelivery]]'s deterministic rule
    * (the exactIncremental precedent) — the oracle replants identically
    * and every stage of the funnel is exercised.
    *
    * Scale shape: stage survivor sets are id-only frames; the flags
    * join back to the corpus on doc_id (three co-partitioned equi-joins
    * after one shuffle) and collapse map-side to the SOURCE vocabulary
    * — output rows = #sources at any corpus size. The stages themselves
    * carry their own documented contracts (hash-agg exact, blocked
    * pair join, pointer-doubling components, gated anti-join).
    */
  def yieldReport(spark: SparkSession, dir: String,
                  threshold: Double = 0.3,
                  minQuality: Double = 0.5): DataFrame = {
    val raw = parallelize(docs(spark, dir))
      .select(col("doc_id"), col("text"), col("source"))
    val planted = plantedReDelivery(raw.select(col("doc_id"), col("text")))
    val exactKeepIds = planted
      .groupBy(md5Fingerprint(col("text")).as("fp"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    val survivors = planted.join(exactKeepIds, Seq("doc_id"), "left_semi")
    val pairs = ngramJaccardFrame(survivors, threshold)
      .select(col("doc_a"), col("doc_b"))
    val nearKeptIds = pipelineOverPairs(survivors.select(col("doc_id")), pairs)
      .select(col("doc_id"))
    val qualIds = nearKeptIds
      .join(TextAnalysis.qualityFrame(planted)
        .select(col("doc_id"), col("quality_score")), "doc_id")
      .where(col("quality_score") >= minQuality)
      .select(col("doc_id"))
    raw.select(col("doc_id"), col("source"))
      .join(exactKeepIds.withColumn("e", lit(1L)), Seq("doc_id"), "left")
      .join(nearKeptIds.withColumn("nd", lit(1L)), Seq("doc_id"), "left")
      .join(qualIds.withColumn("q", lit(1L)), Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(coalesce(col("e"), lit(0L))).as("n_after_exact"),
        sum(coalesce(col("nd"), lit(0L))).as("n_after_neardup"),
        sum(coalesce(col("q"), lit(0L))).as("n_after_quality"))
  }
}
