package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {

  test("exact dedup covers every document exactly once") {
    val out = Dedup.exact(spark, sfDir)
    val nDocs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    assert(out.agg(sum("n_docs")).collect()(0).getLong(0) == nDocs)
  }

  test("exactCensus reads the routing input: max group, group count, corpus size") {
    val r = Dedup.exactCensus(spark, sfDir).collect().head
    val groups = Dedup.exact(spark, sfDir).collect().map(_.getAs[Long]("n_docs"))
    assert(r.getAs[Long]("max_group") == groups.max)
    assert(r.getAs[Long]("n_groups") == groups.length.toLong)
    assert(r.getAs[Long]("n_docs") == groups.sum)
    assert(r.getAs[Long]("n_docs") ==
      spark.read.parquet(s"$sfDir/documents.parquet").count())
  }

  test("pipelineSubstring == exact keepers -> rewrite -> quality on the rewritten text") {
    // the composition witness: the pipeline must equal running the
    // gated stages by hand, and the quality column must score
    // clean_text (not the original) — a doc whose boilerplate is cut
    // changes score iff the stages are wired in the claimed order
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val keepers = d.join(Dedup.exact(spark, sfDir)
      .select(col("keeper").as("doc_id")), "doc_id")
    val rewritten = graft.operators.TextAnalysis.dedupRewriteFrame(keepers)
      .where(col("n_kept") > 0)
    val expected = rewritten
      .join(graft.operators.TextAnalysis.qualityFrame(
          rewritten.select(col("doc_id"), col("clean_text").as("text")))
        .select(col("doc_id"), col("quality_score")), "doc_id")
      .select(col("doc_id"), col("n_words"), col("n_kept"),
        col("quality_score"))
      .collect().map(_.toSeq).toSet
    val got = Dedup.pipelineSubstring(spark, sfDir)
      .collect().map(_.toSeq).toSet
    assert(got == expected)
    assert(got.nonEmpty)
    // at least one doc was actually cut (n_kept < n_words) — the
    // substring stage did real work on this corpus
    assert(got.exists(r => r(2).asInstanceOf[Long] < r(1).asInstanceOf[Long]))
  }

  test("minhash finds the planted near-dups and no self/reversed pairs") {
    val out = Dedup.minhashLsh(spark, sfDir).collect()
    assert(out.nonEmpty, "expected planted near-duplicates")
    assert(out.forall(r => r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b")))
    assert(out.forall(r => r.getAs[Double]("jaccard") >= 0.5))
  }

  test("minhash recalls all exhaustive word-jaccard pairs >= 0.85") {
    // same similarity measure (word 3-shingle jaccard); with 16 bands x 2
    // rows, P(miss | j>=0.85) = (1 - 0.85^2)^16 < 1e-8
    val mh = Dedup.minhashLsh(spark, sfDir, threshold = 0.85)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = Dedup.wordJaccardBlocked(spark, sfDir, threshold = 0.85)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty)
    assert(truth.subsetOf(mh), s"missed: ${truth.diff(mh)}")
  }

  test("sampled minhash verify: exact hash-sample of the full verified pairs") {
    import org.apache.spark.sql.functions.{pmod, xxhash64, col}
    val mod = 4
    val full = Dedup.minhashLsh(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // same deterministic pair-hash predicate as the operator, applied
    // to the FULL verified set
    import spark.implicits._
    val expected = full.toSeq.toDF("doc_a", "doc_b")
      .where(pmod(xxhash64(col("doc_a"), col("doc_b")),
        org.apache.spark.sql.functions.lit(mod)) === 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val sampled = Dedup.minhashSampledVerify(docs, sampleMod = mod).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sampled == expected)
    assert(sampled.nonEmpty && sampled.size < full.size)
    // the one-action stats agree with the frame counts
    val (s, v) = Dedup.minhashSampleVerifyStats(spark, sfDir, mod)
    assert(v == sampled.size.toLong)
    assert(s >= v)
    // unsampled candidates vastly outnumber the 1-in-mod sample
    assert(Dedup.minhashCandidates(spark, sfDir).count() > s)
  }

  test("salted minhash returns exactly the unsalted pairs, even with a planted skew cluster") {
    // plant a pathological duplicate cluster: one doc replicated 30x —
    // its band buckets would funnel O(c^2) pairs through single tasks
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val seed = docs.orderBy("doc_id").limit(1).collect()(0)
    import spark.implicits._
    val clones = (1 to 30)
      .map(i => (1000000L + i, seed.getString(1))).toDF("doc_id", "text")
    val frame = docs.union(clones)
    // hotMin = 8 < cluster size 31: the clone buckets genuinely take the
    // salted path (default 128 would leave this cluster unsalted)
    def pairs(salt: Int) =
      Dedup.minhashLshFrame(frame, salt = salt, hotMin = 8)
        .select("doc_a", "doc_b", "jaccard").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val unsalted = pairs(1)
    val salted = pairs(4)
    // the clone cluster alone contributes C(30,2)+30 pairs
    assert(unsalted.size > 400)
    assert(salted == unsalted)
  }

  test("collapsed minhash equals the direct path pair-for-pair on a planted giant cluster") {
    // the census-routed boilerplate plan: a 40-member exact-duplicate
    // cluster plus two smaller ones — the regime where direct verify
    // pays O(c^2) kernel calls per cluster and the collapse pays one
    // per representative pair
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val seeds = docs.orderBy("doc_id").limit(3).collect()
    import spark.implicits._
    val clones = ((1 to 40).map(i => (1000000L + i, seeds(0).getString(1))) ++
      (1 to 5).map(i => (2000000L + i, seeds(1).getString(1))) ++
      (1 to 3).map(i => (3000000L + i, seeds(2).getString(1))))
      .toDF("doc_id", "text")
    val frame = docs.union(clones)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_a", "doc_b", "jaccard").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val direct = key(Dedup.minhashLshFrame(frame))
    val collapsed = key(Dedup.minhashLshCollapsed(frame))
    // the giant cluster alone contributes C(41,2) intra pairs
    assert(direct.size > 800)
    assert(collapsed == direct)
    // and the census gate routes this frame through the collapse
    assert(41L >= Dedup.CollapseMinGroup)
  }

  test("incremental minhash equals the full run restricted to delta-involving pairs") {
    val mod = 10
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_a", "doc_b", "jaccard").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val inc = key(Dedup.minhashIncremental(spark, sfDir, deltaMod = mod))
    val frame = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val full = key(Dedup.minhashLshFrame(frame))
    val restricted = full.filter(p => p._1 % mod == 0 || p._2 % mod == 0)
    assert(restricted.nonEmpty, "delta shard produced no pairs; the spec proves nothing")
    assert(inc == restricted)
  }

  test("incremental minhash exercises both probe legs on a planted delta shard") {
    // clones of one seed land on BOTH sides of the split: two delta ids
    // (1000000, 2000000) and one index id (1000001) — so the contract
    // needs delta×index (clone↔clone across the split, clone↔seed) AND
    // delta×delta (the two delta clones)
    val mod = 10
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val seed = docs.orderBy("doc_id").limit(1).collect()(0)
    import spark.implicits._
    val clones = Seq(1000000L, 2000000L, 1000001L)
      .map(i => (i, seed.getString(1))).toDF("doc_id", "text")
    val frame = docs.union(clones)
    val idxBands = Dedup.bandFrame(
      frame.where(col("doc_id") % mod =!= 0), 32, 16)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_a", "doc_b", "jaccard").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val inc = key(Dedup.minhashIncrementalFrame(frame, idxBands,
      32, 16, 0.5, mod, broadcastVerify = true))
    val restricted = key(Dedup.minhashLshFrame(frame))
      .filter(p => p._1 % mod == 0 || p._2 % mod == 0)
    assert(inc == restricted)
    assert(restricted.exists(p => p._1 % mod != 0 || p._2 % mod != 0))
    assert(restricted.exists(p => p._1 % mod == 0 && p._2 % mod == 0))
    // the shuffle-hash fallback is pair-identical (beyond-memory posture)
    val incShj = key(Dedup.minhashIncrementalFrame(frame, idxBands,
      32, 16, 0.5, mod, broadcastVerify = false))
    assert(incShj == restricted)
  }

  test("incremental embedding LSH equals the full run restricted to delta pairs") {
    val mod = 10
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("vec_a", "vec_b", "cos").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // the comparator is the FULL entry the incremental replaces —
    // identical corpus (planted frame), threshold, sized plan
    val inc = key(Dedup.embeddingLshIncremental(spark, sfDir, deltaMod = mod))
    val restricted = key(Dedup.embeddingNearDup(spark, sfDir))
      .filter(p => p._1 % mod == 0 || p._2 % mod == 0)
    assert(restricted.nonEmpty, "delta shard produced no pairs; the spec proves nothing")
    assert(inc == restricted)
  }

  test("incremental embedding LSH covers both probe legs on a planted split") {
    val mod = 10
    val raw = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("label"), col("embedding"))
    val seed = raw.orderBy("vec_id").limit(1).collect()(0)
    import spark.implicits._
    // two delta clones + one index clone of one seed vector: the
    // contract needs delta×index AND delta×delta
    val clones = Seq(1000000L, 2000000L, 1000001L)
      .map(i => (i, seed.getInt(1), seed.getSeq[Float](2)))
      .toDF("vec_id", "label", "embedding")
    val e = raw.union(clones)
      .select(col("vec_id"), col("label"), col("embedding").as("v"))
      .withColumn("nrm", sqrt(call_function("graft_dot", col("v"), col("v"))))
    val (rpb, bands) = Dedup.lshPlan(0.35)
    val idxBands = Dedup.embBandFrame(e.where(col("vec_id") % mod =!= 0), rpb, bands)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("vec_a", "vec_b", "cos").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val restricted = key(Dedup.embeddingCosineLshFrame(e, 0.35))
      .filter(p => p._1 % mod == 0 || p._2 % mod == 0)
    val inc = key(Dedup.embeddingLshIncrementalFrame(e, idxBands,
      rpb, bands, 0.35, mod, broadcastVerify = true))
    assert(inc == restricted)
    assert(restricted.exists(p => p._1 % mod != 0 || p._2 % mod != 0))
    assert(restricted.exists(p => p._1 % mod == 0 && p._2 % mod == 0))
    // shuffle-hash verify fallback is pair-identical
    val incShj = key(Dedup.embeddingLshIncrementalFrame(e, idxBands,
      rpb, bands, 0.35, mod, broadcastVerify = false))
    assert(incShj == restricted)
  }

  test("simhash emits one 64-bit signature per doc") {
    val out = Dedup.simhash(spark, sfDir)
    assert(out.count() == spark.read.parquet(s"$sfDir/documents.parquet").count())
    assert(out.where(col("simhash") === 0L).count() < out.count())
  }

  test("simhash pairs at generous hamming include near-identical docs") {
    val pairs = Dedup.simhashPairs(spark, sfDir, hamMax = 10)
    assert(pairs.where(col("doc_a") >= col("doc_b")).count() == 0)
  }

  test("routed simhash pairs equal the direct classic path across all plans") {
    // the round-12 plan matrix: census-routed collapse (identical-hash
    // groups) × corpus-sized banding (classic 4×16 vs wide 10×~26-bit
    // two-sub-band keys) — every route must emit the exact
    // Hamming-≤-hamMax pair set the classic direct plan emits.
    // Planted: a 40-member exact-duplicate cluster (collapse regime)
    // plus two smaller ones, the minhash-collapse spec's corpus.
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val seeds = docs.orderBy("doc_id").limit(3).collect()
    import spark.implicits._
    val clones = ((1 to 40).map(i => (1000000L + i, seeds(0).getString(1))) ++
      (1 to 5).map(i => (2000000L + i, seeds(1).getString(1))) ++
      (1 to 3).map(i => (3000000L + i, seeds(2).getString(1))))
      .toDF("doc_id", "text")
    val frame = docs.union(clones)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_a", "doc_b", "hamming").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val hashed = Dedup.simhashFrame(frame)
    val direct = key(
      Dedup.simhashCandFrame(frame).where(col("hamming") <= 3))
    // the giant cluster alone contributes C(41,2) intra pairs
    assert(direct.size > 800)
    // wide banding, direct: different candidate generator, same pairs
    assert(key(Dedup.simhashCandFrame(frame, wide = true)
      .where(col("hamming") <= 3)) == direct)
    // collapsed, both bandings
    assert(key(Dedup.simhashPairsCollapsed(hashed, 3, wide = false)) == direct)
    assert(key(Dedup.simhashPairsCollapsed(hashed, 3, wide = true)) == direct)
    // routing gates: this frame stays DIRECT (the simhash collapse is
    // the hot-bucket guard at 1024, not minhash's verify-cost gate at
    // 3 — simhash verify is one bit_count), and the production entry
    // point still matches whichever route the census picks
    val (maxGroup, _, _) = Dedup.simhashCensus(hashed)
    assert(maxGroup >= 40L && maxGroup < Dedup.SimhashCollapseMinGroup)
    assert(key(Dedup.simhashPairsFrame(frame)) == direct)
  }

  test("wide banding is a complete candidate generator at hamming 3 exactly") {
    // adversarial hash layout: 3 flipped bits placed to dirty three
    // DIFFERENT 13-bit sub-bands (bits 0, 13, 26) — the wide scheme
    // must still catch the pair through a clean two-sub-band key, and
    // the classic scheme through its clean 16-bit band
    import spark.implicits._
    val h = 0x123456789abcdefL
    val flipped = h ^ (1L << 0) ^ (1L << 13) ^ (1L << 26)
    val hashed = Seq((1L, h), (2L, flipped)).toDF("doc_id", "simhash")
    def pairs(wide: Boolean) =
      Dedup.hammingCandFrame(hashed, "doc_id", "simhash", wide)
        .where(col("hamming") <= 3).count()
    assert(pairs(wide = false) == 1L)
    assert(pairs(wide = true) == 1L)
  }

  test("simhashIncremental equals the full pairs restricted to delta-involving") {
    // generous hamming so the equality is exercised on real pairs here
    val inc = Dedup.simhashIncremental(spark, sfDir, hamMax = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val full = Dedup.simhashPairs(spark, sfDir, hamMax = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(full.nonEmpty)
    val expected = full.filter(p => p._1 % 10 == 0 || p._2 % 10 == 0)
    assert(inc == expected, s"inc=$inc expected=$expected")
    // the persisted index holds ONLY base docs, and base ∪ delta is
    // the whole corpus
    val idx = spark.read.parquet(Dedup.ensureSimhashIndex(spark, sfDir))
    assert(idx.where(col("doc_id") % 10 === 0).count() == 0)
    val nDocs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    val nDelta = spark.read.parquet(s"$sfDir/documents.parquet")
      .where(col("doc_id") % 10 === 0).count()
    assert(idx.count() + nDelta == nDocs)
  }

  test("embedding cosine pairs are label-blocked and thresholded") {
    val out = Dedup.embeddingCosine(spark, sfDir, threshold = 0.2).collect()
    assert(out.forall(r => r.getAs[Double]("cos") >= 0.2))
  }

  test("embedding LSH dedup recalls the label-blocked truth with equal cosines") {
    // truth = exhaustive within-label pairs; the LSH variant is global
    // (may legitimately find cross-label pairs on top), so assert
    // recall >= 0.9 of the truth set and cosine equality on the overlap.
    // Banding is planned by lshPlan for P(candidate | cos=t) >= 0.98.
    val t = 0.2
    val truth = Dedup.embeddingCosine(spark, sfDir, threshold = t).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val lsh = Dedup.embeddingCosineLsh(spark, sfDir, threshold = t).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(truth.nonEmpty)
    val hit = truth.keySet.intersect(lsh.keySet)
    assert(hit.size >= math.ceil(truth.size * 0.9).toInt,
      s"recall ${hit.size}/${truth.size}; missed ${truth.keySet.diff(lsh.keySet)}")
    hit.foreach(k => assert(truth(k) == lsh(k), s"cos mismatch on $k"))
    assert(lsh.values.forall(_ >= t))
  }

  test("lshPlan meets the recall target within the plane budget, at pruning depth") {
    for (t <- Seq(0.2, 0.35, 0.6, 0.8, 0.9, 0.95); r <- Seq(0.95, 0.98)) {
      val (b, n) = Dedup.lshPlan(t, r)
      val p = 1.0 - math.acos(t) / math.Pi
      val recall = 1.0 - math.pow(1.0 - math.pow(p, b), n)
      assert(recall >= r, s"t=$t r=$r plan=($b,$n) recall=$recall")
      assert(b.toLong * n <= 192, s"t=$t plan=($b,$n) exceeds budget")
    }
    // near-dup thresholds must get deep (pruning) bands: a random pair
    // passes a band with prob 2^-b, so b >= 8 means <= 0.4% per band
    assert(Dedup.lshPlan(0.9)._1 >= 8)
    assert(Dedup.lshPlan(0.95)._1 >= 10)
  }

  test("planted near-dups: LSH at t=0.9 recalls the exhaustive truth and prunes") {
    val frame = Dedup.withPlantedNearDups(spark, sfDir)
    val truth = Dedup.embeddingCosineFrame(frame, threshold = 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val n = spark.read.parquet(s"$sfDir/embeddings.parquet").count()
    // one planted clone per vector at cos ~0.95: the truth set is ~n pairs
    assert(truth.size >= n * 0.95, s"planted pairs missing: ${truth.size} of $n")
    val lsh = Dedup.embeddingNearDup(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val hit = truth.keySet.intersect(lsh.keySet)
    assert(hit.size >= math.ceil(truth.size * 0.95).toInt,
      s"recall ${hit.size}/${truth.size}")
    hit.foreach(k => assert(truth(k) == lsh(k), s"cos mismatch on $k"))
    assert(lsh.values.forall(_ >= 0.9))
  }

  test("semantic dedup (SemDeDup) drops planted clones in-cluster, keeps a representative") {
    val frame = Dedup.withPlantedNearDups(spark, sfDir)
    val out = Dedup.semanticFrame(frame, nlist = 8, iters = 2, threshold = 0.9)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(out.size == frame.count())
    val maxId = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .agg(org.apache.spark.sql.functions.max(
        org.apache.spark.sql.functions.col("vec_id"))).head().getLong(0)
    val offset = Dedup.cloneOffset(maxId)
    val (clones, originals) = out.partition(_._1 >= offset)
    assert(clones.nonEmpty && originals.nonEmpty)
    // a clone sits at cos ~0.95 to its original: same k-means cell except
    // within ε of a boundary, and the min-id rule keeps the original
    val cloneDropRate = clones.count(!_._2._2).toDouble / clones.size
    assert(cloneDropRate >= 0.8, s"clone drop rate $cloneDropRate")
    val origKeepRate = originals.count(_._2._2).toDouble / originals.size
    assert(origKeepRate >= 0.95, s"original keep rate $origKeepRate")
    // no cluster is emptied: at least one keeper per occupied cell
    val keptCells = out.values.filter(_._2).map(_._1).toSet
    assert(out.values.map(_._1).toSet == keptCells)
    // deterministic end-to-end (init, Lloyd, assignment, pruning)
    val again = Dedup.semanticFrame(frame, nlist = 8, iters = 2, threshold = 0.9)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(again == out)
  }

  test("nlistSized tracks sqrt(n) within the floor/cap, so pairs/cell stay bounded") {
    assert(Dedup.nlistSized(0) == 16)
    assert(Dedup.nlistSized(100) == 16)           // floor
    assert(Dedup.nlistSized(500) == 22)
    assert(Dedup.nlistSized(2000) == 45)
    assert(Dedup.nlistSized(200000) == 447)
    assert(Dedup.nlistSized(20000000000L) == 65536) // cap
    // the scale invariant the sizing exists for: intra-cell pair cost
    // n²/nlist grows ~n^1.5, i.e. a 100× corpus costs ~1000× the pairs,
    // not 10000× — check the implied ratio stays sub-quadratic
    val small = 2000.0 * 2000.0 / Dedup.nlistSized(2000)
    val big = 200000.0 * 200000.0 / Dedup.nlistSized(200000)
    assert(big / small < 1200, s"pair-cost ratio ${big / small} not ~n^1.5")
    // the production entry derives its nlist from the corpus (smoke:
    // stats reflect the sized cell count and a bounded max cell)
    val (nlist, cells, maxC, pairs) = Dedup.semanticStats(spark, sfDir)
    val n = spark.read.parquet(s"$sfDir/embeddings.parquet").count()
    assert(nlist == Dedup.nlistSized(n))
    assert(cells >= 1 && cells <= nlist)
    assert(maxC >= 1 && pairs >= 0)
  }

  test("embedding LSH fetches candidate payloads via broadcast joins") {
    // the candidate-payload joins must not fall to sort-merge: SMJ
    // sorts an intermediate that carries a vector per row (measured
    // 10-30x slower and spill-prone at 10x scale)
    val plan = Dedup.embeddingNearDup(spark, sfDir)
      .queryExecution.executedPlan.toString
    val broadcasts = "BroadcastHashJoin".r.findAllIn(plan).length
    assert(broadcasts >= 2, s"expected >=2 broadcast payload joins, got $broadcasts")
  }

  test("salted embedding LSH returns exactly the unsalted pairs") {
    val frame = Dedup.withPlantedNearDups(spark, sfDir)
    // hotMin = 2: every bucket with any pair potential is "hot", the
    // strongest parity stress for the salted path
    def pairs(salt: Int) =
      Dedup.embeddingCosineLshFrame(frame, threshold = 0.9, salt = salt,
        hotMin = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val unsalted = pairs(1)
    assert(unsalted.nonEmpty)
    assert(pairs(4) == unsalted)
  }

  test("cluster-size census partitions the paired docs; every cluster has >= 2 members") {
    val hist = Dedup.clusterSizeHist(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    assert(hist.nonEmpty)
    // clusters only exist over PAIRED documents, so no singleton rows
    hist.foreach { case (size, n) => assert(size >= 2 && n >= 1) }
    // the census is a partition of the labeled set: sizes weighted by
    // cluster counts must re-total the member rows exactly
    val members = Dedup.cluster(spark, sfDir).count()
    assert(hist.map { case (size, n) => size * n }.sum == members)
  }

  test("clusterPairs tuned routes (fold-init, broadcast jump) are row-identical to the baseline loop") {
    import org.apache.spark.sql.functions._
    // adversarial graph: a 60-node chain (forces many propagation
    // rounds), a 6-clique sharing its minimum with nothing, and one
    // isolated pair — ids interleaved so the minimum is not positional
    val chain = (0 until 59).map(i => (100L + i, 101L + i))
    val clique = for (a <- 0 until 6; b <- (a + 1) until 6) yield (10L + a, 10L + b)
    val lone = Seq((7L, 3L))
    val pairs = spark.createDataFrame(chain ++ clique ++ lone)
      .toDF("doc_a", "doc_b")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toSet
    val baseline = rows(Dedup.clusterPairsTuned(pairs, 40,
      foldInit = false, broadcastJumpMaxRows = 0L,
      localContraction = false))
    val baseRounds = Dedup.lastClusterRounds
    // the uncontracted tuned loop (r12's production route) …
    val uncontracted = rows(Dedup.clusterPairsTuned(pairs, 40,
      localContraction = false))
    assert(uncontracted == baseline,
      "uncontracted tuned routes changed the component labeling")
    // … the default route on a tiny graph (size-gated: stays
    // uncontracted below ClusterContractionMinPairs) …
    assert(rows(Dedup.clusterPairs(pairs)) == baseline,
      "default route changed the component labeling")
    // … and the r13 contraction route, forced on via the gate knob:
    // partition-local union-find feeding the same loop. The chain is
    // the adversarial case — edges scattered across partitions force
    // boundary-graph stitching, while whatever lands together must
    // collapse locally.
    val tuned = rows(Dedup.clusterPairsTuned(pairs, 40,
      contractionMinPairs = 0L))
    val tunedRounds = Dedup.lastClusterRounds
    assert(tuned == baseline, "tuned routes changed the component labeling")
    // contraction runs the loop on the boundary graph: never more
    // rounds than the uncontracted baseline (fold-init alone already
    // guaranteed ≤)
    assert(tunedRounds <= baseRounds,
      s"contracted loop took MORE rounds ($tunedRounds > $baseRounds)")
    // the loop must have run on a CONTRACTED node set: strictly fewer
    // loop nodes than the 68 distinct paired docs (60-chain + 6-clique
    // + pair), however the 2 local-mode partitions split the edges
    assert(Dedup.lastClusterNodes >= 0 && Dedup.lastClusterNodes < 68,
      s"contraction did not shrink the loop (${Dedup.lastClusterNodes} nodes)")
    // sanity on the labeling itself: chain is ONE component rooted at
    // its min, the clique at 10, the pair at 3
    val byCluster = tuned.groupBy(_._2)
    assert(byCluster(100L).size == 60 && byCluster(10L).size == 6 &&
      byCluster(3L).size == 2)
    tuned.foreach { case (id, cid, size, keeper) =>
      assert(keeper == (id == cid) && size == byCluster(cid).size)
    }
  }

  test("quality keeper keeps the best-scoring member of every cluster, same kept count") {
    val quality = Dedup.pipelineQuality(spark, sfDir)
    // same partition of the corpus as the canonical keeper over the SAME
    // pair set: one keeper per cluster + singletons — only the CHOICE of
    // keeper differs, never the kept-corpus size
    assert(quality.count() == Dedup.pipelineOverPairs(
      spark.read.parquet(s"$sfDir/documents.parquet").select(org.apache.spark.sql.functions.col("doc_id")),
      Dedup.ngramJaccard(spark, sfDir, 0.3)).count())
    // every kept doc carries the MAX quality score of its cluster
    val clusters = Dedup.cluster(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap // doc_id -> cluster_id
    val scores = graft.operators.TextAnalysis.quality(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("quality_score")).toMap
    val bestByCluster = clusters.groupBy(_._2).view
      .mapValues(_.keys.map(scores).max).toMap
    val keptPaired = quality.collect()
      .map(r => (r.getLong(0), r.getAs[Double]("quality_score")))
      .filter(k => clusters.contains(k._1))
    assert(keptPaired.nonEmpty)
    keptPaired.foreach { case (id, s) =>
      assert(s == bestByCluster(clusters(id)), s"doc $id is not the best of its cluster")
    }
  }

  test("exactIncremental: brute delta recompute; covers base-dup, delta-dup, novel") {
    import org.apache.spark.sql.functions._
    val out = Dedup.exactIncremental(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getBoolean(2)))).toMap
    assert(out.nonEmpty)
    // brute: replant the deterministic re-delivery corpus, then the
    // exact canonicalization chain
    val raw = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val byId = raw.toMap
    val fps = raw.map { case (id, own) =>
      val text =
        if (id % 100 == 90) byId.getOrElse(id - 50, own)
        else if (id % 7 == 3) byId.getOrElse(id - 3, own)
        else own
      (id, java.security.MessageDigest.getInstance("MD5")
        .digest(text.toLowerCase.replaceAll("\\s+", " ").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString)
    }
    val baseFps = fps.filter(_._1 % 10 != 0).map(_._2).toSet
    val delta = fps.filter(_._1 % 10 == 0)
    assert(out.keySet == delta.map(_._1).toSet)
    val keeper = delta.groupBy(_._2).view.mapValues(_.map(_._1).min).toMap
    delta.foreach { case (id, fp) =>
      val inBase = baseFps.contains(fp)
      val kept = !inBase && keeper(fp) == id
      assert(out(id) == ((inBase, kept)), s"delta doc $id mismatch")
    }
    // all three regimes must occur or the contract is under-tested
    assert(out.values.exists(_._1), "no delta doc duplicates the base; vacuous")
    assert(out.values.exists(v => !v._1 && v._2), "no novel keeper; vacuous")
    assert(out.values.exists(v => !v._1 && !v._2) ||
      delta.groupBy(_._2).values.forall(_.size == 1),
      "no intra-delta duplicate and none expected")
  }

  test("keepersWeighted: weights conserve corpus mass; keepers are cluster minima") {
    import org.apache.spark.sql.functions._
    val out = Dedup.keepersWeighted(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nDocs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    // THE invariant: reweighted training sees the original distribution
    assert(out.values.sum == nDocs, "sum of weights must equal the corpus size")
    val clusters = Dedup.cluster(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val byCluster = clusters.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    byCluster.foreach { case (_, members) =>
      val keeper = members.min
      assert(out.contains(keeper) && out(keeper) == members.length.toLong,
        s"keeper $keeper must carry its cluster size")
      members.filter(_ != keeper).foreach(m =>
        assert(!out.contains(m), s"non-keeper $m must not survive"))
    }
    // unpaired docs keep themselves at weight 1
    val paired = clusters.map(_._1).toSet
    out.filterNot(kv => paired.contains(kv._1)).values.foreach(w => assert(w == 1L))
    assert(out.size == nDocs - paired.size + byCluster.size)
  }

  test("minhashCalibration: estimates are 1/32-grained and track exact jaccard") {
    val out = Dedup.minhashCalibration(spark, sfDir).collect()
      .map(r => (r.getDouble(2), r.getDouble(3), r.getBoolean(4)))
    assert(out.nonEmpty)
    out.foreach { case (j, est, band) =>
      assert(j >= 0.5, "only verified pairs are calibrated")
      // est is an integer count of 32 matching positions
      val cnt = est * 32
      assert(math.abs(cnt - math.round(cnt)) < 1e-9 && est >= 0 && est <= 1)
      assert(band == (math.abs(est - j) <= 0.35))
    }
    // the estimator genuinely tracks truth: mean |err| within ~1.5x
    // the binomial bound sqrt(J(1-J)/32) <= 0.0884
    val meanErr = out.map(t => math.abs(t._2 - t._1)).sum / out.length
    assert(meanErr <= 0.13, s"mean |est - true| = $meanErr")
    // band violations are the rare tail, not the norm
    assert(out.count(_._3).toDouble / out.length >= 0.9)
  }

  test("yieldReport: monotone funnel totals, exact stage equals fingerprint census") {
    // minQuality 0.8: at sf0.001 every near-dup survivor clears the
    // default 0.5, which would leave the last stage vacuous here
    val out = Dedup.yieldReport(spark, sfDir, minQuality = 0.8).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    assert(out.nonEmpty)
    val corpus = spark.read.parquet(s"$sfDir/documents.parquet")
    // per-source doc counts match the corpus
    val bySrc = corpus.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.keySet == bySrc.keySet)
    out.foreach { case (s, (n, _, _, _)) => assert(n == bySrc(s)) }
    // funnel totals are monotone and every stage drops something here:
    // the planting guarantees exact drops, the corpus has near-dups,
    // and the quality gate is not vacuous
    val (tN, tE, tD, tQ) = out.values.foldLeft((0L, 0L, 0L, 0L)) {
      case ((a, b, c, d), (n, e, nd, q)) => (a + n, b + e, c + nd, d + q)
    }
    assert(tN > tE && tE > tD && tD > tQ,
      s"funnel $tN -> $tE -> $tD -> $tQ must strictly drop at each stage")
    // the exact stage total is the planted corpus's fingerprint census,
    // recomputed here with the same re-delivery rule
    val d0 = corpus.select(col("doc_id"), col("text"))
    val srcId = when(col("doc_id") % 100 === 90, col("doc_id") - 50)
      .when(col("doc_id") % 7 === 3, col("doc_id") - 3)
    val planted = d0.select(col("doc_id"), srcId.as("src"), col("text").as("own"))
      .join(d0.select(col("doc_id").as("src"), col("text").as("st")), Seq("src"), "left")
      .select(col("doc_id"), coalesce(col("st"), col("own")).as("text"))
    val nFp = planted
      .select(md5(regexp_replace(lower(col("text")), "\\s+", " ")).as("fp"))
      .distinct().count()
    assert(tE == nFp, s"exact survivors $tE != distinct fingerprints $nFp")
  }
}
