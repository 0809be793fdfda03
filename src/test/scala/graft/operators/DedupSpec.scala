package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {

  test("exact dedup covers every document exactly once") {
    val out = Dedup.exact(spark, sfDir)
    val nDocs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    assert(out.agg(sum("n_docs")).collect()(0).getLong(0) == nDocs)
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
    def pairs(salt: Int) =
      Dedup.minhashLshFrame(frame, salt = salt)
        .select("doc_a", "doc_b", "jaccard").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val unsalted = pairs(1)
    val salted = pairs(4)
    // the clone cluster alone contributes C(30,2)+30 pairs
    assert(unsalted.size > 400)
    assert(salted == unsalted)
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

  test("embedding cosine pairs are label-blocked and thresholded") {
    val out = Dedup.embeddingCosine(spark, sfDir, threshold = 0.2).collect()
    assert(out.forall(r => r.getAs[Double]("cos") >= 0.2))
  }

  test("embedding LSH dedup recalls the label-blocked truth with equal cosines") {
    // truth = exhaustive within-label pairs; the LSH variant is global
    // (may legitimately find cross-label pairs on top), so assert
    // recall >= 0.9 of the truth set and cosine equality on the overlap.
    // With 2 planes x 12 bands, P(candidate | cos=t) =
    // 1 - (1 - (1 - acos(t)/pi)^2)^12 > 0.99 for t >= 0.2.
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
}
