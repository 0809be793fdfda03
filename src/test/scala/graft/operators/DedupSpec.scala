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
}
