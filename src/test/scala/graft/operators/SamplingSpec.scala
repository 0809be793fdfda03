package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {

  test("split assignment is deterministic, complete, and roughly proportional") {
    val a = Sampling.docSplit(spark, sfDir).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = Sampling.docSplit(spark, sfDir).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b)
    val n = a.size
    val train = a.values.count(_ == "train").toDouble / n
    val v = a.values.count(_ == "val").toDouble / n
    val test = a.values.count(_ == "test").toDouble / n
    assert(math.abs(train - 0.8) < 0.1, s"train=$train")
    assert(math.abs(v - 0.1) < 0.07, s"val=$v")
    assert(math.abs(test - 0.1) < 0.07, s"test=$test")
    assert(a.values.forall(Set("train", "val", "test")))
  }

  test("membership is content-stable: appending rows never reassigns existing ones") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val full = Sampling.sampleFraction(docs, col("doc_id"), 0.25)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val half = docs.where(col("doc_id") % 2 === 0)
    val sub = Sampling.sampleFraction(half, col("doc_id"), 0.25)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // the subset's sample is exactly the full sample restricted to it
    assert(sub == full.filter(_ % 2 == 0))
  }

  test("full-range thresholds: fraction 1.0 keeps every row, train+val=1.0 leaves no test") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    // n=256 has no 2-hex-char upper bound; must degenerate to TRUE
    assert(Sampling.sampleFraction(docs, col("doc_id"), 1.0).count() == docs.count())
    val splits = docs.select(
      Sampling.assignSplit(docs, col("doc_id"), trainPct = 0.5, valPct = 0.5).as("s"))
      .groupBy("s").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!splits.contains("test"), s"rows leaked to test: $splits")
    assert(splits.keySet == Set("train", "val"))
  }

  test("stratified sample keeps at most perLabel rows per label, deterministically") {
    val out = Sampling.stratifiedSample(spark, sfDir, perLabel = 5)
    val perLabel = out.groupBy("label").count().collect()
    assert(perLabel.nonEmpty)
    perLabel.foreach(r => assert(r.getLong(1) <= 5))
    val again = Sampling.stratifiedSample(spark, sfDir, perLabel = 5)
      .collect().map(_.toString).sorted
    assert(again.sameElements(out.collect().map(_.toString).sorted))
  }
}
