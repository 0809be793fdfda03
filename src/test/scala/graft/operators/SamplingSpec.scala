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

  test("sequence packing: per-source chunk layout is gapless, ordered, budget-exact") {
    val budget = 64L
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val out = Sampling.packSequences(docs, budget).collect()
    assert(out.length.toLong == docs.count())
    val bySource = out.groupBy(_.getAs[String]("source"))
    bySource.foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("doc_id"))
      var cum = 0L
      sorted.foreach { r =>
        val n = r.getAs[Long]("n_tokens")
        // offsets and seq ids are exactly the running concat-and-chunk
        assert(r.getAs[Long]("seq_offset") == cum % budget)
        assert(r.getAs[Long]("seq_first") == cum / budget)
        assert(r.getAs[Long]("seq_last") == math.max((cum + n - 1) / budget, cum / budget))
        // a doc spans exactly the sequences its token range covers
        assert(r.getAs[Long]("seq_last") >= r.getAs[Long]("seq_first"))
        cum += n
      }
      // every sequence number up to the last is fed by some document
      val fed = sorted.flatMap(r =>
        r.getAs[Long]("seq_first") to r.getAs[Long]("seq_last")).toSet
      assert(fed == (0L to (cum - 1) / budget).toSet)
    }
    // packing is per-source: a single-source restriction reproduces its layout
    val src = out.head.getAs[String]("source")
    val only = Sampling.packSequences(docs.where(col("source") === src), budget)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("seq_first"), r.getAs[Long]("seq_offset"))).toMap
    bySource(src).foreach { r =>
      assert(only(r.getAs[Long]("doc_id")) ==
        (r.getAs[Long]("seq_first"), r.getAs[Long]("seq_offset")))
    }
    // the shard key travels with the output; at the default grain it
    // equals the source, so (shard, seq_no) is the sequence identity
    assert(out.forall(r => r.getAs[String]("shard") == r.getAs[String]("source")))
    // finer shard grain (source × doc_id-range): still one row per doc,
    // and every shard's first document starts a fresh sequence at 0
    val sub = Sampling.packSequences(docs, budget,
      shardCol = concat(col("source"), lit("/"), expr("doc_id div 64")))
      .collect()
    assert(sub.length == out.length)
    val firstPerShard = docs.select(col("doc_id"), col("source"))
      .collect().map(r => (r.getString(1), r.getLong(0)))
      .groupBy { case (s2, id) => (s2, id / 64) }.values.map(_.map(_._2).min).toSet
    sub.filter(r => firstPerShard.contains(r.getAs[Long]("doc_id"))).foreach { r =>
      assert(r.getAs[Long]("seq_first") == 0L && r.getAs[Long]("seq_offset") == 0L)
    }
    // composite-grain shard values disambiguate sequence numbering:
    // (source, seq_first) collides across sub-shards, (shard, seq_first)
    // never does — the shard column is what keeps packing metadata
    // consumable by downstream token assembly at any grain
    assert(sub.forall(r => r.getAs[String]("shard") ==
      s"${r.getAs[String]("source")}/${r.getAs[Long]("doc_id") / 64}"))
    val perSeq = sub.groupBy(r =>
      (r.getAs[String]("shard"), r.getAs[Long]("seq_first")))
    perSeq.foreach { case ((_, _), rows) =>
      assert(rows.map(_.getAs[Long]("seq_offset")).distinct.length == rows.length)
    }
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

  test("weighted sample keeps per-row bucket < weight threshold; extremes behave") {
    import spark.implicits._
    // weights 0 and 1 are exact: never / always kept
    val ext = Seq((1L, 0.0), (2L, 1.0), (3L, 1.0), (4L, 0.0))
      .toDF("doc_id", "w")
    val kept = Sampling.weightedSample(ext, col("doc_id"), col("w"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 3L))
    // realized rate over many rows tracks a constant weight (±bucket
    // quantization + hash variance), and membership is deterministic
    val many = (0L until 2000L).map(i => (i, 0.3)).toDF("doc_id", "w")
    val r1 = Sampling.weightedSample(many, col("doc_id"), col("w"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val r2 = Sampling.weightedSample(many, col("doc_id"), col("w"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(r1 == r2)
    val rate = r1.size.toDouble / 2000
    assert(math.abs(rate - 0.3) < 0.05, s"rate=$rate")
    // a row's keep decision depends only on (key, weight): restriction
    // to a sub-corpus never flips membership (append stability)
    val sub = Sampling.weightedSample(many.where(col("doc_id") % 2 === 0),
      col("doc_id"), col("w")).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(sub == r1.filter(_ % 2 == 0))
    // the rounding-overflow edge: a weight within half a bucket of 1.0
    // rounds to bucket 256, whose 3-char hex threshold would
    // lpad-TRUNCATE to "10" and keep ~6% — the keep-all guard must
    // catch it before the string compare does
    val near1 = (0L until 500L).map(i => (i, 0.999)).toDF("doc_id", "w")
    assert(Sampling.weightedSample(near1, col("doc_id"), col("w")).count() == 500L,
      "weight that rounds to bucket 256 must keep everything")
  }

  test("balanced sample keeps exactly the minority-class count per label") {
    val out = Sampling.balancedSample(spark, sfDir)
    val minN = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .groupBy("label").count().collect().map(_.getLong(1)).min
    val perLabel = out.groupBy("label").count().collect()
      .map(r => r.get(0) -> r.getLong(1))
    assert(perLabel.nonEmpty)
    perLabel.foreach { case (l, n) =>
      assert(n == minN, s"label $l kept $n, expected $minN")
    }
    // deterministic: the same cut on a rerun
    val again = Sampling.balancedSample(spark, sfDir)
      .collect().map(_.toString).sorted
    assert(again.sameElements(out.collect().map(_.toString).sorted))
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

  test("source mix keeps each source at its own stable rate") {
    val out = Sampling.sourceMix(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(out.nonEmpty)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val total = docs.groupBy(_._2).view.mapValues(_.size.toDouble).toMap
    val kept = out.groupBy(_._2).view.mapValues(_.size.toDouble).toMap
    // src0 keeps everything; lower-rate sources keep roughly their rate
    assert(kept("src0") == total("src0"))
    assert(kept.getOrElse("src1", 0.0) < total("src1"))
    val r1 = kept.getOrElse("src1", 0.0) / total("src1")
    assert(r1 > 0.3 && r1 < 0.7, s"src1 rate $r1")
    // determinism + subset: rerun identical; every kept row exists
    val again = Sampling.sourceMix(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSet == again.toSet)
    assert(out.toSet.subsetOf(docs.toSet))
  }

  test("k-fold assignment is deterministic, complete, balanced, and in range") {
    val out = Sampling.docKfold(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = spark.read.parquet(s"$sfDir/documents.parquet").count()
    assert(out.size == n)
    assert(out.values.forall(f => f >= 0 && f < 5))
    val counts = out.values.groupBy(identity).view.mapValues(_.size)
    assert(counts.size == 5, s"empty fold: $counts")
    counts.values.foreach(c => assert(math.abs(c - n / 5.0) < n * 0.2,
      s"fold imbalance: $counts"))
    // re-run agrees (hash-based, not RNG-based)
    val again = Sampling.docKfold(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again == out)
  }

  test("curriculum tiers partition the corpus by quality; in-cell order is the md5 shuffle") {
    val out = Sampling.curriculum(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getString(3), r.getLong(4)))
    val n = spark.read.parquet(s"$sfDir/documents.parquet").count()
    assert(out.length == n)
    // tier is the quality band: floor(score*4) clamped to 3
    out.foreach { case (id, score, tier, _, _) =>
      val expect = math.min(math.floor(score * 4).toLong, 3L)
      assert(tier == expect, s"doc $id score $score tier $tier != $expect")
    }
    // positions are a clean 1..k ranking inside every (tier, shard) cell
    out.groupBy(t => (t._3, t._4)).foreach { case (cell, rows) =>
      assert(rows.map(_._5).sorted.sameElements(1L to rows.length),
        s"cell $cell has gapped positions")
    }
    // deterministic under re-run
    assert(Sampling.curriculum(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(4))).toSet ==
      out.map(t => (t._1, t._5)).toSet)
  }

  test("temperature mix keeps all of the smallest source and flattens the rest") {
    val out = Sampling.temperatureMix(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val totals = spark.read.parquet(s"$sfDir/documents.parquet")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val nMin = totals.values.min
    val kept = out.groupBy(_._2).view.mapValues(_.size.toDouble).toMap
    // smallest source keeps everything (rate 1.0); larger ones drop rows
    val smallest = totals.minBy(_._2)._1
    assert(kept(smallest) == totals(smallest).toDouble)
    assert(out.length < totals.values.sum, "temperature mix dropped nothing — degenerate key")
    // every source's rate column equals sqrt(n_min/n_src)
    out.groupBy(_._2).foreach { case (src, rows) =>
      val expect = math.sqrt(nMin.toDouble / totals(src).toDouble)
      assert(rows.forall(_._3 == expect), s"rate mismatch for $src")
      // realized keep rate within 25% of the target (256-bucket quantization)
      val realized = rows.size.toDouble / totals(src)
      assert(math.abs(realized - math.min(expect, 1.0)) < 0.25,
        s"$src realized $realized target $expect")
    }
    // determinism
    assert(Sampling.temperatureMix(spark, sfDir).collect()
      .map(r => r.getLong(0)).toSet == out.map(_._1).toSet)
  }

  test("temporal split is leakage-free: every train ts < every test ts") {
    val out = Sampling.temporalSplit(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val n = spark.read.parquet(s"$sfDir/events.parquet").count()
    assert(out.length == n)
    val train = out.filter(_._3 == "train").map(_._2)
    val test = out.filter(_._3 == "test").map(_._2)
    assert(train.nonEmpty && test.nonEmpty)
    assert(train.max < test.min, "train/test time ranges overlap")
    // the cut is the 4/5 point of the observed range in int64 arithmetic
    val lo = out.map(_._2).min; val hi = out.map(_._2).max
    val cut = lo + ((hi - lo) * 4) / 5
    assert(train.forall(_ < cut) && test.forall(_ >= cut))
    // deterministic under re-run
    val again = Sampling.temporalSplit(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(again.toSet == out.toSet)
  }

  test("decontamSplit: near-dup pairs never straddle splits; singletons match docSplit") {
    val out = Sampling.decontamSplit(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    assert(out.length == docs, "split must cover every document exactly once")
    val split = out.map(t => t._1 -> t._3).toMap
    // THE contract: both sides of every near-dup pair share a split
    val pairs = Dedup.ngramJaccard(spark, sfDir, 0.3)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "corpus has no near-dup pairs; spec is vacuous")
    pairs.foreach { case (a, b) =>
      assert(split(a) == split(b), s"pair ($a,$b) straddles ${split(a)}/${split(b)}")
    }
    // unpaired docs: group_id falls back to doc_id → same split as docSplit
    val paired = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    val plain = Sampling.docSplit(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    out.filterNot(t => paired.contains(t._1)).foreach { t =>
      assert(t._2 == t._1 && t._3 == plain(t._1))
    }
  }

  test("epochOrders rejects epochs < 1 with a contract error") {
    // ADVICE r10: the epoch union previously threw
    // UnsupportedOperationException (reduce on an empty range) —
    // callers get a clear require message instead
    val e = intercept[IllegalArgumentException] {
      Sampling.epochOrders(spark, sfDir, epochs = 0)
    }
    assert(e.getMessage.contains("epochs"))
  }

  test("epochOrders: every epoch is a full permutation; epochs genuinely differ") {
    import org.apache.spark.sql.functions._
    val out = Sampling.epochOrders(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val nDocs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    val byEpoch = out.groupBy(_._1)
    assert(byEpoch.keySet == Set(0L, 1L, 2L))
    byEpoch.foreach { case (e, rows) =>
      assert(rows.length.toLong == nDocs, s"epoch $e covers the corpus once")
      // positions are 1..k within each shard — a permutation, no gaps
      rows.groupBy(_._3).foreach { case (shard, sr) =>
        assert(sr.map(_._4).sorted.sameElements(1L to sr.length),
          s"epoch $e shard $shard positions")
      }
    }
    // different epochs order the same shard differently (salted hashes)
    def orderOf(e: Long): Seq[Long] = byEpoch(e)
      .sortBy(r => (r._3, r._4)).map(_._2).toSeq
    assert(orderOf(0L) != orderOf(1L) && orderOf(1L) != orderOf(2L))
    // and each epoch regenerates in isolation: epoch 1's order equals
    // a fresh shuffleOrder at the same salt
    val solo = Sampling.shuffleOrder(
        spark.read.parquet(s"$sfDir/documents.parquet"), col("doc_id"),
        salt = "graft-e1")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(solo == byEpoch(1L).map(r => (r._2, r._3, r._4)).toSet)
  }
}
