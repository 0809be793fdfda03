package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  test("blob frame carries binary payloads with stable sizes") {
    val blobs = Multimodal.blobFrame(spark, sfDir)
    assert(blobs.schema("payload").dataType.typeName == "binary")
    val n = spark.read.parquet(s"$sfDir/documents.parquet").count()
    assert(blobs.count() == n)
  }

  test("header parser reads real PNG IHDR dimensions") {
    val bytes = Multimodal.Synth.png(640, 480, "pixels".getBytes)
    val m = Multimodal.HeaderParser.parse(bytes)
    assert(m.mime == "image/png")
    assert(m.width.contains(640) && m.height.contains(480))
    assert(m.sampleRate.isEmpty && m.channels.isEmpty)
  }

  test("header parser reads the GIF logical screen descriptor") {
    val bytes = Multimodal.Synth.gif(320, 200, "frames".getBytes)
    val m = Multimodal.HeaderParser.parse(bytes)
    assert(m.mime == "image/gif")
    assert(m.width.contains(320) && m.height.contains(200))
    assert(m.sampleRate.isEmpty && m.channels.isEmpty)
    // GIF87a variant parses identically
    val b87 = bytes.clone(); b87(4) = '7'.toByte
    assert(Multimodal.HeaderParser.parse(b87).mime == "image/gif")
    // a truncated signature falls through to octet-stream
    assert(Multimodal.HeaderParser.parse(bytes.take(9)).mime
      == "application/octet-stream")
  }

  test("header parser walks RIFF chunks to the WAV fmt block") {
    val bytes = Multimodal.Synth.wav(44100, 2, "samples".getBytes)
    val m = Multimodal.HeaderParser.parse(bytes)
    assert(m.mime == "audio/wav")
    assert(m.sampleRate.contains(44100) && m.channels.contains(2))
    assert(m.width.isEmpty && m.height.isEmpty)
  }

  test("wav stats kernel: exact sample count, peak, energy on known PCM") {
    // body = three known 16-bit LE samples: 1000, -2000, 3000
    val body = java.nio.ByteBuffer.allocate(6)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putShort(1000.toShort).putShort((-2000).toShort).putShort(3000.toShort)
      .array()
    val r = graft.expressions.MmFormat.wavStatsKernel(
      Multimodal.Synth.wav(8000, 1, body))
    assert(r.getLong(0) == 3L)
    assert(r.getInt(1) == 3000)
    assert(r.getLong(2) == 1000L * 1000 + 2000L * 2000 + 3000L * 3000)
    // a trailing odd byte is ignored, not misread as half a sample
    val r2 = graft.expressions.MmFormat.wavStatsKernel(
      Multimodal.Synth.wav(8000, 1, body :+ 0x7f.toByte))
    assert(r2.getLong(0) == 3L && r2.getLong(2) == r.getLong(2))
    // non-WAV payloads yield the sentinel
    val r3 = graft.expressions.MmFormat.wavStatsKernel("not audio".getBytes)
    assert(r3.getLong(0) == -1L)
  }

  test("audioStats: WAV blobs only, duration/rms derived from the exact integers") {
    val out = Multimodal.audioStats(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(0) % 5 == 1) // the synth's WAV residue class
      val rate = r.getInt(1); val ch = r.getInt(2)
      val n = r.getLong(3)
      assert(rate >= 8000 && ch >= 1 && n > 0)
      assert(r.getInt(4) >= 0) // peak is an |amplitude|
      val expDur = BigDecimal((n / ch) * 1000.0 / rate)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(5) == expDur)
      assert(r.getDouble(6) >= 0.0 && r.getDouble(6) <= 32768.0)
    }
    // coverage: every WAV blob of the corpus appears exactly once
    val wavDocs = spark.read.parquet(s"$sfDir/documents.parquet")
      .where(col("doc_id") % 5 === 1).count()
    assert(out.length == wavDocs)
  }

  test("header parser falls back to octet-stream on unknown bytes") {
    val m = Multimodal.HeaderParser.parse("just some text".getBytes)
    assert(m.mime == "application/octet-stream")
    assert(m.width.isEmpty && m.sampleRate.isEmpty)
    // a truncated PNG signature is not a PNG
    val m2 = Multimodal.HeaderParser.parse(Array[Byte](0x89.toByte, 'P', 'N'))
    assert(m2.mime == "application/octet-stream")
  }

  test("header parser terminates on crafted RIFF chunk sizes") {
    // chunk size 0xFFFFFFFF reads back as a negative signed le32: the
    // walk must bail out instead of spinning on a non-advancing offset
    val bb = java.nio.ByteBuffer.allocate(64)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes).putInt(56).put("WAVE".getBytes)
    bb.put("JUNK".getBytes).putInt(0xFFFFFFFF)
    bb.put("fmt ".getBytes).putInt(16)
    bb.putShort(1.toShort).putShort(2.toShort).putInt(44100)
    val m = Multimodal.HeaderParser.parse(bb.array())
    assert(m.mime == "audio/wav") // parsed as WAV, fmt unreachable past the bad chunk
    assert(m.sampleRate.isEmpty && m.channels.isEmpty)
    // size-0 chunk still advances by 8 bytes: fmt after it is found
    val ok = java.nio.ByteBuffer.allocate(64)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    ok.put("RIFF".getBytes).putInt(56).put("WAVE".getBytes)
    ok.put("JUNK".getBytes).putInt(0)
    ok.put("fmt ".getBytes).putInt(16)
    ok.putShort(1.toShort).putShort(2.toShort).putInt(44100)
    val m2 = Multimodal.HeaderParser.parse(ok.array())
    assert(m2.sampleRate.contains(44100) && m2.channels.contains(2))
  }

  test("extractMeta is DataFrame-native: no RDD scan, codegen'd parse") {
    val qe = Multimodal.extractMeta(spark, sfDir).queryExecution
    val plan = qe.executedPlan.toString
    assert(!plan.contains("ExistingRDD"), "RDD round-trip found in extractMeta plan")
    assert(plan.contains("*(1)"), "extractMeta not one whole-stage-codegen span")
    assert(plan.contains("Scan parquet"), "parquet scan lost")
  }

  test("decodeBatch keeps the per-partition batch shape: one feature row per blob") {
    val blobs = Multimodal.blobFrame(spark, sfDir)
    val a = Multimodal.decodeBatch(blobs).orderBy("doc_id").collect()
    val b = Multimodal.decodeBatch(blobs).orderBy("doc_id").collect()
    assert(a.length == blobs.count())
    assert(a.sameElements(b))
  }

  test("frameSample keeps every k-th frame with stable indices, no driver fan-out") {
    val blobs = Multimodal.blobFrame(spark, sfDir)
    val all = Multimodal.frameSample(blobs, everyK = 1)
    val sampled = Multimodal.frameSample(blobs, everyK = 3)
    val a = all.groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val s = sampled.groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(s.keySet.subsetOf(a.keySet))
    // ceil(n/3) frames survive a stride of 3
    s.foreach { case (id, n) => assert(n == (a(id) + 2) / 3, s"doc $id: $n of ${a(id)}") }
    // sampled indices are the stride positions
    val idx = sampled.where(col("doc_id") === s.keys.head)
      .select("frame_idx").collect().map(_.getLong(0)).sorted
    assert(idx.zipWithIndex.forall { case (v, i) => v == 3L * i })
    // deterministic across runs
    val again = Multimodal.frameSample(blobs, everyK = 3)
      .orderBy("doc_id", "frame_idx").collect()
    assert(again.sameElements(sampled.orderBy("doc_id", "frame_idx").collect()))
  }

  test("extractMeta is deterministic, typed, and header-consistent") {
    val a = Multimodal.extractMeta(spark, sfDir).orderBy("doc_id").collect()
    val b = Multimodal.extractMeta(spark, sfDir).orderBy("doc_id").collect()
    assert(a.sameElements(b))
    assert(a.forall(r => r.getAs[Long]("n_bytes") > 0))
    val mimes = Set("image/png", "image/jpeg", "image/gif", "audio/wav",
      "application/octet-stream")
    assert(a.forall(r => mimes(r.getAs[String]("mime"))))
    assert(a.exists(_.getAs[String]("mime") == "image/png"))
    assert(a.exists(_.getAs[String]("mime") == "image/jpeg"))
    assert(a.exists(_.getAs[String]("mime") == "image/gif"))
    assert(a.exists(_.getAs[String]("mime") == "audio/wav"))
    a.foreach { r =>
      r.getAs[String]("mime") match {
        case "image/png" =>
          assert(r.getAs[Integer]("width") >= 16 && r.getAs[Integer]("height") >= 16)
          assert(r.isNullAt(r.fieldIndex("sample_rate")))
        case "image/jpeg" | "image/gif" =>
          assert(r.getAs[Integer]("width") >= 8 && r.getAs[Integer]("height") >= 8)
          assert(r.isNullAt(r.fieldIndex("sample_rate")))
        case "audio/wav" =>
          assert(r.getAs[Integer]("sample_rate") >= 8000)
          val ch = r.getAs[Integer]("channels")
          assert(ch == 1 || ch == 2)
          assert(r.isNullAt(r.fieldIndex("width")))
        case _ =>
          assert(r.isNullAt(r.fieldIndex("width")) && r.isNullAt(r.fieldIndex("sample_rate")))
      }
    }
  }

  test("resizeBatch computes aspect-preserving bounded dims; non-images pass through") {
    val blobs = Multimodal.blobFrame(spark, sfDir)
    val out = Multimodal.resizeBatch(blobs, maxDim = 64).cache()
    assert(out.count() == blobs.count())
    val imgs = out.where(col("width").isNotNull).collect()
    assert(imgs.nonEmpty)
    imgs.foreach { r =>
      val (w, h) = (r.getAs[Int]("width"), r.getAs[Int]("height"))
      val (ow, oh) = (r.getAs[Int]("out_width"), r.getAs[Int]("out_height"))
      assert(ow >= 1 && oh >= 1 && ow <= 64 && oh <= 64,
        s"dims out of box: $w x $h -> $ow x $oh")
      if (math.max(w, h) <= 64) assert(ow == w && oh == h)
      else {
        val big = math.max(w, h)
        assert(ow == math.max(1, w * 64 / big) && oh == math.max(1, h * 64 / big))
      }
    }
    // non-images: dims NULL, payload untouched
    val raw = out.where(col("mime") === "application/octet-stream")
    assert(raw.count() > 0)
    assert(raw.where(col("out_width").isNotNull).count() == 0)
    // deterministic across runs
    val a = Multimodal.resizeBatch(blobs).orderBy("doc_id").collect()
    val b = Multimodal.resizeBatch(blobs).orderBy("doc_id").collect()
    assert(a.sameElements(b))
    out.unpersist()
  }

  test("phash: near-identical payloads land within a few bits; distinct ones far apart") {
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    // visually-close = a few corrupted bytes: flip 3 bytes of a 4 KiB plane
    val base = Array.tabulate[Byte](4096)(i => ((i * 31 + i / 97) & 0xff).toByte)
    val close = base.clone()
    close(100) = (close(100) ^ 0x7f).toByte
    close(2000) = (close(2000) ^ 0x55).toByte
    close(3999) = (close(3999) ^ 0x2a).toByte
    val hBase = Multimodal.averageHash(base)
    assert(ham(hBase, Multimodal.averageHash(close)) <= 3)
    // a genuinely different plane: expect roughly half the bits to flip
    val far = Array.tabulate[Byte](4096)(i => ((i * 17 + 123) % 251).toByte)
    assert(ham(hBase, Multimodal.averageHash(far)) >= 10)
    // degenerate planes terminate and are deterministic
    assert(Multimodal.averageHash(Array.emptyByteArray) == 0L)
    assert(Multimodal.averageHash(Array[Byte](5)) ==
      Multimodal.averageHash(Array[Byte](5)))
    // frame path: every blob hashed, stable across runs, mime carried
    val blobs = Multimodal.blobFrame(spark, sfDir)
    val out = Multimodal.phashBatch(blobs).orderBy("doc_id").collect()
    assert(out.length == blobs.count())
    assert(out.sameElements(Multimodal.phashBatch(blobs).orderBy("doc_id").collect()))
    assert(out.map(_.getString(1)).toSet.exists(_.startsWith("image/")))
  }

  test("phash pairs: banded join equals the brute-force Hamming<=3 truth") {
    val hashes = Multimodal.phashBatch(Multimodal.blobFrame(spark, sfDir))
      .collect().map(r => r.getLong(0) -> r.getLong(2))
    // brute-force ground truth over all pairs (local, n is small)
    val truth = (for {
      (ia, ha) <- hashes; (ib, hb) <- hashes if ia < ib
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
    } yield (ia, ib, d.toLong)).toSet
    val got = Multimodal.phashPairs(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == truth, s"banding lost/invented pairs: got ${got.size}, truth ${truth.size}")
    // planted fingerprints: the band join must surface 0-, 3-, and only
    // <=3-bit neighbors (payload synth is doc_id-seeded, so the real
    // corpus rarely collides at this sf — plant the geometry instead)
    import spark.implicits._
    val base = 0x0123456789abcdefL
    val planted = Seq(
      1L -> base, 2L -> base,                    // hamming 0
      3L -> (base ^ 0x7L),                       // hamming 3 vs 1/2
      4L -> (base ^ 0x0f0fL),                    // hamming 8: excluded
      5L -> 0x7edcba9876543210L).toDF("doc_id", "phash")
    val p = graft.operators.Dedup.hammingCandFrame(planted, "doc_id", "phash")
      .where(col("hamming") <= 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong)).toSet
    assert(p == Set((1L, 2L, 0L), (1L, 3L, 3L), (2L, 3L, 3L)), s"got $p")
  }

  test("image dedup partitions the corpus: cluster sizes sum to the doc count") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    val out = Multimodal.dedupImages(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // each surviving image appears once; keeper rows carry member
    // counts, singletons 1 — so sizes sum to the whole corpus
    assert(out.map(_._1).distinct.length == out.length)
    assert(out.map(_._2).sum == docs, "cluster sizes must cover the corpus")
    val dropped = docs - out.length
    val pairs = Multimodal.phashPairs(spark, sfDir).count()
    assert(dropped <= pairs, "cannot drop more images than pair endpoints")
  }

  test("jpeg: synth round-trips through the marker walk; crafted tables terminate") {
    val m = Multimodal.HeaderParser.parse(
      Multimodal.Synth.jpeg(640, 480, "payload".getBytes))
    assert(m.mime == "image/jpeg" && m.width.contains(640) && m.height.contains(480))
    // SOS before any SOF: classified jpeg, no dimensions
    val sos = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xda.toByte, 0, 4, 0, 0)
    val m2 = Multimodal.HeaderParser.parse(sos)
    assert(m2.mime == "image/jpeg" && m2.width.isEmpty)
    // fuzzed marker tables: must terminate and classify (seeded)
    val rnd = new scala.util.Random(31337)
    (1 to 2000).foreach { _ =>
      val n = 2 + rnd.nextInt(64)
      val b = new Array[Byte](n)
      rnd.nextBytes(b)
      b(0) = 0xff.toByte; b(1) = 0xd8.toByte
      assert(Multimodal.HeaderParser.parse(b).mime == "image/jpeg")
    }
  }

  test("frame dedup: planted clips pair to their sources and never survive") {
    import org.apache.spark.sql.functions._
    // every clone's frames are a byte-exact prefix of its source's
    val frames = Multimodal.videoFrames(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val byDoc = frames.groupBy(_._1).view
      .mapValues(_.map(r => r._2 -> r._3).toMap).toMap
    val clones = byDoc.keys.filter(id =>
      id % 25 == 7 && byDoc.contains(id - 7) && byDoc(id).nonEmpty).toSeq
    assert(clones.size >= 10, s"only ${clones.size} planted clips have frames")
    clones.foreach { id =>
      byDoc(id).foreach { case (idx, h) =>
        assert(byDoc(id - 7).get(idx).contains(h),
          s"clone $id frame $idx must equal source frame")
      }
      // and the clip is genuinely truncated, not a full copy
      assert(byDoc(id).size < byDoc(id - 7).size, s"clone $id not truncated")
    }
    // pairs: every clone with frames pairs to its source
    val pairs = Multimodal.framePairs(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    val pairSet = pairs.map(p => (p._1, p._2)).toSet
    clones.foreach { id =>
      assert(pairSet.contains((id - 7, id)), s"missing pair (${id - 7}, $id)")
    }
    pairs.foreach { case (_, _, c) => assert(c >= 0.5 && c <= 1.0) }
    // end-to-end: clones never survive (keeper is the min id — the
    // source), and dedup conserves corpus mass through cluster sizes
    val kept = Multimodal.dedupFrames(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    clones.foreach(id => assert(!kept.contains(id), s"clone $id survived"))
    val nDocs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    assert(kept.values.sum == nDocs, "cluster sizes must conserve the corpus")
  }
}
