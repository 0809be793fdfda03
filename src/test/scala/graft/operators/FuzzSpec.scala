package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Deterministic (seeded) fuzz coverage for the pure, no-session
  * parsing and planning code — components that consume arbitrary bytes
  * or user-chosen parameters and must never hang, throw, or violate
  * their stated bounds.
  */
class FuzzSpec extends AnyFunSuite {

  test("HeaderParser terminates and classifies on arbitrary bytes") {
    val rnd = new scala.util.Random(42)
    (1 to 2000).foreach { _ =>
      val b = new Array[Byte](rnd.nextInt(512))
      rnd.nextBytes(b)
      val m = Multimodal.HeaderParser.parse(b) // must return, not loop/throw
      assert(Set("image/png", "image/jpeg", "audio/wav",
        "application/octet-stream")(m.mime))
    }
  }

  test("HeaderParser terminates on crafted RIFF containers with arbitrary chunk tables") {
    // RIFF/WAVE preamble + random chunk id/size words: the walk must
    // always terminate (negative and zero sizes included)
    val rnd = new scala.util.Random(7)
    (1 to 2000).foreach { _ =>
      val n = rnd.nextInt(16)
      val bb = java.nio.ByteBuffer.allocate(12 + n * 8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes).putInt(n * 8 + 4).put("WAVE".getBytes)
      (1 to n).foreach { _ =>
        bb.put("JUNK".getBytes)
        bb.putInt(rnd.nextInt() match { case x if rnd.nextBoolean() => x; case x => x & 0xff })
      }
      val m = Multimodal.HeaderParser.parse(bb.array())
      // buffers under the 36-byte RIFF/WAVE minimum classify as opaque
      if (bb.capacity() >= 36) assert(m.mime == "audio/wav")
      else assert(m.mime == "application/octet-stream")
    }
  }

  test("filter DSL parser terminates on arbitrary strings: parse or clean reject") {
    val rnd = new scala.util.Random(99)
    val alphabet = "abz019*!:() AND OR \t".toCharArray
    (1 to 3000).foreach { _ =>
      val s = new String(Array.fill(rnd.nextInt(24))(alphabet(rnd.nextInt(alphabet.length))))
      try { graft.tsdb.FilterParser.parse(s); () }
      catch { case _: IllegalArgumentException => () } // clean reject only
    }
  }

  test("lshPlanSized holds candidates/row and recall at any corpus size (2^b ∝ n)") {
    val rnd = new scala.util.Random(21)
    (1 to 2000).foreach { _ =>
      val t = 0.6 + rnd.nextDouble() * 0.38 // the pruning regime sign-LSH serves
      val n = 100L + (rnd.nextDouble() * rnd.nextDouble() * 1e8).toLong
      val cand = 4.0 + rnd.nextDouble() * 60.0
      val (b, bands) = Dedup.lshPlanSized(t, n, candPerRow = cand)
      assert(b >= 1 && bands >= 1)
      val p = 1.0 - math.acos(t) / math.Pi
      val recall = 1.0 - math.pow(1.0 - math.pow(p, b), bands)
      val boundHolds = n.toDouble * bands / math.pow(2.0, b) <= cand + 1e-9
      // either the sized plan satisfies the per-row candidate bound, or
      // the bound needs more than maxPlanes and the result is EXACTLY
      // the documented degradation: the budget-capped lshPlan
      assert(boundHolds || (b, bands) == Dedup.lshPlan(t, 0.98, 4096),
        s"t=$t n=$n cand=$cand plan=($b,$bands)")
      if (bands.toLong * b <= 4096)
        assert(recall >= 0.98 - 1e-9, s"t=$t n=$n plan=($b,$bands) recall=$recall")
    }
    // the scaling invariant itself: a 10× corpus gets ≥3 more sign bits
    // per band (2^3 < 10), so candidates/row cannot drift upward
    val b1 = Dedup.lshPlanSized(0.9, 4000)._1
    val b10 = Dedup.lshPlanSized(0.9, 40000)._1
    assert(b10 >= b1 + 3, s"depth must scale with n: $b1 -> $b10")
    // sub-0.6 thresholds cannot prune (p too close to 1/2): the sized
    // plan degrades to the budget-capped lshPlan instead of exploding
    val (bl, nl) = Dedup.lshPlanSized(0.35, 1000000L)
    assert(bl.toLong * nl <= 4096)
  }

  test("lshPlan always meets recall within budget for valid (threshold, recall)") {
    val rnd = new scala.util.Random(13)
    (1 to 2000).foreach { _ =>
      val t = 0.05 + rnd.nextDouble() * 0.94
      val r = 0.5 + rnd.nextDouble() * 0.495
      val bud = 8 + rnd.nextInt(1017)
      val (b, n) = Dedup.lshPlan(t, r, bud)
      assert(b >= 1 && n >= 1)
      assert(b.toLong * n <= bud || (b == 1 && n == bud), // degraded max-recall form
        s"t=$t r=$r bud=$bud plan=($b,$n)")
      if (b.toLong * n <= bud) {
        val p = 1.0 - math.acos(t) / math.Pi
        val recall = 1.0 - math.pow(1.0 - math.pow(p, b), n)
        assert(recall >= r - 1e-9, s"t=$t r=$r bud=$bud plan=($b,$n) recall=$recall")
      }
    }
  }
}
