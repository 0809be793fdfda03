package graft.operators

import graft.SparkSpec

/** Seeded fuzz: [[Dedup.clusterPairs]] against a local union-find
  * reference on random graphs — pointer-doubling label propagation must
  * produce exactly the connected components for any edge set, not just
  * the chain/triangle shapes the unit spec pins.
  */
class ClusterFuzzSpec extends SparkSpec {

  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != c) { val nxt = parent(c); parent(c) = r; c = nxt }
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // canonical label = min node id in the component == root under
    // min-directed unions
    val touched = edges.flatMap(e => Seq(e._1, e._2)).distinct
    touched.map(v => v -> find(v.toInt).toLong).toMap
  }

  test("clusterPairs == union-find on seeded random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(1234)
    (1 to 6).foreach { trial =>
      val n = 20 + rnd.nextInt(180)
      val m = 1 + rnd.nextInt(2 * n)
      val edges = (1 to m).map { _ =>
        val a = rnd.nextInt(n); var b = rnd.nextInt(n)
        while (b == a) b = rnd.nextInt(n)
        (math.min(a, b).toLong, math.max(a, b).toLong)
      }.distinct
      val expect = unionFind(n, edges)
      val got = Dedup.clusterPairs(edges.toDF("doc_a", "doc_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expect, s"trial $trial (n=$n, m=${edges.size})")
      // cluster sizes: count of members per canonical label
      val sizes = Dedup.clusterPairs(edges.toDF("doc_a", "doc_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      val expectSizes = expect.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      sizes.foreach { case (id, s) => assert(s == expectSizes(expect(id))) }
    }
  }

  test("repStats == brute-force reference on seeded random word soup") {
    val rnd = new scala.util.Random(77)
    val vocab = Array("a", "bb", "ccc", "d", "e", "ff")
    (1 to 300).foreach { _ =>
      val nw = rnd.nextInt(12)
      val text =
        if (nw == 0) ""
        else (1 to nw).map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" ")
      val got = graft.expressions.NativeKernels
        .repStats(org.apache.spark.unsafe.types.UTF8String.fromString(text))
        .toLongArray()
      val toks = text.trim.split(" +", -1)
      val bi = toks.sliding(2).filter(_.length == 2).map(_.mkString(" ")).toSeq
      val tri = toks.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSeq
      val expect = Array[Long](
        toks.length,
        toks.distinct.length,
        if (bi.isEmpty) 0L else bi.groupBy(identity).values.map(_.size).max,
        tri.distinct.length)
      assert(got.toSeq == expect.toSeq, s"text='$text'")
    }
  }
}
