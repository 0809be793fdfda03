package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {

  test("brute-force topk: k rows per query, ranked, self excluded") {
    val out = Similarity.bruteForceTopK(spark, sfDir, numQueries = 3, k = 5).collect()
    val byQ = out.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.size == 3)
    byQ.foreach { case (q, rows) =>
      assert(rows.length == 5)
      assert(rows.forall(_.getAs[Long]("vec_id") != q))
      val cosSorted = rows.sortBy(_.getAs[Long]("rnk")).map(_.getAs[Double]("cos"))
      assert(cosSorted.zip(cosSorted.tail).forall { case (a, b) => a >= b })
    }
  }

  test("lsh topk returns only same-bucket candidates ranked like brute force") {
    val lsh = Similarity.lshTopK(spark, sfDir, numQueries = 5, k = 5)
    val bf = Similarity.bruteForceTopK(spark, sfDir, numQueries = 5, k = 500)
    // every LSH hit must appear in the exhaustive ranking with same cosine
    val lshRows = lsh.select("q_id", "vec_id", "cos").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val bfRows = bf.select("q_id", "vec_id", "cos").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    lshRows.foreach { case (k2, c) =>
      assert(bfRows.get(k2).contains(c), s"pair $k2 cos mismatch")
    }
  }

  test("ivf topk hits are a subset of the exhaustive ranking with same cosines") {
    val ivf = Similarity.ivfTopK(spark, sfDir, numQueries = 5, k = 5)
    val bf = Similarity.bruteForceTopK(spark, sfDir, numQueries = 5, k = 500)
    val ivfRows = ivf.select("q_id", "vec_id", "cos").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
    assert(ivfRows.nonEmpty)
    val bfRows = bf.select("q_id", "vec_id", "cos").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    ivfRows.foreach { case (k2, c) =>
      assert(bfRows.get(k2).contains(c), s"pair $k2 cos mismatch")
    }
  }

  test("brute-force plan broadcasts the query side") {
    val plan = Similarity.bruteForceTopK(spark, sfDir).queryExecution.executedPlan.toString
    assert(plan.contains("Broadcast"))
  }
}
