package graft.tsdb

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IngestSpec extends SparkSpec {

  test("ingest roundtrip preserves query results and prunes partitions") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_ingest").toString
    val db = Db.fromEvents(spark, sfDir)
    Ingest.write(db, tmp)
    val db2 = Ingest.open(spark, tmp)

    val a = db.avg("purchase", "user").granularity(Duration.days(1)).build()
      .orderBy("grp", "bucket_start").collect()
    val b = db2.avg("purchase", "user").granularity(Duration.days(1)).build()
      .orderBy("grp", "bucket_start").collect()
    assert(a.sameElements(b))

    // metric filter must reach the partition level (directory pruning)
    val scan = db2.scan("purchase")
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("metric"),
      s"metric filter not pushed to partitions:\n$plan")
  }

  test("append adds a second batch to the layout") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_append").toString
    val db = Db.fromEvents(spark, sfDir)
    val n = db.frame.count()
    Ingest.write(db, tmp)
    Ingest.append(db, tmp)
    assert(Ingest.open(spark, tmp).frame.count() == 2 * n)
  }

  test("fromEvents with extra props tags yields empty-string tags for absent keys") {
    val db = Db.fromEvents(spark, sfDir, propsTags = Seq("k", "zz"))
    assert(db.frame.columns.contains("tag_zz"))
    assert(db.scan("purchase", "zz:x*").count() == 0)
    assert(db.frame.where(col("tag_zz") === "").count() == db.frame.count())
  }
}
