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

  test("extractMeta is deterministic and typed") {
    val a = Multimodal.extractMeta(spark, sfDir).orderBy("doc_id").collect()
    val b = Multimodal.extractMeta(spark, sfDir).orderBy("doc_id").collect()
    assert(a.sameElements(b))
    assert(a.forall(r => Set("image/png", "audio/wav", "video/mp4")(r.getAs[String]("mime"))))
    assert(a.forall(r => r.getAs[Long]("n_bytes") > 0))
  }
}
