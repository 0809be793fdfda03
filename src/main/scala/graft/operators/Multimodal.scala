package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: treat image/audio/video payloads as opaque
  * `binary` columns with typed metadata, processed in partition-sized
  * batches.
  *
  * The Spark-side plumbing (schema, partitioning, batch iteration,
  * output contract) is real; the *decoder* is a clearly-marked
  * deterministic stub because no image/audio codecs ship in this
  * environment. Swapping [[FakeDecoder]] for a real JNI/codec call is
  * the only change needed at deployment.
  */
object Multimodal {

  /** Typed metadata a real decoder would produce per blob. */
  val MetaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("mime", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("frames", IntegerType, nullable = false)))

  /** STUB — deterministic fake decode. A real implementation would parse
    * the container header / call a codec here. Keyed off stable byte
    * content so results are reproducible.
    */
  object FakeDecoder {
    def decode(bytes: Array[Byte]): (String, Int, Int, Int) = {
      val h = java.util.Arrays.hashCode(bytes)
      val mime = (math.floorMod(h, 3): @unchecked) match {
        case 0 => "image/png"
        case 1 => "audio/wav"
        case 2 => "video/mp4"
      }
      (mime, 16 + math.floorMod(h >> 2, 1024), 16 + math.floorMod(h >> 12, 1024),
        1 + math.floorMod(h >> 22, 300))
    }
  }

  /** Build a binary-blob frame from `documents` (payload = utf8 bytes of
    * the text — standing in for real image/audio payload bytes).
    */
  def blobFrame(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))

  /** Decode/feature-extract pass: per-partition batch iteration (the
    * shape a vectorized decoder needs — one codec init per partition,
    * streaming over rows, no driver collect).
    */
  def extractMeta(spark: SparkSession, dir: String): DataFrame = {
    val rdd = blobFrame(spark, dir).rdd.mapPartitions { rows =>
      // one-per-partition setup would go here (codec contexts, buffers)
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val (mime, w, h, frames) = FakeDecoder.decode(bytes)
        Row(id, bytes.length.toLong, mime, w, h, frames)
      }
    }
    spark.createDataFrame(rdd, MetaSchema)
  }
}
