package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Text-analysis operators over the `documents` table. Single scan, no
  * shuffle: every operator is a projection of codegen'd expressions, so
  * at 100 TB these run at full scan throughput with column pruning
  * (only `doc_id`, `text` are read).
  */
object TextAnalysis {

  private def docs(spark: SparkSession, dir: String): DataFrame = {
    graft.expressions.GraftFunctions.register(spark)
    spark.read.parquet(s"$dir/documents.parquet")
  }

  def tokens(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir).select(
      col("doc_id"),
      wsTokenCount(col("text")).as("n_ws_tokens"),
      bpeTokenCount(col("text")).as("n_bpe_tokens"),
      length(col("text")).cast("long").as("n_chars_calc"))

  def langid(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir).select(
      col("doc_id"),
      langId(col("text")).as("lang_pred"))

  def quality(spark: SparkSession, dir: String): DataFrame = {
    val nChars = length(col("text")).cast("long")
    val nTokens = wsTokenCount(col("text"))
    val alpha = alphaCount(col("text"))
    val punct = punctCount(col("text"))
    val stops = stopwordCount(col("text"))
    val alphaRatio = alpha / nChars
    val stopRatio = stops / nTokens
    docs(spark, dir).select(
      col("doc_id"),
      nChars.as("n_chars_calc"),
      nTokens.as("n_tokens"),
      round(alphaRatio, 6).as("alpha_ratio"),
      round(punct / nChars, 6).as("punct_ratio"),
      round(stopRatio, 6).as("stopword_ratio"),
      round(alpha / nTokens, 6).as("mean_token_alpha"),
      round(
        lit(0.4) * alphaRatio
          + lit(0.4) * least(stopRatio * 5, lit(1.0))
          + lit(0.2) * when(nTokens.between(10, 1000), 1.0).otherwise(0.0),
        6).as("quality_score"))
  }

  def fingerprint(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir).select(
      col("doc_id"),
      md5Fingerprint(col("text")).as("fp_md5"),
      rollingHash(col("text")).as("fp_roll"))
}
