package graft

import org.apache.spark.sql.SparkSession

/** Library configuration keys. */
object Conf {

  /** Root directory for graft's materialized layouts (ingest layouts,
    * rollups, IVF/IVF-PQ indexes). On a cluster this is a shared
    * filesystem / object-store prefix; the fallback is a per-host temp
    * dir so the library never hardcodes a deployment path.
    */
  val WorkDirKey = "spark.graft.workDir"

  private def fallbackWorkDir: String =
    new java.io.File(sys.props("java.io.tmpdir"), "graft-work").getAbsolutePath

  def workDir(spark: SparkSession): String =
    spark.conf.get(WorkDirKey, fallbackWorkDir)

  /** Resolve an explicit base dir ("" = unset) against the session conf. */
  private[graft] def resolveWorkDir(spark: SparkSession, base: String): String =
    if (base.nonEmpty) base else workDir(spark)
}
