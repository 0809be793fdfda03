package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session
  val sfDir = "/root/testdata/sf0.001"
}

/** Hard per-test time limit for specs that drive Structured Streaming:
  * a wedged stream (stale checkpoint, dead source, state-store stall)
  * must FAIL the test in bounded time, never hang the whole suite (the
  * round-7 48-minute stall). ThreadSignaler interrupts the test thread,
  * which aborts `processAllAvailable`/`awaitTermination` waits.
  */
trait TimedSpec extends org.scalatest.concurrent.TimeLimitedTests {
  this: AnyFunSuite =>
  import org.scalatest.time.{Seconds, Span}
  val timeLimit: Span = Span(600, Seconds)
  override val defaultTestSignaler: org.scalatest.concurrent.Signaler =
    org.scalatest.concurrent.ThreadSignaler
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config(graft.Conf.WorkDirKey, "/root/repo/out")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
