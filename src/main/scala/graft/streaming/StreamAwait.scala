package graft.streaming

import org.apache.spark.sql.streaming.StreamingQuery

/** Bounded drain for `Trigger.AvailableNow` maintenance streams.
  *
  * `awaitTermination()` with no bound turns environment drift — a
  * checkpoint whose source files were deleted, a dead state store —
  * into an indefinite hang (the round-7 48-minute suite stall). Every
  * graft build-time stream instead waits with a hard timeout and
  * re-throws the stream's own failure: a broken pipeline stage must
  * FAIL in bounded time, never wedge the caller.
  */
object StreamAwait {

  def drain(q: StreamingQuery, timeoutMs: Long = 10L * 60 * 1000): Unit = {
    val done =
      try q.awaitTermination(timeoutMs)
      catch { case e: Throwable => try q.stop() catch { case _: Throwable => () }; throw e }
    if (!done) {
      try q.stop() catch { case _: Throwable => () }
      throw new java.util.concurrent.TimeoutException(
        s"streaming query ${q.id} did not terminate within $timeoutMs ms " +
          "(stale checkpoint or dead source?)")
    }
    q.exception.foreach(e => throw e)
  }
}
