package graft

import org.apache.spark.sql.DataFrame

/** Session-lifetime guard for query-local persisted frames.
  *
  * Some queries persist a bounded intermediate on purpose (q74's signature
  * frame, q71's exploded bigram features) because two differently-keyed
  * consumers would otherwise recompute the whole upstream chain. The persist
  * is scoped to ONE query execution — but `DataFrame.persist` is
  * session-scoped, so a long-lived session running queries in a loop would
  * accumulate dead cache entries. Queries register such frames here; the
  * harness (Bench/Verify) drains the bag after each query's action. A
  * drain with no registered frames is a no-op, so callers need no
  * per-query knowledge.
  */
object CacheBag {
  private val frames = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  /** Register a persisted frame for post-action cleanup; returns it. */
  def register(df: DataFrame): DataFrame = { frames.add(df); df }

  /** Unpersist every registered frame and empty the bag.
    *
    * `blocking = true` is for timed harnesses (Bench): a non-blocking drain
    * lets one query's async block eviction bleed into the NEXT query's
    * wall-clock, which was measured as ±40% run-to-run variance on
    * identical code. Interactive/serving callers keep the non-blocking
    * default — eviction latency doesn't belong on their critical path. */
  def drain(blocking: Boolean = false): Unit = {
    var df = frames.poll()
    while (df != null) {
      try df.unpersist(blocking)
      catch { case _: Throwable => () }
      df = frames.poll()
    }
  }
}
