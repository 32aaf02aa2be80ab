package graft.metrics

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}

import scala.jdk.CollectionConverters._

/** Live-metrics twin of [[MetricRegistry]] (SURVEY §2 E47 / A8): the batch
  * registry aggregates a frame after the fact; `Observed` instruments a
  * RUNNING plan. `df.observe` accumulates named aggregates inside the plan
  * itself — zero extra passes over the data — and a registered
  * `QueryExecutionListener` snapshots them on completion. This is the
  * engine's stand-in for the reference's in-process Prometheus registry +
  * HTTP exposition (reference `metrics.py` + `server.py`): instead of a
  * scrape endpoint, callers read `snapshot`/`get` or `await`.
  *
  * Close (or `.use`) to unregister the listener.
  */
final class Observed(spark: SparkSession) extends AutoCloseable {

  private val metrics = new ConcurrentHashMap[String, Row]()

  private val listener = new QueryExecutionListener {
    override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
      qe.observedMetrics.foreach { case (name, row) => metrics.put(name, row) }
    override def onFailure(funcName: String, qe: QueryExecution, ex: Exception): Unit = ()
  }
  spark.listenerManager.register(listener)

  /** Attach a named observation point to a plan (first + rest mirrors the
    * `Dataset.observe` signature). */
  def observe(df: DataFrame, name: String, expr: Column, exprs: Column*): DataFrame =
    df.observe(name, expr, exprs: _*)

  /** Last-seen metric row for each observation name. */
  def snapshot: Map[String, Row] = metrics.asScala.toMap

  def get(name: String): Option[Row] = Option(metrics.get(name))

  /** Listener delivery is async (separate event thread) — poll up to
    * `timeoutMs` for the named observation to land. */
  def await(name: String, timeoutMs: Long = 5000L): Option[Row] = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    var r = get(name)
    while (r.isEmpty && System.nanoTime() < deadline) {
      Thread.sleep(50L)
      r = get(name)
    }
    r
  }

  override def close(): Unit = spark.listenerManager.unregister(listener)
}

object Observed {
  /** Scoped use: register, run, unregister. */
  def use[A](spark: SparkSession)(f: Observed => A): A = {
    val o = new Observed(spark)
    try f(o) finally o.close()
  }
}
