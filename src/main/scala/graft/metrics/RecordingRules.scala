package graft.metrics

import org.apache.spark.sql.functions._

import PromQlParser.PromSource

/** Prometheus recording-rule materialization: evaluate an expression on the
  * step grid and append the result to the source as a NEW metric, so later
  * queries select the pre-computed series by name — the other half of the
  * rule-group surface next to [[AlertRules]] (the reference's query layer
  * serves exactly such rule outputs; `/root/reference/CHANGELOG.md:10`).
  *
  * Semantics, as upstream: the result keeps its label columns, the metric
  * name becomes the rule's `record` name, and each grid step contributes
  * one sample at the step instant. Label columns the source schema carries
  * but the result does not (aggregated away by the expr) read NULL — a
  * selector that doesn't match on them is unaffected.
  *
  * Scale shape: one grid evaluation (bounded step-explode through the
  * shared compiler) + one union — the recorded frame is a plan, not a
  * driver-side buffer, so chaining a query over it stays a single
  * declarative plan end to end.
  */
object RecordingRules {

  /** Evaluate `expr` over `[startTs, endTs]` at `stepSec` and return a new
    * [[PromSource]] whose frame is the source plus the recorded series
    * named `record`. Recorded samples get order-column 0 — there is at
    * most one sample per (series, step), so the tie-break never applies. */
  def materialize(src: PromSource, record: String, expr: String,
                  startTs: String, endTs: String, stepSec: Long,
                  lookbackSec: Long = 300L): PromSource = {
    val grid = PromQlParser.evalRange(src, expr, startTs, endTs,
      stepSec, lookbackSec)
    val labels = grid.columns.filterNot(Set("step_ts", "value")).toSeq
    val base = src.df
    def typed(c: String) = base.schema(c).dataType
    val shaped = base.columns.toSeq.map {
      case c if c == src.metricCol => lit(record).cast(typed(c)).as(c)
      case c if c == src.tsCol     => col("step_ts").cast(typed(c)).as(c)
      case c if c == src.valueCol  => col("value").cast(typed(c)).as(c)
      case c if c == src.orderCol  => lit(0L).cast(typed(c)).as(c)
      case c if labels.contains(c) => col(c).cast(typed(c)).as(c)
      case c                       => lit(null).cast(typed(c)).as(c)
    }
    src.copy(df = base.unionByName(grid.select(shaped: _*)))
  }
}
