package graft.metrics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import PromQlParser.PromSource

/** Prometheus alerting-rule evaluation over the step grid — the rule-group
  * half of the Query Service surface (the reference deploys its alerts as
  * Prometheus rule files; `/root/reference/CHANGELOG.md:10`'s query layer is
  * what those rules evaluate through).
  *
  * Semantics (the Prometheus state machine, re-expressed as ONE window
  * pass): at every grid step the rule's `expr` is an instant vector; a
  * series with a sample is ACTIVE. An unbroken run of active steps is an
  * alert instance: `pending` until the run is at least `for` old, `firing`
  * from then on (`for = 0` fires on the first active step). A step without
  * a sample ends the run — the next appearance starts a fresh `pending`
  * phase, as upstream resets `ActiveAt`.
  *
  * Scale shape: the expr evaluates through the shared [[PromQlParser]] grid
  * compiler (bounded step-explode, keyed shuffles — no per-step loop); the
  * state machine is gaps-and-islands over (series labels) ordered by step:
  * a `lag` to detect run starts and a running `last(_, ignoreNulls)` to
  * carry `ActiveAt` forward share one window partition — a single sort +
  * exchange regardless of range length, so a month-long rule evaluation is
  * one pass, not a per-step driver loop.
  */
object AlertRules {

  /** One alerting rule: `alertname`, its PromQL `expr`, and the `for`
    * hold duration in seconds (0 = fire immediately). */
  final case class Rule(alertname: String, expr: String, forSec: Long)

  /** Evaluate `rule` on the `[startTs, endTs]` grid at `stepSec` (the rule
    * group's evaluation interval). Returns one row per (active series ×
    * step): label columns + `step_ts`, `alertname`, `alertstate`
    * (`pending` | `firing`), and the sample `value` — the shape of the
    * synthetic `ALERTS{...}` series Prometheus exposes. */
  def evalRule(src: PromSource, rule: Rule, startTs: String, endTs: String,
               stepSec: Long, lookbackSec: Long = 300L): DataFrame = {
    require(rule.forSec >= 0, "for duration must be >= 0")
    val grid = PromQlParser.evalRange(src, rule.expr, startTs, endTs,
      stepSec, lookbackSec)
    val labels = grid.columns.filterNot(Set("step_ts", "value")).toSeq
    val stepUs = stepSec * 1000000L
    // integer step ordinal: grid points are start + i·step, so floor
    // division maps consecutive steps to consecutive ordinals exactly
    val idx = (unix_micros(col("step_ts")) / stepUs).cast("long")
    val w = Window.partitionBy(labels.map(col): _*).orderBy(col("__idx"))
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.withColumn("__idx", idx)
      .withColumn("__open", // a row OPENS a run iff the prior step is absent
        when(lag(col("__idx"), 1).over(w).isNull ||
          lag(col("__idx"), 1).over(w) =!= col("__idx") - 1, col("__idx")))
      .withColumn("__active_at", last(col("__open"), ignoreNulls = true).over(cum))
      .withColumn("alertstate",
        when((col("__idx") - col("__active_at")) * stepSec >= rule.forSec,
          lit("firing")).otherwise(lit("pending")))
      .withColumn("alertname", lit(rule.alertname))
      .drop("__idx", "__open", "__active_at")
  }

  /** All rules of a group against one source — a union of per-rule frames
    * (each rule's expr may produce different label columns; absent labels
    * read as NULL, the union-by-name rule). */
  def evalGroup(src: PromSource, rules: Seq[Rule], startTs: String,
                endTs: String, stepSec: Long,
                lookbackSec: Long = 300L): DataFrame =
    rules.map(evalRule(src, _, startTs, endTs, stepSec, lookbackSec))
      .reduce(_.unionByName(_, allowMissingColumns = true))
}
