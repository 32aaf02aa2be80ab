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

  /** One alerting rule: `alertname`, its PromQL `expr`, the `for` hold
    * duration in seconds (0 = fire immediately), and `keep_firing_for`
    * (0 = resolve immediately when the condition clears — the
    * Prometheus 2.42+ field). */
  final case class Rule(alertname: String, expr: String, forSec: Long,
                        keepFiringSec: Long = 0L)

  /** Evaluate `rule` on the `[startTs, endTs]` grid at `stepSec` (the rule
    * group's evaluation interval). Returns one row per (active series ×
    * step): label columns + `step_ts`, `alertname`, `alertstate`
    * (`pending` | `firing`), and the sample `value` — the shape of the
    * synthetic `ALERTS{...}` series Prometheus exposes. */
  def evalRule(src: PromSource, rule: Rule, startTs: String, endTs: String,
               stepSec: Long, lookbackSec: Long = 300L): DataFrame = {
    require(rule.forSec >= 0, "for duration must be >= 0")
    require(rule.keepFiringSec >= 0, "keep_firing_for must be >= 0")
    val grid = PromQlParser.evalRange(src, rule.expr, startTs, endTs,
      stepSec, lookbackSec)
    val labels = grid.columns.filterNot(Set("step_ts", "value")).toSeq
    if (rule.keepFiringSec > 0)
      keepFiringEval(grid, labels, rule, startTs, endTs, stepSec)
    else {
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
  }

  /** `keep_firing_for > 0`: the full upstream state machine. A FIRING
    * alert whose condition clears keeps firing while the first inactive
    * step is at most `keep` old — and if the condition returns inside
    * that window the alert BRIDGES (stays firing, no pending restart);
    * a pending run that clears still dies immediately.
    *
    * Bridging makes a step's state depend on the whole run-chain before
    * it, which no fixed window frame expresses — so this path pays one
    * typed per-series fold (`flatMapGroups`; the keep=0 path stays pure
    * window functions). Per-series state is the sorted active-step list,
    * bounded by the GRID length — the same bound every range query
    * already carries — so executor memory is step-count-, not
    * data-sized. Kept-firing rows carry the run's last sample value
    * (upstream's ALERTS series carries 1; the value column here is
    * diagnostic either way). */
  private def keepFiringEval(grid: DataFrame, labels: Seq[String], rule: Rule,
                             startTs: String, endTs: String,
                             stepSec: Long): DataFrame = {
    val spark = grid.sparkSession
    import spark.implicits._
    val stepUs = stepSec * 1000000L
    val startUs = usOf(startTs)
    val maxIdx = usOf(endTs) / stepUs
    val remUs = startUs - (startUs / stepUs) * stepUs
    val types = labels.map(l => l -> grid.schema(l).dataType).toMap
    val forSteps = (rule.forSec + stepSec - 1) / stepSec
    val keepSteps = rule.keepFiringSec / stepSec
    val packed = grid.select(
        map(labels.flatMap(l => Seq(lit(l), col(l).cast("string"))): _*).as("k"),
        (unix_micros(col("step_ts")) / stepUs).cast("long").as("i"),
        col("value").as("v"))
      .as[(Map[String, String], Long, Double)]
    val folded = packed.groupByKey(_._1).flatMapGroups { (key, it) =>
      val actives = it.map(t => (t._2, t._3)).toArray.sortBy(_._1)
      val out = Array.newBuilder[(Map[String, String], Long, String, Double)]
      var activeAt = -1L; var prev = -1L; var firing = false; var prevV = 0.0
      def keptTail(upTo: Long): Unit = { // kept-firing rows after `prev`
        var j = prev + 1
        val end = math.min(math.min(prev + 1 + keepSteps, maxIdx), upTo)
        while (j <= end) { out += ((key, j, "firing", prevV)); j += 1 }
      }
      for ((i, v) <- actives) {
        if (prev < 0) activeAt = i                   // first run
        else if (i != prev + 1) {                    // gap
          if (firing && i <= prev + 1 + keepSteps) {
            keptTail(i - 1)                          // bridge: stays FIRING
          } else {
            if (firing) keptTail(Long.MaxValue)      // kept tail, then resolve
            activeAt = i; firing = false             // fresh pending run
          }
        }
        firing = firing || (i - activeAt) >= forSteps
        out += ((key, i, if (firing) "firing" else "pending", v))
        prev = i; prevV = v
      }
      if (prev >= 0 && firing) keptTail(Long.MaxValue)
      out.result().iterator
    }
    val df = folded.toDF("__k", "__i", "alertstate", "value")
    df.select(labels.map(l => element_at(col("__k"), l).cast(types(l)).as(l)) ++
      Seq(timestamp_micros(col("__i") * stepUs + remUs).as("step_ts"),
        col("alertstate"), col("value"),
        lit(rule.alertname).as("alertname")): _*)
  }

  /** Plain `yyyy-MM-dd HH:mm:ss` (session UTC) → epoch micros — the same
    * wall-clock rule the parser's grid anchoring uses. */
  private def usOf(ts: String): Long =
    java.time.LocalDateTime.parse(ts.replace(' ', 'T'))
      .toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L

  /** All rules of a group against one source — a union of per-rule frames
    * (each rule's expr may produce different label columns; absent labels
    * read as NULL, the union-by-name rule). */
  def evalGroup(src: PromSource, rules: Seq[Rule], startTs: String,
                endTs: String, stepSec: Long,
                lookbackSec: Long = 300L): DataFrame =
    rules.map(evalRule(src, _, startTs, endTs, stepSec, lookbackSec))
      .reduce(_.unionByName(_, allowMissingColumns = true))
}
