package graft.metrics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Declarative metric config, mirroring the reference's dataclasses
  * (reference `numaprom/monitoring/config.py:4-15`):
  * `PromMetric{name, description, static_labels_pair, labels_pair}` grouped
  * under a `PromMetricList{type, metrics}`.
  */
case class PromMetric(
    name: String,
    description: String,
    staticLabels: Map[String, String] = Map.empty,
    labels: Map[String, String] = Map.empty)

case class PromMetricList(kind: String, metrics: Seq[PromMetric])

sealed trait MetricKind
object MetricKind {
  case object Counter extends MetricKind
  case object Info extends MetricKind
  case object Summary extends MetricKind
  case object Gauge extends MetricKind
  case object Histogram extends MetricKind
}

/** A configured metric bound to its kind — what `get_metric` returns. */
case class BoundMetric(kind: MetricKind, meta: PromMetric)

/** Monitoring operators A1–A8 (SURVEY §2.A), re-expressed as grouped
  * aggregations over a sample frame: each Prometheus exposition family is a
  * `DataFrame => DataFrame` over `(labels…, value)`.
  *
  * The reference applies these record-at-a-time into an in-process registry
  * (`metrics.py`); the batch twin aggregates the same stream, and the live
  * twin is `df.observe(...)` + a QueryExecutionListener /
  * StreamingQueryListener (see `graft.metrics.Observed`).
  */
object MetricRegistry {

  /** A6 `get_metric` factory — string dispatch, unknown type raises
    * (reference `utility.py:45-55`). */
  def getMetric(kind: String, name: String, description: String,
                staticLabels: Map[String, String] = Map.empty,
                labels: Map[String, String] = Map.empty): BoundMetric = {
    val k = kind match {
      case "Counter"   => MetricKind.Counter
      case "Info"      => MetricKind.Info
      case "Summary"   => MetricKind.Summary
      case "Gauge"     => MetricKind.Gauge
      case "Histogram" => MetricKind.Histogram
      case other => throw new IllegalArgumentException(s"Unknown metric type: $other")
    }
    BoundMetric(k, PromMetric(name, description, staticLabels, labels))
  }

  /** P16: instantiate a metric fleet from config lists. */
  def fromConfig(lists: Seq[PromMetricList]): Map[String, BoundMetric] =
    lists.flatMap(l => l.metrics.map(m =>
      m.name -> getMetric(l.kind, m.name, m.description, m.staticLabels, m.labels))).toMap

  /** A7: defaults ⊕ call-site label merge, right-biased (dict | dict,
    * reference metrics.py:67). Requires LAST_WIN dedup policy. */
  def mergeLabels(spark: SparkSession, defaults: Column, callSite: Column): Column = {
    spark.conf.set("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
    map_concat(defaults, callSite)
  }

  /** A1 Counter: monotone accumulation per labelset. */
  def counter(df: DataFrame, labelCols: Seq[String], amount: Column): DataFrame =
    df.groupBy(labelCols.map(col): _*)
      .agg(count(lit(1)).as("n_inc"), sum(amount).as("counter_total"))

  /** A4 Gauge: last-write-wins point value per labelset. */
  def gauge(df: DataFrame, labelCols: Seq[String], value: String,
            ts: String, tiebreak: String): DataFrame = {
    val w = Window.partitionBy(labelCols.map(col): _*)
      .orderBy(col(ts).desc, col(tiebreak).desc)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .select((labelCols.map(col) :+ col(value).as("gauge_value")): _*)
  }

  /** A3 Summary: quantile sketch per labelset (exact here; swap in
    * percentile_approx at 100 TB, trading the oracle for scale). */
  def summary(df: DataFrame, labelCols: Seq[String], value: String,
              qs: Seq[Double] = Seq(0.5, 0.9, 0.99)): DataFrame = {
    val aggs = qs.map(q =>
      expr(s"percentile($value, $q)").as(s"q${(q * 100).toInt}"))
    df.groupBy(labelCols.map(col): _*)
      .agg(aggs.head, (aggs.tail :+ count(lit(1)).as("n_obs")): _*)
  }

  /** A5 Histogram: fixed cumulative buckets per labelset (Prometheus `le`
    * exposition shape). */
  def histogram(df: DataFrame, labelCols: Seq[String], value: String,
                buckets: Seq[Double]): DataFrame = {
    val le = buckets.foldRight(lit(Double.PositiveInfinity)) { (b, acc) =>
      when(col(value) <= b, lit(b)).otherwise(acc)
    }
    val grouped = df.withColumn("le", le)
      .groupBy((labelCols.map(col) :+ col("le")): _*)
      .agg(count(lit(1)).as("bucket_count"))
    val w = Window.partitionBy(labelCols.map(col): _*)
      .orderBy(col("le"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grouped.withColumn("cum_count", sum(col("bucket_count")).over(w))
  }

  /** OpenMetrics exemplars on the CLASSIC le-bucket path: at most ONE
    * exemplar per (labelset, le) bucket, newest wins — OpenMetrics
    * attaches exemplars to classic buckets first, and each scrape
    * overwrites the bucket's previous exemplar. Same discipline as the
    * native-histogram face (`NativeHistogram.exemplars`): one keyed
    * `max_by` on the exposition bucket key, map-side partial all the
    * way, output |labelsets|·|buckets| rows of
    * `(labels…, le, exemplar STRUCT<trace labels…, value, ts>)` —
    * directly servable by `/api/v1/query_exemplars`. */
  def histogramExemplars(df: DataFrame, labelCols: Seq[String], value: String,
                         buckets: Seq[Double], traceCols: Seq[String],
                         tsCol: String, ordCol: String): DataFrame = {
    val le = buckets.sorted.foldRight(lit(Double.PositiveInfinity)) { (b, acc) =>
      when(col(value) <= b, lit(b)).otherwise(acc)
    }
    df.withColumn("le", le)
      .groupBy((labelCols.map(col) :+ col("le")): _*)
      .agg(max_by(
        struct((traceCols.map(col) :+ col(value).cast("double").as("value") :+
          col(tsCol).as("ts")): _*),
        struct(col(tsCol), col(ordCol))).as("exemplar"))
  }

  /** A2 Info: attach static key/value payload to each labelset. */
  def info(df: DataFrame, labelCols: Seq[String], payload: Map[String, String]): DataFrame = {
    val m = map(payload.toSeq.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
    df.select(labelCols.map(col): _*).distinct().withColumn("info", m)
  }
}
