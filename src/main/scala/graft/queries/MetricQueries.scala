package graft.queries

import graft.Tables._
import graft.metrics.MetricRegistry
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Monitoring parity queries (SURVEY §2.A A1–A5): each Prometheus metric
  * family evaluated batch-style over the events stream, labelset =
  * (namespace, metric name) ≅ ('ns' ⊕ user_id % 5, event_type).
  */
object MetricQueries {

  private def labeled(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .withColumn("namespace", concat(lit("ns"), pmod(col("user_id"), lit(5))))
      .withColumn("metric", col("event_type"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A1: Counter — monotone accumulation per labelset.
    "q43_metric_counter" -> ((s, d) => {
      MetricRegistry.counter(labeled(s, d), Seq("namespace", "metric"),
        lit(1L))
        .select(col("namespace"), col("metric"), col("n_inc"),
          col("counter_total").cast("long").as("counter_total"))
        .orderBy(col("namespace"), col("metric"))
    }),

    // A4: Gauge — last-write-wins per labelset.
    "q44_metric_gauge" -> ((s, d) => {
      MetricRegistry.gauge(labeled(s, d), Seq("namespace", "metric"),
        "value", "ts", "event_id")
        .select(col("namespace"), col("metric"),
          round(col("gauge_value"), 2).as("gauge_value"))
        .orderBy(col("namespace"), col("metric"))
    }),

    // A3: Summary — quantiles per labelset.
    "q45_metric_summary" -> ((s, d) => {
      MetricRegistry.summary(labeled(s, d), Seq("namespace", "metric"), "value")
        .select(col("namespace"), col("metric"),
          round(col("q50"), 6).as("q50"), round(col("q90"), 6).as("q90"),
          round(col("q99"), 6).as("q99"), col("n_obs"))
        .orderBy(col("namespace"), col("metric"))
    }),

    // A2: Info — constant key/value payload attached per labelset,
    // projected as JSON for the oracle (map-typed oracle rows are out,
    // SURVEY §7.3 risk 4).
    "q68_metric_info" -> ((s, d) => {
      MetricRegistry.info(labeled(s, d), Seq("namespace", "metric"),
        Map("pipeline" -> "anomaly", "version" -> "0.8.1"))
        .select(col("namespace"), col("metric"), to_json(col("info")).as("info_json"))
        .orderBy(col("namespace"), col("metric"))
    }),

    // A5: Histogram — fixed cumulative le-buckets per metric name.
    "q46_metric_histogram" -> ((s, d) => {
      MetricRegistry.histogram(labeled(s, d), Seq("metric"), "value",
        Seq(1.0, 5.0, 10.0, 50.0, 100.0))
        .select(col("metric"), col("le"), col("bucket_count"), col("cum_count"))
        .orderBy(col("metric"), col("le"))
    }),

    // OpenMetrics exemplars on the CLASSIC le-bucket path (q46's bounds):
    // at most one exemplar per (metric, le) bucket, newest wins — the
    // scrape-overwrite rule, same as the native-bucket face (q146) but
    // keyed by the exposition's le bucket. One keyed max_by, map-side
    // partial; the output frame is exactly what
    // /api/v1/query_exemplars serves for classic families.
    "q183_classic_histogram_exemplars" -> ((s, d) => {
      val ev = events(s, d).withColumn("metric", col("event_type"))
        .withColumn("trace_id",
          concat(lit("t"), get_json_object(col("props"), "$.k")))
      MetricRegistry.histogramExemplars(ev, Seq("metric"), "value",
        Seq(1.0, 5.0, 10.0, 50.0, 100.0), Seq("trace_id"), "ts", "event_id")
        .select(col("metric"), col("le"),
          col("exemplar.trace_id").as("trace_id"),
          round(col("exemplar.value"), 6).as("ex_value"),
          col("exemplar.ts").as("ex_ts"))
        .orderBy(col("metric"), col("le"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q43_metric_counter" ->
      """SELECT concat('ns', user_id % 5) AS namespace, event_type AS metric,
        |  count(*) AS n_inc, count(*) AS counter_total
        |FROM events GROUP BY 1, 2 ORDER BY namespace, metric""".stripMargin,

    "q44_metric_gauge" ->
      """WITH ranked AS (
        |  SELECT concat('ns', user_id % 5) AS namespace, event_type AS metric, value,
        |    row_number() OVER (PARTITION BY concat('ns', user_id % 5), event_type
        |      ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events
        |)
        |SELECT namespace, metric, round(value, 2) AS gauge_value
        |FROM ranked WHERE rn = 1 ORDER BY namespace, metric""".stripMargin,

    "q45_metric_summary" ->
      """SELECT concat('ns', user_id % 5) AS namespace, event_type AS metric,
        |  round(quantile_cont(value, 0.5), 6) AS q50,
        |  round(quantile_cont(value, 0.9), 6) AS q90,
        |  round(quantile_cont(value, 0.99), 6) AS q99,
        |  count(*) AS n_obs
        |FROM events GROUP BY 1, 2 ORDER BY namespace, metric""".stripMargin,

    "q68_metric_info" ->
      """SELECT DISTINCT concat('ns', user_id % 5) AS namespace,
        |  event_type AS metric,
        |  '{"pipeline":"anomaly","version":"0.8.1"}' AS info_json
        |FROM events ORDER BY namespace, metric""".stripMargin,

    "q46_metric_histogram" ->
      """WITH bucketed AS (
        |  SELECT event_type AS metric,
        |    CASE WHEN value <= 1.0 THEN 1.0 WHEN value <= 5.0 THEN 5.0
        |         WHEN value <= 10.0 THEN 10.0 WHEN value <= 50.0 THEN 50.0
        |         WHEN value <= 100.0 THEN 100.0 ELSE 'Infinity'::DOUBLE END AS le
        |  FROM events
        |), grouped AS (
        |  SELECT metric, le, count(*) AS bucket_count FROM bucketed GROUP BY 1, 2
        |)
        |SELECT metric, le, bucket_count,
        |  CAST(sum(bucket_count) OVER (PARTITION BY metric ORDER BY le
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_count
        |FROM grouped ORDER BY metric, le""".stripMargin,

    // Newest-wins per classic bucket: the (ts DESC, event_id DESC) total
    // order decides identically in both engines.
    "q183_classic_histogram_exemplars" ->
      """WITH b AS (
        |  SELECT event_type AS metric,
        |    CASE WHEN value <= 1.0 THEN 1.0 WHEN value <= 5.0 THEN 5.0
        |         WHEN value <= 10.0 THEN 10.0 WHEN value <= 50.0 THEN 50.0
        |         WHEN value <= 100.0 THEN 100.0 ELSE 'Infinity'::DOUBLE END AS le,
        |    't' || CAST(json_extract(props, '$.k') AS VARCHAR) AS trace_id,
        |    value, ts, event_id
        |  FROM events
        |)
        |SELECT metric, le, trace_id,
        |  round(value, 6) AS ex_value, ts AS ex_ts
        |FROM b
        |QUALIFY row_number() OVER (PARTITION BY metric, le
        |                           ORDER BY ts DESC, event_id DESC) = 1
        |ORDER BY metric, le""".stripMargin
  )
}
