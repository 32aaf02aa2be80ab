package graft.queries

import graft.Tables._
import graft.anomaly.{AnomalyOps, Pca}
import graft.registry.ModelRegistry
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Trainer + model-registry queries (SURVEY §2 P12/P13): batch training of
  * the per-key threshold models, as-of registry resolution, and the
  * load-or-fallback scoring path.
  */
object RegistryQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // P12: the trainer's registry table — one fitted model per
    // (event_type, training day).
    "q62_trainer" -> ((s, d) => {
      ModelRegistry.train(events(s, d), Seq("event_type"), "value", "ts")
        .select(col("event_type"), col("trained_at"),
          round(col("mean"), 6).as("mean"), round(col("std"), 6).as("std"),
          col("n"), round(col("threshold"), 6).as("threshold"))
        .orderBy(col("event_type"), col("trained_at"))
    }),

    // P13+P6: resolve latest model as of 2024-01-15 per key (withholding
    // the 'error' series to exercise the static-fallback path), then score
    // the post-cutoff events with fitted-or-static thresholds.
    "q63_model_lookup" -> ((s, d) => {
      val cutoff = lit("2024-01-15").cast("timestamp")
      val registry = ModelRegistry
        .train(events(s, d), Seq("event_type"), "value", "ts")
        .filter(col("event_type") =!= "error")
      val resolved = ModelRegistry.latestAsOf(registry, Seq("event_type"), cutoff)
        .select(col("event_type"), col("threshold"))
      val post = events(s, d).filter(col("ts") >= cutoff)
      ModelRegistry.scoreWithFallback(post, resolved, Seq("event_type"), "value", 250.0)
        .groupBy(col("event_type"), col("model_source"))
        .agg(count(lit(1)).as("n"), round(avg(col("score")), 6).as("avg_score"))
        .orderBy(col("event_type"), col("model_source"))
    }),

    // P12→P13→P6 with a TRAINED model (the autoencoder stand-in,
    // reference CHANGELOG.md:139): per-key PCA fitted on pre-cutoff window
    // vectors (distributed covariance agg + driver eigen — Pca.scala),
    // registered with a trained_at stamp, resolved through the same as-of
    // lookup as q63, then post-cutoff windows scored by reconstruction
    // error map-side. Declared rows-only (eigenvectors are FP-iteration
    // outputs, not reproducible in a SQL oracle); semantics pinned in
    // PcaSpec incl. the planted-anomaly ordering vs the rolling-mean proxy.
    "q98_pca_recon" -> ((s, d) => {
      val cutoff = lit("2024-01-15").cast("timestamp")
      val wins = AnomalyOps.assembleWindows(events(s, d),
        Seq("user_id", "event_type"), "ts", "event_id", "value", 12)
      val registry = Pca.fit(wins.filter(col("ts") < cutoff),
          "event_type", "win_arr", dim = 12, k = 3)
        .withColumn("trained_at", lit("2024-01-14").cast("timestamp"))
      val resolved = ModelRegistry.latestAsOf(registry, Seq("event_type"), cutoff)
      Pca.reconstructionError(wins.filter(col("ts") >= cutoff), resolved,
          "event_type", "win_arr")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_windows"),
          round(avg(col("recon_err")), 2).as("avg_err"),
          round(max(col("recon_err")), 2).as("max_err"))
        .orderBy(col("event_type"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q62_trainer" ->
      """SELECT event_type, date_trunc('day', ts) AS trained_at,
        |  round(avg(value), 6) AS mean,
        |  round(stddev_samp(value), 6) AS std,
        |  count(*) AS n,
        |  round(avg(value) + 3 * stddev_samp(value), 6) AS threshold
        |FROM events
        |GROUP BY event_type, date_trunc('day', ts)
        |ORDER BY event_type, trained_at""".stripMargin,

    "q63_model_lookup" ->
      """WITH registry AS (
        |  SELECT event_type, date_trunc('day', ts) AS trained_at,
        |    avg(value) + 3 * stddev_samp(value) AS threshold
        |  FROM events
        |  WHERE event_type <> 'error'
        |  GROUP BY 1, 2
        |), resolved AS (
        |  SELECT event_type, threshold FROM (
        |    SELECT event_type, threshold,
        |      row_number() OVER (PARTITION BY event_type ORDER BY trained_at DESC) AS rn
        |    FROM registry WHERE trained_at <= TIMESTAMP '2024-01-15'
        |  ) WHERE rn = 1
        |), scored AS (
        |  SELECT e.event_type,
        |    CASE WHEN r.threshold IS NOT NULL THEN 'fitted' ELSE 'static' END AS model_source,
        |    least(greatest(e.value / (coalesce(r.threshold, 250.0) + 0.000000001), 0.0), 10.0) AS score
        |  FROM events e LEFT JOIN resolved r ON e.event_type = r.event_type
        |  WHERE e.ts >= TIMESTAMP '2024-01-15'
        |)
        |SELECT event_type, model_source, count(*) AS n,
        |  round(avg(score), 6) AS avg_score
        |FROM scored GROUP BY 1, 2 ORDER BY event_type, model_source""".stripMargin
  )
}
