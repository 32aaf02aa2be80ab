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
    // vectors (decimal-routed covariance agg + the DETERMINISTIC deflated
    // power iteration — Pca.scala), registered with a trained_at stamp,
    // resolved through the same as-of lookup as q63, then post-cutoff
    // windows scored by reconstruction error map-side. HASH-GREEN since
    // round 14 (was rows-only): the solver's every cross-term sum is an
    // exact 1e-9-unit integer and the rest single IEEE ops, so the oracle
    // replays the training — 60 power steps × 3 deflated components — in
    // a recursive CTE and the scoring folds with list_reduce. Output sums
    // are decimal-routed (order-free); max is order-free by nature.
    "q98_pca_recon" -> ((s, d) => {
      val cutoff = lit("2024-01-15").cast("timestamp")
      // PERSISTED: the window assembly feeds the covariance fit AND the
      // post-cutoff scoring join — one materialization, two reads
      // (guide §2.4). Bounded: one 12-double array per window row.
      val wins = graft.CacheBag.register(
        AnomalyOps.assembleWindows(events(s, d),
          Seq("user_id", "event_type"), "ts", "event_id", "value", 12)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      val registry = Pca.fit(wins.filter(col("ts") < cutoff),
          "event_type", "win_arr", dim = 12, k = 3)
        .withColumn("trained_at", lit("2024-01-14").cast("timestamp"))
      val resolved = ModelRegistry.latestAsOf(registry, Seq("event_type"), cutoff)
      Pca.reconstructionError(wins.filter(col("ts") >= cutoff), resolved,
          "event_type", "win_arr")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_windows"),
          round(sum(round(col("recon_err"), 6).cast("decimal(28,6)"))
            .cast("double"), 4).as("sum_err"),
          round(max(round(col("recon_err"), 6)), 6).as("max_err"))
        .orderBy(col("event_type"))
    })
  )

  val oracle: Map[String, String] = Map(
    // The ENTIRE trained-PCA chain replayed blind: window assembly,
    // decimal-routed covariance stats, the deterministic deflated power
    // iteration (60 steps x 3 components as a recursive CTE whose every
    // cross-term sum is an exact 9-dp decimal and whose max/divide/sqrt
    // are single IEEE ops), then reconstruction scoring with the same
    // left-fold order as Spark's aggregate() (list_reduce seeded by a
    // prepended 0.0). One wrong rounding or fold order anywhere in 180
    // solver steps and the hash goes red.
    "q98_pca_recon" ->
      """WITH RECURSIVE wins AS (
        |  SELECT user_id, event_type, ts,
        |    list(value) OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id
        |      ROWS BETWEEN 11 PRECEDING AND CURRENT ROW) AS win
        |  FROM events
        |), full_wins AS (
        |  SELECT *, row_number() OVER () AS rid FROM wins WHERE len(win) = 12
        |), train_e AS (
        |  SELECT event_type, rid, generate_subscripts(win, 1) AS i, unnest(win) AS x
        |  FROM full_wins WHERE ts < TIMESTAMP '2024-01-15'
        |), nrows AS (
        |  SELECT event_type, count(DISTINCT rid) AS n FROM train_e GROUP BY 1
        |), s AS (
        |  SELECT event_type, i,
        |    CAST(sum(CAST(round(x, 9) AS DECIMAL(38,9))) AS DOUBLE) AS sv
        |  FROM train_e GROUP BY 1, 2
        |), m AS (
        |  SELECT s.event_type, s.i, s.sv / n.n AS mv
        |  FROM s JOIN nrows n USING (event_type)
        |), q AS (
        |  SELECT a.event_type, a.i, b.i AS j,
        |    CAST(sum(CAST(round(a.x * b.x, 9) AS DECIMAL(38,9))) AS DOUBLE) AS qv
        |  FROM train_e a JOIN train_e b ON a.rid = b.rid AND b.i >= a.i
        |  GROUP BY 1, 2, 3
        |), covu AS (
        |  SELECT q.event_type, q.i, q.j, qv / n.n - mi.mv * mj.mv AS c
        |  FROM q JOIN nrows n USING (event_type)
        |  JOIN m mi ON mi.event_type = q.event_type AND mi.i = q.i
        |  JOIN m mj ON mj.event_type = q.event_type AND mj.i = q.j
        |), cov AS (
        |  SELECT event_type, i, j, c FROM covu
        |  UNION ALL
        |  SELECT event_type, j, i, c FROM covu WHERE i <> j
        |), matrows AS (
        |  SELECT event_type, i, list(c ORDER BY j) AS r FROM cov GROUP BY 1, 2
        |), mats AS (
        |  SELECT event_type, list(r ORDER BY i) AS mat FROM matrows GROUP BY 1
        |), pit AS (
        |  SELECT event_type, 0 AS comp, 0 AS step,
        |    list_transform(range(1, 13), i -> CAST(i AS DOUBLE) / sqrt(650.0)) AS v,
        |    mat, CAST(0.0 AS DOUBLE) AS lam
        |  FROM mats
        |  UNION ALL
        |  SELECT event_type,
        |    CASE WHEN step < 60 THEN comp ELSE comp + 1 END,
        |    CASE WHEN step < 60 THEN step + 1 ELSE 0 END,
        |    CASE WHEN step < 60 THEN
        |      CASE WHEN mx = 0.0 THEN v ELSE list_transform(u, x -> x / nn) END
        |      ELSE list_transform(range(1, 13), i -> CAST(i AS DOUBLE) / sqrt(650.0)) END,
        |    CASE WHEN step < 60 THEN mat
        |      ELSE list_transform(range(1, 13), i -> list_transform(range(1, 13), j ->
        |        mat[CAST(i AS INT)][CAST(j AS INT)]
        |          - lam * v[CAST(i AS INT)] * v[CAST(j AS INT)])) END,
        |    CASE WHEN step < 60 THEN
        |      CASE WHEN mx = 0.0 THEN CAST(0.0 AS DOUBLE) ELSE mx * nn END
        |      ELSE CAST(0.0 AS DOUBLE) END
        |  FROM (
        |    SELECT *,
        |      CASE WHEN mx = 0.0 THEN NULL
        |        ELSE sqrt(CAST(list_reduce(list_transform(u, x ->
        |          CAST(round(x * x, 9) AS DECIMAL(38,9))), (a, b) -> a + b) AS DOUBLE))
        |      END AS nn
        |    FROM (
        |      SELECT *,
        |        list_reduce(list_transform(w, x -> abs(x)),
        |          (a, b) -> CASE WHEN b > a THEN b ELSE a END) AS mx,
        |        list_transform(w, x -> x / list_reduce(list_transform(w, y -> abs(y)),
        |          (a, b) -> CASE WHEN b > a THEN b ELSE a END)) AS u
        |      FROM (
        |        SELECT event_type, comp, step, v, mat, lam,
        |          list_transform(range(1, 13), i -> CAST(
        |            list_reduce(list_transform(range(1, 13), j ->
        |              CAST(round(mat[CAST(i AS INT)][CAST(j AS INT)]
        |                * v[CAST(j AS INT)], 9) AS DECIMAL(38,9))),
        |              (a, b) -> a + b) AS DOUBLE)) AS w
        |        FROM pit
        |        WHERE step < 60 OR comp < 2
        |      )
        |    )
        |  )
        |), pcs AS (
        |  SELECT event_type, list(v ORDER BY comp) AS pcs
        |  FROM pit WHERE step = 60 GROUP BY 1
        |), means AS (
        |  SELECT event_type, list(mv ORDER BY i) AS mean FROM m GROUP BY 1
        |), score_w AS (
        |  SELECT f.event_type, f.rid, f.win, p.pcs, me.mean
        |  FROM full_wins f
        |  JOIN pcs p USING (event_type) JOIN means me USING (event_type)
        |  WHERE f.ts >= TIMESTAMP '2024-01-15'
        |), xc AS (
        |  SELECT *, list_transform(range(1, 13), i ->
        |    win[CAST(i AS INT)] - mean[CAST(i AS INT)]) AS xcv
        |  FROM score_w
        |), proj AS (
        |  SELECT *, list_transform(range(1, 4), c ->
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list_transform(range(1, 13), i ->
        |        pcs[CAST(c AS INT)][CAST(i AS INT)] * xcv[CAST(i AS INT)])),
        |      (a, b) -> a + b)) AS pr
        |  FROM xc
        |), recon AS (
        |  SELECT *, list_transform(range(1, 13), i ->
        |    ((CAST(0.0 AS DOUBLE)
        |      + pr[1] * pcs[1][CAST(i AS INT)])
        |      + pr[2] * pcs[2][CAST(i AS INT)])
        |      + pr[3] * pcs[3][CAST(i AS INT)]) AS rec
        |  FROM proj
        |), err AS (
        |  SELECT event_type, rid,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list_transform(range(1, 13), i ->
        |        (xcv[CAST(i AS INT)] - rec[CAST(i AS INT)])
        |          * (xcv[CAST(i AS INT)] - rec[CAST(i AS INT)]))),
        |      (a, b) -> a + b) AS e
        |  FROM recon
        |)
        |SELECT event_type, count(*) AS n_windows,
        |  round(CAST(sum(CAST(round(e, 6) AS DECIMAL(28,6))) AS DOUBLE), 4) AS sum_err,
        |  round(max(round(e, 6)), 6) AS max_err
        |FROM err GROUP BY 1 ORDER BY event_type""".stripMargin,

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
