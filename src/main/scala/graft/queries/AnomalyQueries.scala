package graft.queries

import graft.Tables._
import graft.anomaly.{AnomalyOps, Scalers, Threshold}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** The rebuilt reference pipeline (SURVEY §2.P): dedup → scalers →
  * window assembly → inference proxy → threshold → postprocess → ensemble
  * → unified score, each as a declared, oracle-checked query over `events`
  * (composite key ≅ (user_id, event_type), FIXTURES.md).
  */
object AnomalyQueries {

  /** DuckDB 1.0.0 has no tanh — splice the exp identity. */
  private[queries] def sqlTanh(x: String): String =
    s"((exp(2*($x)) - 1) / (exp(2*($x)) + 1))"

  private val eventKey = Seq("user_id", "event_type")

  /** P2→P8 chain used by the flagship and the postprocess queries — the
    * config-driven `Pipeline` facade (what a reference user calls). */
  private def scoredEvents(s: SparkSession, d: String): DataFrame =
    graft.anomaly.Pipeline.score(events(s, d), graft.anomaly.PipelineConfig(
      metricFilter = Seq("click", "purchase", "error", "signup", "view")))

  private val scoredSql: String =
    s"""WITH w AS (
       |  SELECT event_type, user_id, ts, event_id, value,
       |    avg(value) OVER win AS roll_avg,
       |    stddev_samp(value) OVER win AS roll_std,
       |    count(*) OVER win AS roll_cnt
       |  FROM events
       |  WHERE event_type IN ('click','purchase','error','signup','view')
       |  WINDOW win AS (PARTITION BY user_id, event_type ORDER BY ts, event_id
       |    ROWS BETWEEN 11 PRECEDING AND CURRENT ROW)
       |), scored AS (
       |  SELECT event_type, user_id, ts, event_id, value, roll_avg, roll_std,
       |    10 * ${sqlTanh("abs(value - roll_avg) / (roll_avg + 3*roll_std + 0.000001)")} AS score
       |  FROM w WHERE roll_cnt = 12
       |)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // P4: dedup — one event per (composite key, day), earliest kept.
    "q32_dedup" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"), col("event_type"),
        date_trunc("day", col("ts"))).orderBy(col("ts"), col("event_id"))
      events(s, d)
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_kept"),
          round(sum(col("value").cast("decimal(18,2)")).cast("double"), 2).as("sum_kept"))
        .orderBy(col("event_type"))
    }),

    // P5: min-max scaler — fit per composite key, apply, verify range.
    "q33_scaler_minmax" -> ((s, d) => {
      val ev = events(s, d)
      val fit = Scalers.minMaxFit(ev, Seq("event_type"), "value")
      Scalers.minMaxApply(ev, fit, Seq("event_type"), "value")
        .groupBy(col("event_type"))
        .agg(round(avg(col("scaled")), 6).as("avg_scaled"),
          round(min(col("scaled")), 6).as("min_scaled"),
          round(max(col("scaled")), 6).as("max_scaled"))
        .orderBy(col("event_type"))
    }),

    // P5: z-score scaler with ±3 clip.
    "q34_scaler_zscore" -> ((s, d) => {
      val ev = events(s, d)
      val fit = Scalers.zScoreFit(ev, Seq("event_type"), "value")
      Scalers.zScoreApply(ev, fit, Seq("event_type"), "value")
        .groupBy(col("event_type"))
        .agg(round(avg(col("zscore")), 6).as("avg_z"),
          round(min(col("zscore")), 6).as("min_z"),
          round(max(col("zscore")), 6).as("max_z"),
          count(lit(1)).as("n"))
        .orderBy(col("event_type"))
    }),

    // P5: log1p + tanh scaler (stateless transforms), NaN-scrub included.
    "q35_scaler_log_tanh" -> ((s, d) => {
      events(s, d)
        .withColumn("t", Scalers.tanhScale(Scalers.scrub(Scalers.logTransform(col("value"))), 5.0))
        .groupBy(col("event_type"))
        .agg(round(avg(col("t")), 6).as("avg_t"),
          round(max(col("t")), 6).as("max_t"))
        .orderBy(col("event_type"))
    }),

    // P7 fit: one-pass μ+3σ threshold via the typed Aggregator (E49).
    "q36_threshold_fit" -> ((s, d) => {
      Threshold.fit(events(s, d), Seq("event_type"), "value", 3.0)
        .select(col("event_type"), round(col("mean"), 6).as("mean"),
          round(col("std"), 6).as("std"), col("n"),
          round(col("threshold"), 6).as("threshold"))
        .orderBy(col("event_type"))
    }),

    // P7 apply: score = value / fitted threshold, clipped to [0, 10].
    "q37_threshold_score" -> ((s, d) => {
      val ev = events(s, d)
      val fit = Threshold.fit(ev, Seq("event_type"), "value", 3.0)
        .select(col("event_type"), col("threshold"))
      ev.join(broadcast(fit), "event_type")
        .withColumn("score", Threshold.score(col("value"), col("threshold")))
        .groupBy(col("event_type"))
        .agg(round(avg(col("score")), 6).as("avg_score"),
          sum(when(col("score") > 1.0, 1).otherwise(0)).as("n_above"))
        .orderBy(col("event_type"))
    }),

    // P8: postprocess tanh-norm on the full rolling pipeline's raw score.
    "q38_postprocess" -> ((s, d) => {
      scoredEvents(s, d)
        .groupBy(col("event_type"))
        .agg(round(avg(col("score")), 6).as("avg_norm_score"),
          round(max(col("score")), 6).as("max_norm_score"),
          count(lit(1)).as("n"))
        .orderBy(col("event_type"))
    }),

    // P9: ensemble — weighted mean of the static-threshold score and the
    // z-score model (weights 0.6 / 0.4).
    "q39_ensemble" -> ((s, d) => {
      val ev = events(s, d)
      val zfit = Scalers.zScoreFit(ev, Seq("event_type"), "value")
      val tfit = Threshold.fit(ev, Seq("event_type"), "value", 3.0)
        .select(col("event_type"), col("threshold"))
      Scalers.zScoreApply(ev, zfit, Seq("event_type"), "value")
        .join(broadcast(tfit), "event_type")
        .withColumn("s_thresh", Threshold.score(col("value"), col("threshold")))
        .withColumn("s_z", abs(col("zscore")) / lit(3.0) * lit(10.0))
        .withColumn("ens", AnomalyOps.ensemble(Seq((col("s_thresh"), 0.6), (col("s_z"), 0.4))))
        .groupBy(col("event_type"))
        .agg(round(avg(col("ens")), 6).as("avg_ens"),
          round(max(col("ens")), 6).as("max_ens"))
        .orderBy(col("event_type"))
    }),

    // P10: unified anomaly — max member score per (day, namespace proxy),
    // plus the config-weighted variant (error series weighted 2×).
    "q40_unified" -> ((s, d) => {
      val member = scoredEvents(s, d)
        .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
        .agg(max(col("score")).as("member_score"))
      AnomalyOps.unifiedWeighted(member, Seq("day"), "member_score",
          "event_type", Map("error" -> 2.0))
        .select(col("day"), round(col("unified_score"), 6).as("unified_score"),
          round(col("unified_weighted"), 6).as("unified_weighted"))
        .orderBy(col("day"))
    }),

    // P3: window-matrix assembly (w=12 ordered arrays) — array plumbing
    // verified via per-window fold (sum/12), scalar-projected for the oracle.
    "q41_window_assemble" -> ((s, d) => {
      AnomalyOps.assembleWindows(events(s, d), Seq("user_id"), "ts", "event_id", "value", 12)
        .withColumn("win_mean",
          aggregate(col("win_arr"), lit(0.0), (acc, x) => acc + x) / lit(12.0))
        .groupBy(col("user_id"))
        // decimal-summed (not averaged) for the same boundary-safety reason
        // as q69: round6 of y/12 means never sits on a half-boundary, and
        // the decimal sum is then exact in both engines.
        .agg(count(lit(1)).as("n_windows"),
          round(sum(round(col("win_mean"), 6).cast("decimal(18,6)"))
            .cast("double"), 4).as("sum_win_mean"))
        .orderBy(col("user_id"))
    }),

    // Multivariate window matrix (the reference's 2-D [w × n_features]
    // payload, `reference/CHANGELOG.md:74,189`): click/view/purchase
    // co-windowed per user on an hourly step grid with carry-forward,
    // assembled into [4 × 3] matrices. The oracle-able face projects the
    // matrix to scalars: the row-major flattened left-to-right sum (the
    // s60 list_sum precedent — both engines fold the same order) and the
    // matrix corners, which pin shape, row order, and feature order.
    "q129_multivar_window" -> ((s, d) => {
      matProjection(graft.anomaly.MultiVar.coWindowMat(events(s, d),
        "user_id", "ts", "event_id", "event_type", "value",
        Seq("click", "view", "purchase"), 4))
    }),

    // Multivariate PCA on the flattened [4 × 3] window (dim 12, k = 2):
    // one GLOBAL model (the corpus-level face; per-key models are the
    // same fit keyed differently), reconstruction error per window,
    // per-user rollup. HASH-GREEN since round 14: the deterministic
    // power-iteration solver (Pca.powerPcs) replays in the oracle's
    // recursive CTE, so the whole train+score chain is oracle-checked;
    // MultiVarSpec still pins the planted cross-feature anomaly.
    "q131_multivar_pca_recon" -> ((s, d) => {
      // PERSISTED, pre-FLATTENED: the pivot/LOCF/window-assembly chain
      // feeds BOTH the covariance fit and the scoring join — without the
      // persist the whole groupBy+pivot+2-window chain runs twice (guide
      // §2.4). The cached column is the flat w·f vector, not the nested
      // [w × f] matrix: nested-array columnar cache builds cost more than
      // they save (the q48 shingle-array lesson), while a flat
      // array<double> caches cheaply and is what Pca.fit/score consume
      // anyway (fitMat/reconstructionError are exactly these two calls
      // after flatten — row-for-row identical).
      val wins = graft.CacheBag.register(
        graft.anomaly.MultiVar.coWindowMat(events(s, d),
            "user_id", "ts", "event_id", "event_type", "value",
            Seq("click", "view", "purchase"), 4)
          .withColumn("mkey", lit("all"))
          .withColumn("__flat", flatten(col("mat"))).drop("mat")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      val models = graft.anomaly.Pca.fit(wins, "mkey", "__flat", 12, 2)
      graft.anomaly.Pca.reconstructionError(wins, models, "mkey", "__flat")
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_windows"),
          round(max(col("recon_err")), 4).as("max_recon_err"))
        .orderBy(col("user_id"))
    }),

    // FLAGSHIP (SURVEY §7.0): the whole pipeline P2→P10 + top-k (E31).
    "q42_anomaly_topk" -> ((s, d) => anomalyTopK(s, d)),

    // Seasonal-baseline anomaly scoring (the classic hour-of-day
    // profile): TRAIN on Jan 1–14's hourly counts per (metric,
    // hour-of-day) — mean and σ via the exact integer-moment formula
    // (Σ, Σ², n are integer sums, so both engines derive the identical
    // doubles; no FP-order-dependent stddev_pop) — then z-score Jan 15's
    // hours against the profile. σ=0 profiles (constant training hours)
    // are excluded rather than divided by. One keyed agg per stage, no
    // self-joins over samples.
    "q177_seasonal_baseline" -> ((s, d) => {
      val hourly = events(s, d)
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("hod", hour(col("h")))
      val mu = col("s").cast("double") / col("n")
      val train = hourly
        .filter(col("h") < lit("2024-01-15").cast("timestamp"))
        .groupBy(col("event_type"), col("hod"))
        // cnt² through DECIMAL: long*long wraps silently in non-ANSI
        // Spark once an hourly count passes ~3.04e9 (plausible at the
        // 100 TB posture) while DuckDB promotes — decimal keeps the
        // second moment exact and identical in both engines.
        .agg(count(lit(1)).as("n"), sum(col("cnt")).as("s"),
          sum(col("cnt").cast("decimal(19,0)") *
            col("cnt").cast("decimal(19,0)")).as("ss"))
        .withColumn("mu", mu)
        .withColumn("sigma",
          sqrt(col("ss").cast("double") / col("n") - mu * mu))
        .filter(col("sigma") > 0)
      hourly
        .filter(col("h") >= lit("2024-01-15").cast("timestamp") &&
          col("h") < lit("2024-01-16").cast("timestamp"))
        .join(train.select(col("event_type"), col("hod"), col("mu"),
          col("sigma")), Seq("event_type", "hod"))
        .withColumn("z", (col("cnt") - col("mu")) / col("sigma"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_hours"),
          round(max(abs(col("z"))), 6).as("max_abs_z"),
          sum(when(abs(col("z")) > 2.0, 1).otherwise(0)).as("n_flagged"))
        .orderBy(col("event_type"))
    }),

    // CUSUM changepoint detection (Page 1954) on hourly counts: the
    // recursive S_i = max(0, S_{i-1} + dev_i) rewritten into its
    // prefix-sum identity S_i = C_i − min(0, min_{j≤i} C_j) — two
    // WINDOW passes over DECIMAL cumsums (6-dp-rounded devs, so
    // accumulation is exact and order-proof), no recursion, no driver
    // loop; flagged where S exceeds 3σ (σ from the exact integer-moment
    // formula). The window partitions by series — at 100 TB the state
    // is one series' hours, never the corpus.
    "q178_cusum_changepoint" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val hourly = events(s, d)
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
        .agg(count(lit(1)).as("cnt"))
      val mu = col("sm").cast("double") / col("n")
      val stats = hourly.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("cnt")).as("sm"),
          // decimal second moment — same wrap-guard as q177
          sum(col("cnt").cast("decimal(19,0)") *
            col("cnt").cast("decimal(19,0)")).as("ss"))
        .withColumn("mu", mu)
        .withColumn("sigma",
          sqrt(col("ss").cast("double") / col("n") - mu * mu))
      val w = Window.partitionBy(col("event_type")).orderBy(col("h"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val scored = hourly
        .join(stats.select(col("event_type"), col("mu"), col("sigma")),
          Seq("event_type"))
        .withColumn("dev",
          round(col("cnt") - col("mu"), 6).cast("decimal(18,6)"))
        .withColumn("c", sum(col("dev")).over(w))
        .withColumn("minc",
          least(min(col("c")).over(w), lit(0).cast("decimal(18,6)")))
        .withColumn("cusum", (col("c") - col("minc")).cast("double"))
        .withColumn("cp", col("cusum") > lit(3.0) * col("sigma"))
      scored.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_hours"),
          round(max(col("cusum")), 4).as("max_cusum"),
          sum(when(col("cp"), 1).otherwise(0)).as("n_cp_hours"),
          min(when(col("cp"), col("h"))).as("first_cp"))
        .orderBy(col("event_type"))
    }),

    // P6's TRUE semantics: a nonlinear AUTOENCODER (dim-12 → 4 → 12,
    // cubic-soft-clip activation) trained per event_type on pre-cutoff
    // windows in closed form, scored over every window — and, unlike the
    // PCA face (q98, rows-only), HASH-GREEN: the fixed Haar encoder +
    // decimal-routed training moments + IEEE-exact activation make the
    // whole model reproducible in DuckDB (see graft.anomaly.Ae). The
    // saturating hidden layer bounds the reconstruction range, so
    // on-manifold-direction outliers that PCA's off-subspace error
    // cannot see score loudly (pinned in AeSpec's planted anomaly).
    "q268_ae_recon" -> ((s, d) => aeRecon(s, d, batch = true)),
  )

  /** Shared by batch q268 and streaming s269 (same semantics → same
    * oracle SQL, the s94/q89 precedent): train [[graft.anomaly.Ae]] per
    * event_type on windows ending before Jan 15, score ALL windows,
    * roll up per type with decimal-routed sums. The streaming face
    * assembles windows statefully through the replay harness; equality
    * of the two committed results is exactly the stream-batch parity
    * claim. */
  private[queries] def aeRecon(s: SparkSession, d: String,
                               batch: Boolean): DataFrame = {
    import graft.anomaly.Ae
    val cutoff = lit("2024-01-15").cast("timestamp")
    val wins =
      if (batch)
        // PERSISTED: three consumers (fit's two grouped aggregations +
        // the scoring join) each re-ran the shuffle+sort window assembly
        // without it (guide §2.4). Bounded: one 12-double array per
        // window row, no raw text.
        graft.CacheBag.register(
          AnomalyOps.assembleWindows(events(s, d), eventKey,
            "ts", "event_id", "value", 12)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      else
        // localCheckpoint: the fit→score chain self-joins the window
        // frame, and Catalyst's relation dedup covers file scans but not
        // the replay harness's MemorySink view (conflicting-attribute
        // resolve error). Materializing once also avoids re-reading the
        // sink for each of the two fit aggregations.
        graft.stream.StreamOps.replayEvents(s, d, "s269_sink", 1)(
          ds => graft.stream.StreamOps.assemblerVec(ds, 12).toDF(),
          org.apache.spark.sql.streaming.OutputMode.Append())
          .withColumnRenamed("end_ts", "ts")
          .localCheckpoint()
    val models = Ae.fit(wins.filter(col("ts") < cutoff),
      Seq("event_type"), "win_arr", dim = 12)
    Ae.score(wins, models, Seq("event_type"), "win_arr", dim = 12)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_windows"),
        round(sum(round(col("recon_err"), 6).cast("decimal(18,6)"))
          .cast("double"), 4).as("sum_recon"),
        round(max(col("recon_err")), 6).as("max_recon"))
      .orderBy(col("event_type"))
  }

  /** The q268/s269 oracle, GENERATED so every unrolled expression mirrors
    * the Spark plan's association exactly: left-assoc `+` chains match
    * `aggregate`'s left fold (0.0 + t1 ≡ t1 in IEEE), per-row math is
    * correctly-rounded double ops only (·, −, /, sqrt, compares — no
    * transcendentals), and every cross-row sum routes through
    * round-6 → DECIMAL(18,6), so both engines derive bit-identical
    * models and scores. */
  private[queries] lazy val aeReconSql: String = {
    import graft.anomaly.Ae
    val dim = 12; val k = Ae.K
    val w1 = Ae.bank(dim)
    def wlit(x: Double): String = if (x >= 0) "0.25" else "-0.25"
    def dec6(x: String) = s"CAST(round($x, 6) AS DECIMAL(18,6))"
    val rowSum = (1 to dim).map(i => s"win_arr[$i]").mkString(" + ")
    val rowSq = (1 to dim).map(i => s"win_arr[$i] * win_arr[$i]")
      .mkString(" + ")
    val zCols = (0 until dim).map(i =>
      s"(f.win_arr[${i + 1}] - s.mu) / s.sigma AS z_$i").mkString(",\n    ")
    val aCols = (0 until k).map(j =>
      (0 until dim).map(i => s"z_$i * ${wlit(w1(j)(i))}").mkString(" + ")
        + s" AS a_$j").mkString(",\n    ")
    val hCols = (0 until k).map(j =>
      s"CASE WHEN a_$j <= -1.5 THEN -1.0 WHEN a_$j >= 1.5 THEN 1.0 " +
        s"ELSE a_$j - (4.0/27.0) * a_$j * a_$j * a_$j END AS h_$j")
      .mkString(",\n    ")
    val moments = (
      (0 until k).map(j => s"sum(${dec6(s"h_$j")}) AS sh_$j") ++
        (0 until k).map(j => s"sum(${dec6(s"h_$j * h_$j")}) AS shh_$j") ++
        (0 until dim).map(i => s"sum(${dec6(s"z_$i")}) AS sz_$i") ++
        (for { i <- 0 until dim; j <- 0 until k } yield
          s"sum(${dec6(s"z_$i * h_$j")}) AS szh_${i}_$j")
      ).mkString(",\n    ")
    val modelCols = (
      (0 until k).map(j => s"CAST(sh_$j AS DOUBLE) / n AS hb_$j") ++
        (0 until k).map(j => s"CAST(shh_$j AS DOUBLE) / n - " +
          s"(CAST(sh_$j AS DOUBLE) / n) * (CAST(sh_$j AS DOUBLE) / n) AS vh_$j") ++
        (0 until dim).map(i => s"CAST(sz_$i AS DOUBLE) / n AS zb_$i")
      ).mkString(",\n    ")
    val gainCols = (for { i <- 0 until dim; j <- 0 until k } yield
      s"CASE WHEN vh_$j > 1e-12 THEN " +
        s"(CAST(szh_${i}_$j AS DOUBLE) / n - zb_$i * hb_$j) / vh_$j " +
        s"ELSE 0.0 END AS g_${i}_$j").mkString(",\n    ")
    val eCols = (0 until dim).map { i =>
      val zhat = s"g.zb_$i" + (0 until k)
        .map(j => s" + g.g_${i}_$j * (h.h_$j - g.hb_$j)").mkString
      s"h.z_$i - ($zhat) AS e_$i"
    }.mkString(",\n    ")
    val recon = (0 until dim).map(i => s"e_$i * e_$i").mkString(" + ")
    s"""WITH wins AS (
       |  SELECT user_id, event_type, ts,
       |    list(value) OVER (PARTITION BY user_id, event_type
       |      ORDER BY ts, event_id
       |      ROWS BETWEEN 11 PRECEDING AND CURRENT ROW) AS win_arr
       |  FROM events
       |), fw AS (
       |  SELECT event_type, ts, win_arr FROM wins WHERE len(win_arr) = 12
       |), stats AS (
       |  SELECT event_type, count(*) AS n,
       |    sum(${dec6(s"($rowSum)")}) AS sv,
       |    sum(${dec6(s"($rowSq)")}) AS svv
       |  FROM fw WHERE ts < TIMESTAMP '2024-01-15' GROUP BY 1
       |), st AS (
       |  SELECT event_type,
       |    CAST(sv AS DOUBLE) / (n * 12) AS mu,
       |    sqrt(CAST(svv AS DOUBLE) / (n * 12) -
       |      (CAST(sv AS DOUBLE) / (n * 12)) *
       |      (CAST(sv AS DOUBLE) / (n * 12))) AS sigma
       |  FROM stats
       |), stf AS (
       |  SELECT * FROM st WHERE sigma > 0
       |), zh AS (
       |  SELECT f.event_type, f.ts,
       |    $zCols
       |  FROM fw f JOIN stf s ON s.event_type = f.event_type
       |), aa AS (
       |  SELECT *,
       |    $aCols
       |  FROM zh
       |), hh AS (
       |  SELECT *,
       |    $hCols
       |  FROM aa
       |), mom AS (
       |  SELECT event_type, count(*) AS n,
       |    $moments
       |  FROM hh WHERE ts < TIMESTAMP '2024-01-15' GROUP BY 1
       |), model AS (
       |  SELECT *,
       |    $modelCols
       |  FROM mom
       |), gains AS (
       |  SELECT *,
       |    $gainCols
       |  FROM model
       |), errs AS (
       |  SELECT h.event_type,
       |    $eCols
       |  FROM hh h JOIN gains g ON g.event_type = h.event_type
       |), scored AS (
       |  SELECT event_type, $recon AS recon FROM errs
       |)
       |SELECT event_type, count(*) AS n_windows,
       |  round(CAST(sum(${dec6("recon")}) AS DOUBLE), 4) AS sum_recon,
       |  round(max(recon), 6) AS max_recon
       |FROM scored GROUP BY 1 ORDER BY event_type""".stripMargin
  }

  /** The multivariate window's oracle-able projection — shared by the
    * batch q129 and the streaming s130 twin (same semantics, same SQL). */
  private[queries] def matProjection(wins: DataFrame): DataFrame =
    wins.select(col("user_id"), col("end_ts"),
      round(aggregate(flatten(col("mat")), lit(0.0), (a, x) => a + x), 6)
        .as("mat_sum"),
      round(element_at(element_at(col("mat"), 1), 1), 6).as("first_click"),
      round(element_at(element_at(col("mat"), 4), 3), 6).as("last_purchase"))
      .orderBy(col("user_id"), col("end_ts"))

  /** DuckDB twin of the co-window assembly + projection (see q129). */
  private[queries] val multiVarWinSql: String =
    """WITH f AS (
      |  SELECT user_id, date_trunc('hour', ts) AS step_ts, event_type, value,
      |    row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts), event_type
      |                       ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events WHERE event_type IN ('click', 'view', 'purchase')
      |), s AS (
      |  SELECT user_id, step_ts,
      |    max(CASE WHEN event_type = 'click' THEN value END) AS c,
      |    max(CASE WHEN event_type = 'view' THEN value END) AS v,
      |    max(CASE WHEN event_type = 'purchase' THEN value END) AS p
      |  FROM f WHERE rn = 1 GROUP BY 1, 2
      |), filled AS (
      |  SELECT user_id, step_ts,
      |    last_value(c IGNORE NULLS) OVER fill AS c,
      |    last_value(v IGNORE NULLS) OVER fill AS v,
      |    last_value(p IGNORE NULLS) OVER fill AS p
      |  FROM s
      |  WINDOW fill AS (PARTITION BY user_id ORDER BY step_ts
      |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |), complete AS (
      |  SELECT * FROM filled
      |  WHERE c IS NOT NULL AND v IS NOT NULL AND p IS NOT NULL
      |), wins AS (
      |  SELECT user_id, step_ts AS end_ts,
      |    flatten(list([c, v, p]) OVER w4) AS flat,
      |    count(*) OVER w4 AS n
      |  FROM complete
      |  WINDOW w4 AS (PARTITION BY user_id ORDER BY step_ts
      |                ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
      |)
      |SELECT user_id, end_ts, round(list_sum(flat), 6) AS mat_sum,
      |  round(flat[1], 6) AS first_click, round(flat[12], 6) AS last_purchase
      |FROM wins WHERE n = 4 ORDER BY user_id, end_ts""".stripMargin

  /** Flagship: per event_type, the top-5 anomalous hours by unified score. */
  def anomalyTopK(s: SparkSession, d: String): DataFrame = {
    val hourly = scoredEvents(s, d)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
      .agg(max(col("score")).as("mx"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("mx").desc, col("hour"))
    hourly.withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      .select(col("event_type"), col("hour"), round(col("mx"), 6).as("score"), col("rn"))
      .orderBy(col("event_type"), col("rn"))
  }

  val oracle: Map[String, String] = Map(
    "q32_dedup" ->
      """WITH ranked AS (
        |  SELECT event_type, value,
        |    row_number() OVER (PARTITION BY user_id, event_type, date_trunc('day', ts)
        |      ORDER BY ts, event_id) AS rn
        |  FROM events
        |)
        |SELECT event_type, count(*) AS n_kept,
        |  round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_kept
        |FROM ranked WHERE rn = 1
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q33_scaler_minmax" ->
      """WITH fit AS (
        |  SELECT event_type, min(value) AS fit_min, max(value) AS fit_max
        |  FROM events GROUP BY event_type
        |), applied AS (
        |  SELECT e.event_type,
        |    CASE WHEN fit_max = fit_min THEN 0.0
        |         ELSE (value - fit_min) / (fit_max - fit_min) END AS scaled
        |  FROM events e JOIN fit USING (event_type)
        |)
        |SELECT event_type, round(avg(scaled), 6) AS avg_scaled,
        |  round(min(scaled), 6) AS min_scaled, round(max(scaled), 6) AS max_scaled
        |FROM applied GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q34_scaler_zscore" ->
      """WITH fit AS (
        |  SELECT event_type, avg(value) AS fit_mean, stddev_samp(value) AS fit_std
        |  FROM events GROUP BY event_type
        |), applied AS (
        |  SELECT e.event_type,
        |    least(greatest((value - fit_mean) / (fit_std + 0.000000001), -3.0), 3.0) AS z
        |  FROM events e JOIN fit USING (event_type)
        |)
        |SELECT event_type, round(avg(z), 6) AS avg_z, round(min(z), 6) AS min_z,
        |  round(max(z), 6) AS max_z, count(*) AS n
        |FROM applied GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q35_scaler_log_tanh" -> {
      val t = sqlTanh("ln(1 + value) / 5.0")
      s"""SELECT event_type, round(avg($t), 6) AS avg_t, round(max($t), 6) AS max_t
         |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin
    },

    "q36_threshold_fit" ->
      """SELECT event_type, round(avg(value), 6) AS mean,
        |  round(stddev_samp(value), 6) AS std, count(*) AS n,
        |  round(avg(value) + 3 * stddev_samp(value), 6) AS threshold
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q37_threshold_score" ->
      """WITH fit AS (
        |  SELECT event_type, avg(value) + 3 * stddev_samp(value) AS threshold
        |  FROM events GROUP BY event_type
        |), scored AS (
        |  SELECT e.event_type,
        |    least(greatest(value / (threshold + 0.000000001), 0.0), 10.0) AS score
        |  FROM events e JOIN fit USING (event_type)
        |)
        |SELECT event_type, round(avg(score), 6) AS avg_score,
        |  CAST(sum(CASE WHEN score > 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_above
        |FROM scored GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q38_postprocess" ->
      s"""$scoredSql
         |SELECT event_type, round(avg(score), 6) AS avg_norm_score,
         |  round(max(score), 6) AS max_norm_score, count(*) AS n
         |FROM scored GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q39_ensemble" ->
      """WITH zfit AS (
        |  SELECT event_type, avg(value) AS fit_mean, stddev_samp(value) AS fit_std,
        |    avg(value) + 3 * stddev_samp(value) AS threshold
        |  FROM events GROUP BY event_type
        |), scored AS (
        |  SELECT e.event_type,
        |    least(greatest(value / (threshold + 0.000000001), 0.0), 10.0) AS s_thresh,
        |    abs(least(greatest((value - fit_mean) / (fit_std + 0.000000001), -3.0), 3.0)) / 3.0 * 10.0 AS s_z
        |  FROM events e JOIN zfit USING (event_type)
        |)
        |SELECT event_type,
        |  round(avg((s_thresh * 0.6 + s_z * 0.4) / 1.0), 6) AS avg_ens,
        |  round(max((s_thresh * 0.6 + s_z * 0.4) / 1.0), 6) AS max_ens
        |FROM scored GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q40_unified" ->
      s"""$scoredSql, member AS (
         |  SELECT date_trunc('day', ts) AS day, event_type, max(score) AS member_score,
         |    CASE WHEN event_type = 'error' THEN 2.0 ELSE 1.0 END AS wt
         |  FROM scored GROUP BY 1, 2
         |)
         |SELECT day, round(max(member_score), 6) AS unified_score,
         |  round(sum(member_score * wt) / sum(wt), 6) AS unified_weighted
         |FROM member GROUP BY day ORDER BY day""".stripMargin,

    "q41_window_assemble" ->
      """WITH wins AS (
        |  SELECT user_id,
        |    list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN 11 PRECEDING AND CURRENT ROW) AS win_arr
        |  FROM events
        |), full_wins AS (
        |  SELECT user_id, list_sum(win_arr) / 12.0 AS win_mean
        |  FROM wins WHERE len(win_arr) = 12
        |)
        |SELECT user_id, count(*) AS n_windows,
        |  round(CAST(sum(CAST(round(win_mean, 6) AS DECIMAL(18,6))) AS DOUBLE), 4) AS sum_win_mean
        |FROM full_wins GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q129_multivar_window" -> multiVarWinSql,
    // q131 replayed blind: the q129 co-window twin feeds the same
    // recursive-CTE power iteration as q98 (dim 12, k = 2, one global
    // key) and the same list_reduce scoring folds.
    "q131_multivar_pca_recon" ->
      """WITH RECURSIVE f AS (
        |  SELECT user_id, date_trunc('hour', ts) AS step_ts, event_type, value,
        |    row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts), event_type
        |                       ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events WHERE event_type IN ('click', 'view', 'purchase')
        |), s AS (
        |  SELECT user_id, step_ts,
        |    max(CASE WHEN event_type = 'click' THEN value END) AS c,
        |    max(CASE WHEN event_type = 'view' THEN value END) AS v,
        |    max(CASE WHEN event_type = 'purchase' THEN value END) AS p
        |  FROM f WHERE rn = 1 GROUP BY 1, 2
        |), filled AS (
        |  SELECT user_id, step_ts,
        |    last_value(c IGNORE NULLS) OVER fill AS c,
        |    last_value(v IGNORE NULLS) OVER fill AS v,
        |    last_value(p IGNORE NULLS) OVER fill AS p
        |  FROM s
        |  WINDOW fill AS (PARTITION BY user_id ORDER BY step_ts
        |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |), complete AS (
        |  SELECT * FROM filled
        |  WHERE c IS NOT NULL AND v IS NOT NULL AND p IS NOT NULL
        |), winsq AS (
        |  SELECT user_id, step_ts AS end_ts,
        |    flatten(list([c, v, p]) OVER w4) AS win,
        |    count(*) OVER w4 AS nw
        |  FROM complete
        |  WINDOW w4 AS (PARTITION BY user_id ORDER BY step_ts
        |                ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
        |), full_wins AS (
        |  SELECT user_id, win, row_number() OVER () AS rid
        |  FROM winsq WHERE nw = 4
        |), train_e AS (
        |  SELECT rid, generate_subscripts(win, 1) AS i, unnest(win) AS x
        |  FROM full_wins
        |), nrows AS (
        |  SELECT count(DISTINCT rid) AS n FROM train_e
        |), sm AS (
        |  SELECT i, CAST(sum(CAST(round(x, 9) AS DECIMAL(38,9))) AS DOUBLE) AS sv
        |  FROM train_e GROUP BY 1
        |), m AS (
        |  SELECT i, sv / (SELECT n FROM nrows) AS mv FROM sm
        |), q AS (
        |  SELECT a.i, b.i AS j,
        |    CAST(sum(CAST(round(a.x * b.x, 9) AS DECIMAL(38,9))) AS DOUBLE) AS qv
        |  FROM train_e a JOIN train_e b ON a.rid = b.rid AND b.i >= a.i
        |  GROUP BY 1, 2
        |), covu AS (
        |  SELECT q.i, q.j, qv / (SELECT n FROM nrows) - mi.mv * mj.mv AS c
        |  FROM q JOIN m mi ON mi.i = q.i JOIN m mj ON mj.i = q.j
        |), cov AS (
        |  SELECT i, j, c FROM covu
        |  UNION ALL
        |  SELECT j, i, c FROM covu WHERE i <> j
        |), matrows AS (
        |  SELECT i, list(c ORDER BY j) AS r FROM cov GROUP BY 1
        |), mats AS (
        |  SELECT list(r ORDER BY i) AS mat FROM matrows
        |), pit AS (
        |  SELECT 0 AS comp, 0 AS step,
        |    list_transform(range(1, 13), i -> CAST(i AS DOUBLE) / sqrt(650.0)) AS v,
        |    mat, CAST(0.0 AS DOUBLE) AS lam
        |  FROM mats
        |  UNION ALL
        |  SELECT
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
        |        SELECT comp, step, v, mat, lam,
        |          list_transform(range(1, 13), i -> CAST(
        |            list_reduce(list_transform(range(1, 13), j ->
        |              CAST(round(mat[CAST(i AS INT)][CAST(j AS INT)]
        |                * v[CAST(j AS INT)], 9) AS DECIMAL(38,9))),
        |              (a, b) -> a + b) AS DOUBLE)) AS w
        |        FROM pit
        |        WHERE step < 60 OR comp < 1
        |      )
        |    )
        |  )
        |), pcs AS (
        |  SELECT list(v ORDER BY comp) AS pcs FROM pit WHERE step = 60
        |), means AS (
        |  SELECT list(mv ORDER BY i) AS mean FROM m
        |), xc AS (
        |  SELECT f.user_id, f.rid, p.pcs,
        |    list_transform(range(1, 13), i ->
        |      f.win[CAST(i AS INT)] - me.mean[CAST(i AS INT)]) AS xcv
        |  FROM full_wins f, pcs p, means me
        |), proj AS (
        |  SELECT *, list_transform(range(1, 3), c ->
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list_transform(range(1, 13), i ->
        |        pcs[CAST(c AS INT)][CAST(i AS INT)] * xcv[CAST(i AS INT)])),
        |      (a, b) -> a + b)) AS pr
        |  FROM xc
        |), recon AS (
        |  SELECT *, list_transform(range(1, 13), i ->
        |    (CAST(0.0 AS DOUBLE)
        |      + pr[1] * pcs[1][CAST(i AS INT)])
        |      + pr[2] * pcs[2][CAST(i AS INT)]) AS rec
        |  FROM proj
        |), err AS (
        |  SELECT user_id,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list_transform(range(1, 13), i ->
        |        (xcv[CAST(i AS INT)] - rec[CAST(i AS INT)])
        |          * (xcv[CAST(i AS INT)] - rec[CAST(i AS INT)]))),
        |      (a, b) -> a + b) AS e
        |  FROM recon
        |)
        |SELECT user_id, count(*) AS n_windows,
        |  round(max(e), 4) AS max_recon_err
        |FROM err GROUP BY 1 ORDER BY user_id""".stripMargin,


    "q42_anomaly_topk" ->
      s"""$scoredSql, hourly AS (
         |  SELECT event_type, date_trunc('hour', ts) AS hour, max(score) AS mx
         |  FROM scored GROUP BY 1, 2
         |), ranked AS (
         |  SELECT event_type, hour, mx,
         |    row_number() OVER (PARTITION BY event_type ORDER BY mx DESC, hour) AS rn
         |  FROM hourly
         |)
         |SELECT event_type, hour, round(mx, 6) AS score, rn
         |FROM ranked WHERE rn <= 5
         |ORDER BY event_type, rn""".stripMargin,

    // Integer moments (Σ, Σ², n) make mu/sigma the identical doubles in
    // both engines; σ=0 profiles excluded before the division.
    "q177_seasonal_baseline" ->
      """WITH hourly AS (
        |  SELECT event_type, date_trunc('hour', ts) AS h, count(*) AS cnt
        |  FROM events GROUP BY 1, 2
        |), train AS (
        |  SELECT event_type, extract(hour FROM h) AS hod,
        |    count(*) AS n, sum(cnt) AS s,
        |    sum(CAST(cnt AS DECIMAL(19,0)) * CAST(cnt AS DECIMAL(19,0))) AS ss
        |  FROM hourly WHERE h < TIMESTAMP '2024-01-15' GROUP BY 1, 2
        |), prof AS (
        |  SELECT event_type, hod,
        |    CAST(s AS DOUBLE) / n AS mu,
        |    sqrt(CAST(ss AS DOUBLE) / n -
        |      (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n)) AS sigma
        |  FROM train
        |), z AS (
        |  SELECT t.event_type, (t.cnt - p.mu) / p.sigma AS z
        |  FROM hourly t JOIN prof p
        |    ON p.event_type = t.event_type
        |   AND p.hod = extract(hour FROM t.h) AND p.sigma > 0
        |  WHERE t.h >= TIMESTAMP '2024-01-15' AND t.h < TIMESTAMP '2024-01-16'
        |)
        |SELECT event_type, count(*) AS n_hours,
        |  round(max(abs(z)), 6) AS max_abs_z,
        |  CAST(sum(CASE WHEN abs(z) > 2.0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_flagged
        |FROM z GROUP BY 1 ORDER BY event_type""".stripMargin,

    // The prefix-sum CUSUM identity over DECIMAL cumsums of 6-dp devs —
    // exact in both engines; the 3σ gate compares identical doubles.
    "q178_cusum_changepoint" ->
      """WITH hourly AS (
        |  SELECT event_type, date_trunc('hour', ts) AS h, count(*) AS cnt
        |  FROM events GROUP BY 1, 2
        |), stats AS (
        |  SELECT event_type, count(*) AS n, sum(cnt) AS sm,
        |    sum(CAST(cnt AS DECIMAL(19,0)) * CAST(cnt AS DECIMAL(19,0))) AS ss
        |  FROM hourly GROUP BY 1
        |), st AS (
        |  SELECT event_type, CAST(sm AS DOUBLE) / n AS mu,
        |    sqrt(CAST(ss AS DOUBLE) / n -
        |      (CAST(sm AS DOUBLE) / n) * (CAST(sm AS DOUBLE) / n)) AS sigma
        |  FROM stats
        |), dev AS (
        |  SELECT h.event_type, h.h, s.sigma,
        |    CAST(round(h.cnt - s.mu, 6) AS DECIMAL(18,6)) AS d
        |  FROM hourly h JOIN st s ON s.event_type = h.event_type
        |), cum0 AS (
        |  SELECT event_type, h, sigma, sum(d) OVER win AS c
        |  FROM dev
        |  WINDOW win AS (PARTITION BY event_type ORDER BY h
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |), cum AS (
        |  SELECT event_type, h, sigma, c,
        |    least(min(c) OVER win, CAST(0 AS DECIMAL(18,6))) AS minc
        |  FROM cum0
        |  WINDOW win AS (PARTITION BY event_type ORDER BY h
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |), cus AS (
        |  SELECT event_type, h,
        |    CAST(c - minc AS DOUBLE) AS cusum,
        |    CAST(c - minc AS DOUBLE) > 3.0 * sigma AS cp
        |  FROM cum
        |)
        |SELECT event_type, count(*) AS n_hours,
        |  round(max(cusum), 4) AS max_cusum,
        |  CAST(sum(CASE WHEN cp THEN 1 ELSE 0 END) AS BIGINT) AS n_cp_hours,
        |  min(CASE WHEN cp THEN h END) AS first_cp
        |FROM cus GROUP BY 1 ORDER BY event_type""".stripMargin,

    "q268_ae_recon" -> aeReconSql
  )
}
