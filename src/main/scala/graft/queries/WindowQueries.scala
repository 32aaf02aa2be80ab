package graft.queries

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-function battery (SURVEY §2 E25–E28): ranking, analytic,
  * rows-bounded rolling frames, interval range frames, running totals.
  * These are the primitives behind the reference's sliding-window
  * assembler (P3) and the score query service (P14).
  */
object WindowQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // E25: row_number / rank / dense_rank / ntile over a total order.
    "q19_rank_battery" -> ((s, d) => {
      val w = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      customer(s, d)
        .select(col("c_nationkey"), col("c_custkey"),
          round(col("c_acctbal"), 2).as("c_acctbal"),
          row_number().over(w).as("rn"),
          rank().over(w).as("rk"),
          dense_rank().over(w).as("drk"),
          ntile(4).over(w).as("quartile"))
        .orderBy(col("c_nationkey"), col("rn"))
    }),

    // E26: lag / lead / first_value per series.
    "q20_lag_lead" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      events(s, d)
        .select(col("user_id"), col("event_id"), col("value"),
          lag(col("value"), 1).over(w).as("prev_value"),
          lead(col("value"), 1).over(w).as("next_value"),
          round(col("value") - lag(col("value"), 1).over(w), 2).as("delta"),
          first(col("value")).over(w).as("first_value"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // E27/P3: rows-bounded rolling stats, w=12 — the batch form of the
    // reference's sliding-window assembler + preprocess stats.
    "q21_rolling_stats" -> ((s, d) => {
      graft.anomaly.AnomalyOps
        .rollingStats(events(s, d), Seq("user_id"), "ts", "event_id", "value", 12)
        .select(col("user_id"), col("event_id"),
          round(col("roll_avg"), 6).as("roll_avg"),
          round(col("roll_std"), 6).as("roll_std"),
          col("roll_cnt"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // E28: event-time range frame — 1-hour trailing window in epoch micros
    // (µs keeps Spark and the oracle on identical integer ordering keys).
    "q22_range_frame" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(unix_micros(col("ts")))
        .rangeBetween(-3600L * 1000000L, Window.currentRow)
      events(s, d)
        .select(col("user_id"), col("event_id"),
          round(sum(col("value")).over(w), 2).as("hour_sum"),
          count(lit(1)).over(w).as("hour_cnt"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // SCALE.md escape hatch, declared + oracle-checked: rolling windows
    // over a MONSTER series via time-slice salting. The series key here is
    // event_type alone — 5 series × 20k rows each at sf0.1, each exactly
    // the one-task-per-series shape a plain window produces. Slicing by
    // week re-keys every window shuffle to (event_type, week) and the
    // previous slice's last w−1 rows replay as overlap, so the output is
    // row-identical to the direct window (the oracle computes the direct
    // form). Rollup uses the s60 discipline: in-order frame sum via
    // aggregate() mirrored by DuckDB list_sum, decimal-routed.
    "q99_salted_window" -> ((s, d) => {
      val w = 8
      val wins = graft.relational.Skew.slicedRollingWindows(
        events(s, d), Seq("event_type"), "ts", "event_id", "value", w,
        date_trunc("week", col("ts")), "7 DAYS")
        .withColumn("win_mean",
          aggregate(col("win_arr"), lit(0.0), (a, x) => a + x) / w)
      // w = 8 is a pure power of two, so 6-decimal win_means often end in
      // an exact …50 — the final round(…,4) must happen ON THE DECIMAL in
      // both engines (decimal half-up is well-defined; rounding the double
      // instead sees …49999 and goes the other way on exact halves).
      wins.groupBy(col("event_type"), col("__slice").as("week"))
        .agg(count(lit(1)).as("n_windows"),
          round(sum(round(col("win_mean"), 6).cast("decimal(18,6)")), 4)
            .cast("double").as("sum_win_mean"))
        .orderBy(col("event_type"), col("week"))
    }),

    // E26/E27: running total (unbounded preceding frame), decimal-exact.
    "q23_running_total" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          round(sum(col("o_totalprice").cast("decimal(18,2)")).over(w)
            .cast("double"), 2).as("running_total"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q19_rank_battery" ->
      """SELECT c_nationkey, c_custkey, round(c_acctbal, 2) AS c_acctbal,
        |  row_number() OVER w AS rn, rank() OVER w AS rk,
        |  dense_rank() OVER w AS drk, ntile(4) OVER w AS quartile
        |FROM customer
        |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
        |ORDER BY c_nationkey, rn""".stripMargin,

    "q20_lag_lead" ->
      """SELECT user_id, event_id, value,
        |  lag(value, 1) OVER w AS prev_value,
        |  lead(value, 1) OVER w AS next_value,
        |  round(value - lag(value, 1) OVER w, 2) AS delta,
        |  first_value(value) OVER w AS first_value
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, event_id""".stripMargin,

    "q21_rolling_stats" ->
      """SELECT user_id, event_id,
        |  round(avg(value) OVER w, 6) AS roll_avg,
        |  round(stddev_samp(value) OVER w, 6) AS roll_std,
        |  count(*) OVER w AS roll_cnt
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |  ROWS BETWEEN 11 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, event_id""".stripMargin,

    "q22_range_frame" ->
      """SELECT user_id, event_id,
        |  round(sum(value) OVER w, 2) AS hour_sum,
        |  count(*) OVER w AS hour_cnt
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, event_id""".stripMargin,

    // The oracle is the DIRECT (unsalted) per-series window — the salted
    // plan must reproduce it row-for-row. list() + list_sum mirrors
    // Spark's collect_list + left-to-right aggregate() fold exactly.
    "q99_salted_window" ->
      """WITH wins AS (
        |  SELECT event_type, ts,
        |    list(value) OVER (PARTITION BY event_type ORDER BY ts, event_id
        |      ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS win_arr
        |  FROM events
        |), fw AS (
        |  SELECT event_type, date_trunc('week', ts) AS week,
        |    list_sum(win_arr) / 8.0 AS win_mean
        |  FROM wins WHERE len(win_arr) = 8
        |)
        |SELECT event_type, week, count(*) AS n_windows,
        |  -- round on the DECIMAL (exact half-up), then cast: w = 8 makes
        |  -- …50-ending 6-decimal sums common, and double-side rounding
        |  -- disagrees with Spark's decimal-side rounding on exact halves
        |  CAST(round(sum(CAST(round(win_mean, 6) AS DECIMAL(18,6))), 4) AS DOUBLE)
        |    AS sum_win_mean
        |FROM fw GROUP BY 1, 2 ORDER BY event_type, week""".stripMargin,

    "q23_running_total" ->
      """SELECT o_custkey, o_orderkey,
        |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE), 2) AS running_total
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderkey""".stripMargin
  )
}
