package graft.queries

import graft.Tables._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Round-3 reshape / multiset / sessionization coverage:
  *
  *  - q82: PIVOT — sparse long-form events to a dense wide day × type grid
  *    (the reference's "pivoted series" fetch shape, CHANGELOG.md:90: the
  *    Prometheus fetcher returns query_range results pivoted per series).
  *  - q83: UNPIVOT (melt) — the inverse reshape, wide back to long, proving
  *    the round trip preserves the multiset.
  *  - q84: EXCEPT ALL / INTERSECT ALL — multiset set ops (bag semantics);
  *    q11 covers the distinct variants.
  *  - q85: batch sessionization — gap-based session assignment via
  *    lag + running sum, the batch twin of s59's `session_window`.
  *
  * All four are pure relational reshapes: no UDFs, every shuffle is keyed,
  * and the pivot value list is a fixed config-driven vocabulary (never
  * inferred via an extra scan — at 100 TB the two-pass inference scan is
  * the difference between one job and two).
  */
object ReshapeQueries {

  private val EventTypes = Seq("click", "error", "purchase", "signup", "view")

  /** Wide day × event_type count grid; explicit value list so the pivot is
    * single-pass (no distinct-scan to infer columns). */
  private def dailyWide(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .pivot("event_type", EventTypes)
      .agg(count(lit(1)))
      .na.fill(0, EventTypes)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // E19 sibling: PIVOT with a fixed value vocabulary.
    "q82_pivot" -> ((s, d) => dailyWide(s, d).orderBy(col("day"))),

    // Inverse reshape: unpivot the wide grid back to long form and roll it
    // up — totals must equal a direct long-form aggregation (the oracle).
    "q83_unpivot" -> ((s, d) => {
      dailyWide(s, d)
        .unpivot(Array(col("day")), EventTypes.map(col).toArray, "event_type", "n")
        .groupBy(col("event_type"))
        .agg(sum(col("n")).as("total"),
          sum(when(col("n") > 0, 1).otherwise(0)).as("n_days_active"),
          max(col("n")).as("max_day_n"))
        .orderBy(col("event_type"))
    }),

    // Multiset EXCEPT ALL / INTERSECT ALL over two lineitem slices; the
    // result is rolled up to (op, flag, status) counts so row order is
    // total and the bag cardinalities are what gets hash-checked.
    "q84_setops_all" -> ((s, d) => {
      val li = lineitem(s, d)
      val a = li.filter(col("l_quantity") < 25)
        .select(col("l_returnflag"), col("l_linestatus"))
      val b = li.filter(col("l_discount") > 0.05)
        .select(col("l_returnflag"), col("l_linestatus"))
      val ex = a.exceptAll(b).groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n")).withColumn("op", lit("except_all"))
      val in = a.intersectAll(b).groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n")).withColumn("op", lit("intersect_all"))
      ex.unionByName(in)
        .select(col("op"), col("l_returnflag"), col("l_linestatus"), col("n"))
        .orderBy(col("op"), col("l_returnflag"), col("l_linestatus"))
    }),

    // Batch sessionization: per user, a new session starts after a >1h gap;
    // session id = running count of session starts (lag + cumulative sum —
    // one shuffle on user_id, both window passes share it). Output stays
    // all-integer (µs durations, counts) so the hash check is FP-free.
    "q85_sessionize" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val sess = events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"),
          unix_micros(col("ts")).as("us"))
        .withColumn("new_sess",
          when(lag(col("us"), 1).over(w).isNull ||
            col("us") - lag(col("us"), 1).over(w) > 3600L * 1000000L, 1)
            .otherwise(0))
        .withColumn("sess_id",
          sum(col("new_sess")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      sess.groupBy(col("user_id"), col("sess_id"))
        .agg(count(lit(1)).as("n_ev"), (max(col("us")) - min(col("us"))).as("dur_us"))
        .withColumn("size_bucket",
          when(col("n_ev") === 1, "single")
            .when(col("n_ev") <= 5, "short").otherwise("long"))
        .groupBy(col("size_bucket"))
        .agg(count(lit(1)).as("n_sessions"),
          sum(col("n_ev")).as("n_events_total"),
          sum(col("dur_us")).as("total_duration_us"),
          max(col("dur_us")).as("max_duration_us"))
        .orderBy(col("size_bucket"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q82_pivot" ->
      """SELECT date_trunc('day', ts) AS day,
        |  count(*) FILTER (WHERE event_type = 'click') AS click,
        |  count(*) FILTER (WHERE event_type = 'error') AS error,
        |  count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        |  count(*) FILTER (WHERE event_type = 'signup') AS signup,
        |  count(*) FILTER (WHERE event_type = 'view') AS view
        |FROM events GROUP BY 1 ORDER BY day""".stripMargin,

    "q83_unpivot" ->
      """WITH daily AS (
        |  SELECT event_type, date_trunc('day', ts) AS day, count(*) AS n
        |  FROM events GROUP BY 1, 2
        |)
        |SELECT event_type, CAST(sum(n) AS BIGINT) AS total,
        |  CAST(sum(CASE WHEN n > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_days_active,
        |  max(n) AS max_day_n
        |FROM daily GROUP BY 1 ORDER BY event_type""".stripMargin,

    "q84_setops_all" ->
      """WITH a AS (
        |  SELECT l_returnflag, l_linestatus FROM lineitem WHERE l_quantity < 25
        |), b AS (
        |  SELECT l_returnflag, l_linestatus FROM lineitem WHERE l_discount > 0.05
        |), ex AS (
        |  SELECT 'except_all' AS op, l_returnflag, l_linestatus
        |  FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b)
        |), ia AS (
        |  SELECT 'intersect_all' AS op, l_returnflag, l_linestatus
        |  FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b)
        |)
        |SELECT op, l_returnflag, l_linestatus, count(*) AS n
        |FROM (SELECT * FROM ex UNION ALL SELECT * FROM ia)
        |GROUP BY 1, 2, 3 ORDER BY op, l_returnflag, l_linestatus""".stripMargin,

    "q85_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, ts, event_id, epoch_us(ts) AS us FROM events
        |), f AS (
        |  SELECT *, CASE WHEN lag(us) OVER w IS NULL
        |                   OR us - lag(us) OVER w > 3600000000 THEN 1
        |            ELSE 0 END AS new_sess
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), s AS (
        |  SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS UNBOUNDED PRECEDING) AS sess_id
        |  FROM f
        |), g AS (
        |  SELECT user_id, sess_id, count(*) AS n_ev, max(us) - min(us) AS dur_us
        |  FROM s GROUP BY 1, 2
        |)
        |SELECT CASE WHEN n_ev = 1 THEN 'single'
        |            WHEN n_ev <= 5 THEN 'short' ELSE 'long' END AS size_bucket,
        |  count(*) AS n_sessions,
        |  CAST(sum(n_ev) AS BIGINT) AS n_events_total,
        |  CAST(sum(dur_us) AS BIGINT) AS total_duration_us,
        |  CAST(max(dur_us) AS BIGINT) AS max_duration_us
        |FROM g GROUP BY 1 ORDER BY size_bucket""".stripMargin
  )
}
