package graft.queries

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational surface (SURVEY §2.E E1–E17, E29–E33): scans, filters, the
  * join battery, aggregation battery, set ops, sort/limit/top-k.
  *
  * Determinism conventions shared by every declared query (SURVEY §5.2):
  * UTC session, total ORDER BY over the output key, `round(x, 6)` on
  * derived doubles, and sums of doubles routed through DECIMAL(18,2) in
  * BOTH engines (parallel float summation is order-dependent; decimal
  * accumulation is exact, so the hash compare cannot flake).
  */
object RelationalQueries {

  /** Exact money-sum: decimal accumulate, then a stable double cast. */
  private def dsum(c: org.apache.spark.sql.Column) =
    round(sum(c.cast("decimal(18,2)")).cast("double"), 2)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // E1+E16: TPC-H Q1-shaped pricing summary — scan, filter pushdown,
    // hash agg with partial aggregation, small group count.
    "q01_pricing_summary" -> ((s, d) => {
      lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          round(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast("decimal(18,4)")).cast("double"), 4).as("sum_disc_price"),
          round(avg(col("l_quantity")), 6).as("avg_qty"),
          round(avg(col("l_discount")), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // E6+E7: predicate battery — IN-list, LIKE, regexp, range, null-safe.
    "q02_filter_battery" -> ((s, d) => {
      part(s, d)
        .filter(col("p_size").isin(1, 5, 11, 28, 37) &&
          col("p_type").like("%ECO%") &&
          col("p_name").rlike("^(red|blue) ") &&
          col("p_retailprice").between(100.0, 2000.0))
        .select(col("p_partkey"), col("p_name"), col("p_brand"), col("p_size"),
          round(col("p_retailprice"), 2).as("p_retailprice"))
        .orderBy(col("p_partkey"))
    }),

    // E8: broadcast dim⋈dim⋈fact star join (region ⇐ nation ⇐ customer).
    "q03_join_broadcast" -> ((s, d) => {
      customer(s, d)
        .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(count(lit(1)).as("n_cust"),
          round(avg(col("c_acctbal")), 6).as("avg_bal"),
          dsum(col("c_acctbal")).as("sum_bal"))
        .orderBy(col("r_name"))
    }),

    // E9: fact⋈fact shuffle join (orders ⋈ lineitem) + revenue rollup.
    "q04_join_fact" -> ((s, d) => {
      orders(s, d)
        .join(lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_items"),
          round(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast("decimal(18,4)")).cast("double"), 4).as("revenue"))
        .orderBy(col("o_orderpriority"))
    }),

    // E10: left outer join preserving customers with zero orders.
    "q05_join_left_outer" -> ((s, d) => {
      customer(s, d)
        .join(orders(s, d), col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"), col("c_mktsegment"))
        .agg(count(col("o_orderkey")).as("n_orders"),
          dsum(coalesce(col("o_totalprice"), lit(0.0))).as("total_spent"))
        .orderBy(col("c_custkey"))
    }),

    // E11: left semi (EXISTS) — customers having an urgent order.
    "q06_join_semi" -> ((s, d) => {
      customer(s, d)
        .join(orders(s, d).filter(col("o_orderpriority") === "1-URGENT"),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_cust"))
        .orderBy(col("c_nationkey"))
    }),

    // E12: left anti (NOT EXISTS) — customers with no orders at all.
    "q07_join_anti" -> ((s, d) => {
      customer(s, d)
        .join(orders(s, d), col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_cust"),
          round(avg(col("c_acctbal")), 6).as("avg_bal"))
        .orderBy(col("c_mktsegment"))
    }),

    // E13: time-band self-join — same user, follow-up event within 5 min.
    // Equi key (user_id) keeps this a shuffle-hash/sort-merge join with a
    // band residual filter, NOT a cartesian — the plan that survives scale.
    "q08_join_range" -> ((s, d) => {
      val e1 = events(s, d).select(col("user_id"), col("ts").as("ts1"),
        col("event_type").as("type1"))
      val e2 = events(s, d).select(col("user_id"), col("ts").as("ts2"),
        col("event_type").as("type2"))
      e1.join(e2, Seq("user_id"))
        .filter(col("ts2") > col("ts1") &&
          col("ts2") <= col("ts1") + expr("INTERVAL 5 MINUTES"))
        .groupBy(col("type1"), col("type2"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy(col("type1"), col("type2"))
    }),

    // E14: as-of join — score each event against the latest strictly-prior
    // daily model (per event_type). The as-of ranking runs at the join-key
    // grain (event_type × day, tiny), NOT per event row — the resolved
    // (day → model) map is then one broadcast equi-join onto the fact side.
    // At 100 TB this keeps the rank shuffle O(keys), never O(rows).
    "q09_asof_join" -> ((s, d) => {
      val ev = events(s, d).withColumn("day", date_trunc("day", col("ts")))
      val model = ev.groupBy(col("event_type"), col("day").as("model_day"))
        .agg(avg(col("value")).as("model_avg"))
      val days = ev.select(col("event_type"), col("day")).distinct()
      val w = Window.partitionBy(col("event_type"), col("day"))
        .orderBy(col("model_day").desc)
      val asof = days.join(model, Seq("event_type"))
        .filter(col("model_day") < col("day"))
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("event_type"), col("day"), col("model_avg"))
      ev.join(broadcast(asof), Seq("event_type", "day"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_scored"),
          round(avg(abs(col("value") - col("model_avg"))), 6).as("avg_abs_err"))
        .orderBy(col("event_type"))
    }),

    // E15: cross join of two tiny dims.
    "q10_cross_join" -> ((s, d) => {
      val segs = customer(s, d).select(col("c_mktsegment")).distinct()
      region(s, d).crossJoin(segs)
        .select(col("r_name"), col("c_mktsegment"))
        .orderBy(col("r_name"), col("c_mktsegment"))
    }),

    // E32+E33: set-operation battery over nation keys.
    "q11_setops" -> ((s, d) => {
      val custNations = customer(s, d).select(col("c_nationkey").as("nk")).distinct()
      val suppNations = supplier(s, d).select(col("s_nationkey").as("nk")).distinct()
      val both = custNations.intersect(suppNations)
        .withColumn("tag", lit("both"))
      val custOnly = custNations.except(suppNations)
        .withColumn("tag", lit("cust_only"))
      val all = custNations.union(suppNations).distinct()
        .withColumn("tag", lit("any"))
      both.unionByName(custOnly).unionByName(all)
        .groupBy(col("tag")).agg(count(lit(1)).as("n"))
        .orderBy(col("tag"))
    }),

    // E19: ROLLUP over the region→nation hierarchy (labelled via coalesce
    // so both engines agree on subtotal rows).
    "q12_rollup" -> ((s, d) => {
      customer(s, d)
        .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_cust"), dsum(col("c_acctbal")).as("sum_bal"))
        .select(coalesce(col("r_name"), lit("ALL")).as("region"),
          coalesce(col("n_name"), lit("ALL")).as("nation"),
          col("n_cust"), col("sum_bal"))
        .orderBy(col("region"), col("nation"))
    }),

    // E19: CUBE over order status × priority.
    "q13_cube" -> ((s, d) => {
      orders(s, d)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
        .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n"), col("sum_price"))
        .orderBy(col("status"), col("priority"))
    }),

    // E17: DISTINCT + count(DISTINCT) (exact distinct-rewrite path).
    "q14_distinct" -> ((s, d) => {
      lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          count(lit(1)).as("n_rows"))
        .orderBy(col("l_returnflag"))
    }),

    // E31: top-k per group via ranked window (top 3 orders per priority).
    "q15_topk_per_group" -> ((s, d) => {
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      orders(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("o_orderpriority"), col("rn"), col("o_orderkey"),
          round(col("o_totalprice"), 2).as("o_totalprice"))
        .orderBy(col("o_orderpriority"), col("rn"))
    }),

    // E20: statistical aggregate battery.
    "q16_stats" -> ((s, d) => {
      events(s, d)
        .groupBy(col("event_type"))
        .agg(round(stddev_samp(col("value")), 6).as("std_val"),
          round(var_samp(col("value")), 6).as("var_val"),
          round(corr(col("value"), col("user_id").cast("double")), 6).as("corr_vu"),
          round(covar_samp(col("value"), col("user_id").cast("double")), 6).as("covar_vu"))
        .orderBy(col("event_type"))
    }),

    // E21: exact quantiles (Spark `percentile` ≡ DuckDB `quantile_cont`).
    "q17_quantiles" -> ((s, d) => {
      events(s, d)
        .groupBy(col("event_type"))
        .agg(round(expr("percentile(value, 0.5)"), 6).as("p50"),
          round(expr("percentile(value, 0.9)"), 6).as("p90"),
          round(expr("percentile(value, 0.99)"), 6).as("p99"))
        .orderBy(col("event_type"))
    }),

    // E23/P18: conditional aggregation — per-user fuzzy error rate.
    "q18_error_rate" -> ((s, d) => {
      events(s, d)
        .groupBy(col("user_id"))
        .agg(round(sum(when(col("event_type") === "error", 1).otherwise(0))
          .cast("double") / count(lit(1)), 6).as("error_rate"),
          count(lit(1)).as("n_events"))
        .orderBy(col("user_id"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_qty,
        |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_base_price,
        |  round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_disc_price,
        |  round(avg(l_quantity), 6) AS avg_qty,
        |  round(avg(l_discount), 6) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q02_filter_battery" ->
      """SELECT p_partkey, p_name, p_brand, p_size,
        |  round(p_retailprice, 2) AS p_retailprice
        |FROM part
        |WHERE p_size IN (1, 5, 11, 28, 37)
        |  AND p_type LIKE '%ECO%'
        |  AND regexp_matches(p_name, '^(red|blue) ')
        |  AND p_retailprice BETWEEN 100.0 AND 2000.0
        |ORDER BY p_partkey""".stripMargin,

    "q03_join_broadcast" ->
      """SELECT r_name, count(*) AS n_cust,
        |  round(avg(c_acctbal), 6) AS avg_bal,
        |  round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_bal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,

    "q04_join_fact" ->
      """SELECT o_orderpriority, count(*) AS n_items,
        |  round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE), 4) AS revenue
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q05_join_left_outer" ->
      """SELECT c_custkey, c_mktsegment,
        |  count(o_orderkey) AS n_orders,
        |  round(CAST(sum(CAST(coalesce(o_totalprice, 0.0) AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_spent
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey, c_mktsegment ORDER BY c_custkey""".stripMargin,

    "q06_join_semi" ->
      """SELECT c_nationkey, count(*) AS n_cust
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,

    "q07_join_anti" ->
      """SELECT c_mktsegment, count(*) AS n_cust, round(avg(c_acctbal), 6) AS avg_bal
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q08_join_range" ->
      """SELECT e1.event_type AS type1, e2.event_type AS type2, count(*) AS n_pairs
        |FROM events e1 JOIN events e2 ON e1.user_id = e2.user_id
        |WHERE e2.ts > e1.ts AND e2.ts <= e1.ts + INTERVAL 5 MINUTE
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q09_asof_join" ->
      """WITH ev AS (
        |  SELECT *, date_trunc('day', ts) AS day FROM events
        |), model AS (
        |  SELECT event_type, date_trunc('day', ts) AS model_day, avg(value) AS model_avg
        |  FROM events GROUP BY 1, 2
        |), ranked AS (
        |  SELECT ev.event_type, ev.event_id, ev.value, model.model_avg,
        |    row_number() OVER (PARTITION BY ev.event_id ORDER BY model.model_day DESC) AS rn
        |  FROM ev JOIN model ON ev.event_type = model.event_type
        |    AND model.model_day < ev.day
        |)
        |SELECT event_type, count(*) AS n_scored,
        |  round(avg(abs(value - model_avg)), 6) AS avg_abs_err
        |FROM ranked WHERE rn = 1
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q10_cross_join" ->
      """SELECT r_name, c_mktsegment
        |FROM region CROSS JOIN (SELECT DISTINCT c_mktsegment FROM customer) s
        |ORDER BY r_name, c_mktsegment""".stripMargin,

    "q11_setops" ->
      """WITH cn AS (SELECT DISTINCT c_nationkey AS nk FROM customer),
        |     sn AS (SELECT DISTINCT s_nationkey AS nk FROM supplier),
        |     tagged AS (
        |       SELECT nk, 'both' AS tag FROM (SELECT nk FROM cn INTERSECT SELECT nk FROM sn)
        |       UNION ALL
        |       SELECT nk, 'cust_only' AS tag FROM (SELECT nk FROM cn EXCEPT SELECT nk FROM sn)
        |       UNION ALL
        |       SELECT nk, 'any' AS tag FROM (SELECT nk FROM cn UNION SELECT nk FROM sn)
        |     )
        |SELECT tag, count(*) AS n FROM tagged GROUP BY tag ORDER BY tag""".stripMargin,

    "q12_rollup" ->
      """SELECT coalesce(r_name, 'ALL') AS region, coalesce(n_name, 'ALL') AS nation,
        |  count(*) AS n_cust,
        |  round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_bal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)
        |ORDER BY region, nation""".stripMargin,

    "q13_cube" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |  coalesce(o_orderpriority, 'ALL') AS priority,
        |  count(*) AS n,
        |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_price
        |FROM orders
        |GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin,

    "q14_distinct" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS n_parts,
        |  count(DISTINCT l_suppkey) AS n_supps,
        |  count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q15_topk_per_group" ->
      """SELECT o_orderpriority, rn, o_orderkey, round(o_totalprice, 2) AS o_totalprice
        |FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders
        |) WHERE rn <= 3
        |ORDER BY o_orderpriority, rn""".stripMargin,

    "q16_stats" ->
      """SELECT event_type,
        |  round(stddev_samp(value), 6) AS std_val,
        |  round(var_samp(value), 6) AS var_val,
        |  round(corr(value, CAST(user_id AS DOUBLE)), 6) AS corr_vu,
        |  round(covar_samp(value, CAST(user_id AS DOUBLE)), 6) AS covar_vu
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q17_quantiles" ->
      """SELECT event_type,
        |  round(quantile_cont(value, 0.5), 6) AS p50,
        |  round(quantile_cont(value, 0.9), 6) AS p90,
        |  round(quantile_cont(value, 0.99), 6) AS p99
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q18_error_rate" ->
      """SELECT user_id,
        |  round(CAST(count(*) FILTER (WHERE event_type = 'error') AS DOUBLE)
        |    / count(*), 6) AS error_rate,
        |  count(*) AS n_events
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin
  )
}
