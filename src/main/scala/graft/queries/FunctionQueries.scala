package graft.queries

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar-function battery (SURVEY §2 E34–E40, E50): strings, date/time,
  * math, arrays (higher-order functions), JSON, null/NaN handling, and
  * explode/unnest. Each function appears in at least one declared query so
  * the oracle pins its cross-engine semantics.
  */
object FunctionQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // E34: string functions.
    "q24_string_funcs" -> ((s, d) => {
      part(s, d)
        .filter(col("p_partkey") < 100)
        .select(col("p_partkey"),
          lower(col("p_name")).as("lo"),
          upper(col("p_brand")).as("up"),
          concat_ws("|", col("p_name"), col("p_type")).as("joined"),
          substring(col("p_name"), 1, 4).as("sub4"),
          length(col("p_name")).cast("long").as("len"),
          size(split(col("p_name"), " ")).cast("long").as("n_words"),
          regexp_extract(col("p_name"), "^(\\w+)", 1).as("first_word"),
          regexp_replace(col("p_name"), "[aeiou]", "_").as("devoweled"),
          levenshtein(col("p_brand"), lit("Brand#11")).cast("long").as("lev"),
          trim(concat(lit("  "), col("p_brand"), lit("  "))).as("trimmed"))
        .orderBy(col("p_partkey"))
    }),

    // E35: date/time functions (µs-integer arithmetic keeps engines aligned).
    "q25_date_funcs" -> ((s, d) => {
      orders(s, d)
        .select(year(col("o_orderdate")).cast("long").as("yr"),
          month(col("o_orderdate")).cast("long").as("mo"),
          dayofmonth(col("o_orderdate")).cast("long").as("dom"),
          date_trunc("month", col("o_orderdate")).as("month_start"),
          (unix_micros(col("o_orderdate")) / 86400000000L).cast("long").as("epoch_day"))
        .groupBy(col("yr"), col("mo"))
        .agg(count(lit(1)).as("n"),
          min(col("dom")).as("min_dom"), max(col("dom")).as("max_dom"),
          min(col("month_start")).as("month_start"),
          min(col("epoch_day")).as("min_epoch_day"))
        .orderBy(col("yr"), col("mo"))
    }),

    // E36: math battery.
    "q26_math_funcs" -> ((s, d) => {
      lineitem(s, d)
        .filter(col("l_orderkey") < 100)
        .select(col("l_orderkey"), col("l_linenumber"),
          round(abs(-col("l_quantity")), 2).as("abs_qty"),
          round(exp(col("l_discount")), 6).as("exp_disc"),
          round(log(col("l_extendedprice") + 1), 6).as("ln_price"),
          round(sqrt(col("l_quantity")), 6).as("sqrt_qty"),
          round(pow(col("l_tax"), 2), 6).as("tax_sq"),
          pmod(col("l_partkey"), lit(7)).cast("long").as("pk_mod7"),
          signum(col("l_discount") - 0.05).as("sign_disc"),
          round(greatest(col("l_quantity"), col("l_tax") * 100), 2).as("gr"),
          round(least(col("l_quantity"), col("l_discount") * 100), 2).as("le"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // E37: array higher-order functions over float embeddings (cast to
    // double element-wise so both engines fold identical values).
    "q27_array_funcs" -> ((s, d) => {
      embeddings(s, d)
        .withColumn("emb", transform(col("embedding"), _.cast("double")))
        .select(col("vec_id"),
          size(col("emb")).cast("long").as("dim"),
          round(element_at(col("emb"), 1), 6).as("e1"),
          round(aggregate(slice(col("emb"), 1, 4), lit(0.0), (a, x) => a + x), 6).as("sum4"),
          round(array_max(col("emb")), 6).as("mx"),
          round(array_min(col("emb")), 6).as("mn"),
          round(element_at(array_sort(col("emb")), 2), 6).as("second_smallest"),
          round(aggregate(filter(col("emb"), _ > 0), lit(0.0), (a, x) => a + x), 6).as("pos_sum"),
          size(filter(col("emb"), _ > 0)).cast("long").as("n_pos"))
        .orderBy(col("vec_id"))
    }),

    // E39: JSON extraction from the events.props payload.
    "q28_json_funcs" -> ((s, d) => {
      events(s, d)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy(col("event_type"))
        .agg(sum(col("k")).as("sum_k"),
          count(when(col("k") > 50, 1)).as("n_large"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"))
        .orderBy(col("event_type"))
    }),

    // E40: null / NaN discipline — NaN injection, isnan, scrub-to-0
    // (reference `CHANGELOG.md:420`), coalesce.
    "q29_null_nan" -> ((s, d) => {
      events(s, d)
        .withColumn("v", when(col("value") < 1.0, lit(Double.NaN)).otherwise(col("value")))
        .withColumn("scrubbed", graft.anomaly.Scalers.scrub(col("v")))
        .withColumn("k", get_json_object(col("props"), "$.missing").cast("double"))
        .groupBy(col("event_type"))
        .agg(sum(when(isnan(col("v")), 1).otherwise(0)).as("n_nan"),
          round(sum(col("scrubbed")), 2).as("sum_scrubbed"),
          round(sum(coalesce(col("k"), lit(-1.0))), 2).as("sum_coalesced"))
        .orderBy(col("event_type"))
    }),

    // E50: posexplode/unnest of embedding vectors back to rows.
    "q30_explode" -> ((s, d) => {
      embeddings(s, d)
        .filter(col("vec_id") < 20)
        .select(col("vec_id"), posexplode(col("embedding")))
        .select(col("vec_id"), (col("pos") + 1).cast("long").as("pos"),
          round(col("col").cast("double"), 6).as("val"))
        .orderBy(col("vec_id"), col("pos"))
    }),

    // E38/A7: map functions — defaults ⊕ call-site label merge with
    // LAST_WIN (≅ dict | dict, reference metrics.py:67). Output projected
    // to scalars (sorted key list as one string) so the driver compare can
    // sort rows; the oracle re-derives the merge semantics relationally.
    // Full map semantics additionally asserted in MetricsSpec.
    "q31_map_funcs" -> ((s, d) => {
      s.conf.set("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
      events(s, d)
        .filter(col("event_id") < 100)
        .withColumn("defaults", map(lit("pipeline"), lit("anomaly"), lit("source"), lit("default")))
        .withColumn("callsite", map(lit("source"), col("event_type"), lit("user"), col("user_id").cast("string")))
        .withColumn("merged", map_concat(col("defaults"), col("callsite")))
        .select(col("event_id"),
          array_join(array_sort(map_keys(col("merged"))), ",").as("keys"),
          size(map_keys(col("merged"))).cast("long").as("n_keys"),
          element_at(col("merged"), "source").as("source_label"),
          element_at(col("merged"), "pipeline").as("pipeline_label"),
          element_at(col("merged"), "user").as("user_label"))
        .orderBy(col("event_id"))
    })
  )

  val oracle: Map[String, String] = Map(
    // Right-biased merge re-derived relationally: callsite 'source' wins
    // over the default, defaults-only 'pipeline' survives, union of keys.
    "q31_map_funcs" ->
      """SELECT event_id,
        |  'pipeline,source,user' AS keys,
        |  CAST(3 AS BIGINT) AS n_keys,
        |  event_type AS source_label,
        |  'anomaly' AS pipeline_label,
        |  CAST(user_id AS VARCHAR) AS user_label
        |FROM events WHERE event_id < 100 ORDER BY event_id""".stripMargin,

    "q24_string_funcs" ->
      """SELECT p_partkey, lower(p_name) AS lo, upper(p_brand) AS up,
        |  concat_ws('|', p_name, p_type) AS joined,
        |  substring(p_name, 1, 4) AS sub4,
        |  length(p_name) AS len,
        |  len(string_split(p_name, ' ')) AS n_words,
        |  regexp_extract(p_name, '^(\w+)', 1) AS first_word,
        |  regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
        |  levenshtein(p_brand, 'Brand#11') AS lev,
        |  trim('  ' || p_brand || '  ') AS trimmed
        |FROM part WHERE p_partkey < 100 ORDER BY p_partkey""".stripMargin,

    "q25_date_funcs" ->
      """SELECT extract(year FROM o_orderdate) AS yr,
        |  extract(month FROM o_orderdate) AS mo,
        |  count(*) AS n,
        |  min(extract(day FROM o_orderdate)) AS min_dom,
        |  max(extract(day FROM o_orderdate)) AS max_dom,
        |  min(date_trunc('month', o_orderdate)) AS month_start,
        |  min(epoch_us(o_orderdate) // 86400000000) AS min_epoch_day
        |FROM orders GROUP BY 1, 2 ORDER BY yr, mo""".stripMargin,

    "q26_math_funcs" ->
      """SELECT l_orderkey, l_linenumber,
        |  round(abs(-l_quantity), 2) AS abs_qty,
        |  round(exp(l_discount), 6) AS exp_disc,
        |  round(ln(l_extendedprice + 1), 6) AS ln_price,
        |  round(sqrt(l_quantity), 6) AS sqrt_qty,
        |  round(pow(l_tax, 2), 6) AS tax_sq,
        |  l_partkey % 7 AS pk_mod7,
        |  CASE WHEN l_discount - 0.05 > 0 THEN 1.0
        |       WHEN l_discount - 0.05 < 0 THEN -1.0 ELSE 0.0 END AS sign_disc,
        |  round(greatest(l_quantity, l_tax * 100), 2) AS gr,
        |  round(least(l_quantity, l_discount * 100), 2) AS le
        |FROM lineitem WHERE l_orderkey < 100
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q27_array_funcs" ->
      """WITH t AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
        |  FROM embeddings
        |)
        |SELECT vec_id, len(emb) AS dim,
        |  round(emb[1], 6) AS e1,
        |  round(list_sum(emb[1:4]), 6) AS sum4,
        |  round(list_max(emb), 6) AS mx,
        |  round(list_min(emb), 6) AS mn,
        |  round(list_sort(emb)[2], 6) AS second_smallest,
        |  round(coalesce(list_sum(list_filter(emb, x -> x > 0)), 0.0), 6) AS pos_sum,
        |  len(list_filter(emb, x -> x > 0)) AS n_pos
        |FROM t ORDER BY vec_id""".stripMargin,

    "q28_json_funcs" ->
      """SELECT event_type,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  count(CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) > 50 THEN 1 END) AS n_large,
        |  min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
        |  max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q29_null_nan" ->
      """WITH t AS (
        |  SELECT event_type,
        |    CASE WHEN value < 1.0 THEN 'NaN'::DOUBLE ELSE value END AS v,
        |    CAST(json_extract_string(props, '$.missing') AS DOUBLE) AS k
        |  FROM events
        |), scrub AS (
        |  SELECT event_type, v, k,
        |    CASE WHEN isnan(v) OR v = 'Infinity'::DOUBLE OR v = '-Infinity'::DOUBLE
        |         THEN 0.0 ELSE v END AS scrubbed
        |  FROM t
        |)
        |SELECT event_type,
        |  CAST(sum(CASE WHEN isnan(v) THEN 1 ELSE 0 END) AS BIGINT) AS n_nan,
        |  round(sum(scrubbed), 2) AS sum_scrubbed,
        |  round(sum(coalesce(k, -1.0)), 2) AS sum_coalesced
        |FROM scrub GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q30_explode" ->
      """SELECT vec_id, CAST(g.i AS BIGINT) AS pos,
        |  round(CAST(embedding[g.i] AS DOUBLE), 6) AS val
        |FROM embeddings, (SELECT unnest(generate_series(1, 64)) AS i) g
        |WHERE vec_id < 20 AND g.i <= len(embedding)
        |ORDER BY vec_id, pos""".stripMargin
  )
}
