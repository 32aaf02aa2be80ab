package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** InfluxDB line-protocol ingestion (the other text wire format a
  * metrics engine meets in the wild; Prometheus's influxdb_exporter
  * lineage):
  *
  *   measurement[,tag=v[,tag2=v2…]] field=value[,field2=v2…] [ts-ns]
  *
  * Pure column regexes like the OpenMetrics parser — map-side at scan
  * speed, zero UDFs. One output row per FIELD (the line-protocol → Prom
  * translation: measurement_field becomes the metric). Handled grammar:
  * unescaped names, float values, `i`-suffixed integers; quoted string
  * fields and booleans are dropped (non-numeric → null value, the
  * try_cast discipline), malformed lines yield a null measurement and
  * are filtered. Timestamps are nanoseconds (the protocol default),
  * truncated to µs; a line without one gets a null ts. */
object InfluxLine {

  private val LineRe = "^([A-Za-z_][^, ]*?)(?:,([^ ]*))? ([^ ]+)(?: (\\d+))?$"

  /** Parse a frame of line-protocol text rows into samples:
    * `measurement`, `tags` (map), `field`, `metric`
    * (`measurement_field`), `value` (double), `ts` (timestamp, nullable). */
  def parse(df: DataFrame, lineCol: String = "line"): DataFrame = {
    val base = df
      .withColumn("__m", regexp_extract(col(lineCol), LineRe, 1))
      .withColumn("__tags", regexp_extract(col(lineCol), LineRe, 2))
      .withColumn("__fields", regexp_extract(col(lineCol), LineRe, 3))
      .withColumn("__ts", regexp_extract(col(lineCol), LineRe, 4))
      .filter(col("__m") =!= "")
    base.select(
        col("__m").as("measurement"),
        when(col("__tags") =!= "",
          str_to_map(col("__tags"), lit(","), lit("="))).otherwise(
          map().cast("map<string,string>")).as("tags"),
        explode(split(col("__fields"), ",")).as("__fv"),
        col("__ts"))
      .select(
        col("measurement"), col("tags"),
        substring_index(col("__fv"), "=", 1).as("field"),
        concat(col("measurement"), lit("_"),
          substring_index(col("__fv"), "=", 1)).as("metric"),
        regexp_replace(substring_index(col("__fv"), "=", -1), "i$", "")
          .try_cast("double").as("value"),
        when(col("__ts") =!= "",
          timestamp_micros((col("__ts").try_cast("decimal(38,0)") /
            lit(1000)).try_cast("long"))).as("ts"))
  }

  /** Render samples INTO line protocol (the round-trip inverse): one
    * line per row, one field per line. */
  def render(df: DataFrame, measurement: org.apache.spark.sql.Column,
             tags: Seq[(String, org.apache.spark.sql.Column)],
             field: String, valueCol: org.apache.spark.sql.Column,
             tsCol: org.apache.spark.sql.Column): DataFrame = {
    val tagStr = tags.map { case (k, c) =>
      concat(lit("," + k + "="), c.cast("string"))
    }.foldLeft(lit(""): org.apache.spark.sql.Column)(concat(_, _))
    df.select(concat(measurement, tagStr, lit(" " + field + "="),
      format_string("%.6f", valueCol.cast("double")),
      lit(" "), (unix_micros(tsCol) * 1000L).cast("string")).as("line"))
  }
}
