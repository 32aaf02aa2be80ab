package graft.metrics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Thanos-style downsampling (thanos compact --downsample): raw samples
  * reduce to fixed-resolution AGGR CHUNKS per series — `count`, `sum`,
  * `min`, `max`, and `counter` (the last raw value, for reset-aware rate
  * over downsampled data). A query over downsampled data then picks the
  * matching aggregate: avg = Σsum/Σcount, min = min(min), max = max(max)
  * — EXACT for windows aligned to chunk boundaries, which is why Thanos
  * aligns its 5m/1h resolutions to the raw block grid.
  *
  * This is THE 100 TB metrics lever: a year of 15s-scrape raw data
  * re-queried at dashboard zoom levels touches 20×/240× fewer rows from
  * the 5m/1h chunk tables, and chunk building is ONE keyed aggregation
  * (map-side partial) whose output is |series|·|windows| rows.
  *
  * Determinism: count/min/max are exact; `sum` is DECIMAL-routed over
  * 6-dp-rounded values (the repo-wide fold-order discipline) so the
  * chunk table — and any window re-aggregated from it — hashes
  * identically cross-engine. `counter` picks the in-window last sample
  * by (ts, orderCol), a total order.
  */
object Downsample {

  /** Build aggr chunks at `resolution` (e.g. "5 minutes"): one row per
    * (series key, window start). */
  def aggrChunks(df: DataFrame, seriesKey: Seq[String], tsCol: String,
                 orderCol: String, valueCol: String,
                 resolution: String): DataFrame = {
    val v = col(valueCol)
    df.groupBy(seriesKey.map(PromQlParser.labelCol) :+
        window(col(tsCol), resolution).getField("start").as("chunk_ts"): _*)
      .agg(count(lit(1)).as("c_count"),
        sum(round(v, 6).cast("decimal(18,6)")).cast("double").as("c_sum"),
        min(v).as("c_min"),
        max(v).as("c_max"),
        max_by(v, struct(col(tsCol), col(orderCol))).as("c_counter"))
  }

  /** The compactor CHAIN: coarser aggr chunks built FROM finer ones
    * (1h from 5m — Thanos' second downsampling level never re-reads
    * raw). For aligned grains this is EXACT-equal to building from raw:
    * counts/min/max compose, the decimal re-fold sums 6-dp-exact chunk
    * sums, and the counter picks the last finer chunk's counter (same
    * (ts) total order). q226 hash-proves the identity per chunk. */
  def downsampleChunks(chunks: DataFrame, seriesKey: Seq[String],
                       grain: String): DataFrame =
    chunks.withColumnRenamed("chunk_ts", "src_ts")
      .groupBy(seriesKey.map(PromQlParser.labelCol) :+
        window(col("src_ts"), grain).getField("start").as("chunk_ts"): _*)
      .agg(sum(col("c_count")).as("c_count"),
        sum(col("c_sum").cast("decimal(18,6)")).cast("double").as("c_sum"),
        min(col("c_min")).as("c_min"),
        max(col("c_max")).as("c_max"),
        max_by(col("c_counter"), col("src_ts")).as("c_counter"))

  /** Thanos' auto-downsampling pick: `maxSourceResolution = range / 5`;
    * serve the coarsest available level whose resolution still fits.
    * With the standard raw/5m/1h ladder: sub-25m ranges read raw, sub-5h
    * ranges read 5m, everything longer reads 1h. */
  def selectLevel(rangeSec: Long): String = {
    val maxRes = rangeSec / 5
    if (maxRes >= 3600L) "1h" else if (maxRes >= 300L) "5m" else "raw"
  }

  /** Re-aggregate chunks to a coarser aligned grain (e.g. hourly):
    * Σcount, Σsum, min(min), max(max), last counter by chunk_ts — the
    * query-time form Thanos' downsampled queriers run. */
  def reAggregate(chunks: DataFrame, seriesKey: Seq[String],
                  grain: String): DataFrame =
    chunks.groupBy(seriesKey.map(PromQlParser.labelCol) :+
        window(col("chunk_ts"), grain).getField("start").as("w_ts"): _*)
      .agg(sum(col("c_count")).as("n"),
        sum(col("c_sum").cast("decimal(18,6)")).cast("double").as("v_sum"),
        min(col("c_min")).as("v_min"),
        max(col("c_max")).as("v_max"),
        max_by(col("c_counter"), col("chunk_ts")).as("v_counter"))
      .withColumn("v_avg", col("v_sum") / col("n"))
}
