package graft.anomaly

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Preprocess scalers (SURVEY §2 P5; reference `CHANGELOG.md:190,456`).
  *
  * The reference fitted per-series scalers (min-max, log, tanh) as stored
  * artifacts. Spark-first re-expression: "fit" is a grouped aggregation
  * producing a small stats frame; "apply" is a broadcast join of the stats
  * back onto the samples plus a pure column expression. At 100 TB the fit
  * is one map-side-combined shuffle over the composite key and the stats
  * frame is tiny (one row per series), so the apply join is always
  * broadcastable.
  *
  * NaN/Inf scrub-to-0.0 follows reference `CHANGELOG.md:420`.
  */
object Scalers {

  /** NaN/Inf → 0.0, null preserved (reference scrub rule). */
  def scrub(c: Column): Column =
    when(isnan(c) || c === lit(Double.PositiveInfinity) || c === lit(Double.NegativeInfinity), lit(0.0))
      .otherwise(c)

  /** Fit: per-key min/max stats. One shuffle, partial aggregation map-side. */
  def minMaxFit(df: DataFrame, keys: Seq[String], value: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(min(col(value)).as("fit_min"), max(col(value)).as("fit_max"))

  /** Apply min-max: (x - min) / (max - min), degenerate range → 0.0. */
  def minMaxApply(df: DataFrame, fit: DataFrame, keys: Seq[String], value: String,
                  out: String = "scaled"): DataFrame =
    df.join(broadcast(fit), keys)
      .withColumn(out,
        when(col("fit_max") === col("fit_min"), lit(0.0))
          .otherwise((col(value) - col("fit_min")) / (col("fit_max") - col("fit_min"))))

  /** Fit: per-key mean/stddev_samp for z-scoring. */
  def zScoreFit(df: DataFrame, keys: Seq[String], value: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(avg(col(value)).as("fit_mean"), stddev_samp(col(value)).as("fit_std"))

  /** Apply z-score with clipping to [-clip, clip]. */
  def zScoreApply(df: DataFrame, fit: DataFrame, keys: Seq[String], value: String,
                  clip: Double = 3.0, out: String = "zscore"): DataFrame =
    df.join(broadcast(fit), keys)
      .withColumn(out,
        least(greatest((col(value) - col("fit_mean")) / (col("fit_std") + lit(1e-9)),
          lit(-clip)), lit(clip)))

  /** Log transform: ln(1 + x) (stateless; reference log transform). */
  def logTransform(c: Column): Column = log1p(c)

  /** Tanh scaler: tanh(x / scale) in [0, 1) for x >= 0 (numalogic TanhScaler shape). */
  def tanhScale(c: Column, scale: Double): Column = tanh(c / lit(scale))
}
