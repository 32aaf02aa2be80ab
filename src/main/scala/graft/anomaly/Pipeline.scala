package graft.anomaly

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Config for the composed scoring pipeline — mirrors the reference's
  * omegaconf-driven per-metric settings (filter list `CHANGELOG.md:336`,
  * window length `:189`, threshold k `:447`, tanh postprocess `:42`,
  * unified weights `:293,317`).
  */
case class PipelineConfig(
    keyCols: Seq[String] = Seq("user_id", "event_type"),
    tsCol: String = "ts",
    tiebreakCol: String = "event_id",
    valueCol: String = "value",
    metricFilter: Seq[String] = Nil,  // empty = keep all
    window: Int = 12,
    thresholdK: Double = 3.0,
    tanhScale: Double = 1.0)

/** The reference's vertex chain (P2→P3→P5→P6→P7→P8) as ONE configurable
  * `DataFrame => DataFrame` — what a numalogic-prometheus user calls
  * instead of deploying the Numaflow pipeline. Produces the input frame
  * plus `roll_avg`, `roll_std`, `err`, `score`. Catalyst fuses the chain
  * into a single job with one window shuffle.
  */
object Pipeline {
  def score(df: DataFrame, conf: PipelineConfig = PipelineConfig()): DataFrame = {
    val filtered =
      if (conf.metricFilter.isEmpty) df
      else df.filter(col(conf.keyCols.last).isin(conf.metricFilter: _*))
    AnomalyOps.rollingStats(filtered, conf.keyCols, conf.tsCol, conf.tiebreakCol,
        conf.valueCol, conf.window)
      .filter(col("roll_cnt") === conf.window)
      .withColumn("err",
        AnomalyOps.reconstructionError(col(conf.valueCol), col("roll_avg")))
      .withColumn("score", AnomalyOps.tanhNorm(
        AnomalyOps.rollingScore(col("err"), col("roll_avg"), col("roll_std"),
          conf.thresholdK), conf.tanhScale))
  }
}
