package graft.anomaly

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference pipeline's score stages as composable DataFrame transforms
  * (SURVEY §2 P3, P6–P10, P18). Each is a pure plan fragment — Catalyst
  * fuses the whole chain into a single job with one window shuffle.
  */
object AnomalyOps {

  /** P3 batch form: per-composite-key sliding stats over the last `w`
    * samples ordered by (ts, tiebreak). One shuffle on the composite key;
    * the window frame is rows-bounded so state is O(w) per key — the same
    * bound the streaming assembler keeps (no unbounded collect_list).
    */
  def rollingStats(df: DataFrame, keys: Seq[String], ts: String, tiebreak: String,
                   value: String, w: Int): DataFrame = {
    val win = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(ts), col(tiebreak))
      .rowsBetween(-(w - 1), Window.currentRow)
    df.withColumn("roll_avg", avg(col(value)).over(win))
      .withColumn("roll_std", stddev_samp(col(value)).over(win))
      .withColumn("roll_cnt", count(lit(1)).over(win))
  }

  /** P3 window-matrix form: emit the ordered sample array itself (w-bounded). */
  def assembleWindows(df: DataFrame, keys: Seq[String], ts: String, tiebreak: String,
                      value: String, w: Int): DataFrame = {
    val win = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(ts), col(tiebreak))
      .rowsBetween(-(w - 1), Window.currentRow)
    df.withColumn("win_arr", collect_list(col(value)).over(win))
      .filter(size(col("win_arr")) === w)
  }

  /** P6 proxy inference: reconstruction error vs the rolling mean
    * (the engine's baseline "model": predict the window mean). */
  def reconstructionError(value: Column, prediction: Column): Column =
    abs(value - prediction)

  /** P7 rolling threshold score: err / (mu + k*sigma). */
  def rollingScore(err: Column, mean: Column, std: Column, k: Double = 3.0): Column =
    err / (mean + lit(k) * std + lit(1e-6))

  /** P8 postprocess: squash raw score into [0, 10) — 10 * tanh(x / scale)
    * (numalogic TanhNorm; reference `CHANGELOG.md:42`). */
  def tanhNorm(raw: Column, scale: Double = 1.0): Column =
    lit(10.0) * tanh(raw / lit(scale))

  /** P9 ensemble: weighted mean of member model scores. */
  def ensemble(scores: Seq[(Column, Double)]): Column = {
    val totalW = scores.map(_._2).sum
    scores.map { case (c, wt) => c * lit(wt) }.reduce(_ + _) / lit(totalW)
  }

  /** P10 unified anomaly: one score per app/namespace = max over member
    * metrics (reference `CHANGELOG.md:293`). */
  def unifiedMax(df: DataFrame, keys: Seq[String], score: String): DataFrame =
    df.groupBy(keys.map(col): _*).agg(max(col(score)).as("unified_score"))

  /** P10 weighted variant: config-weighted mean over member metrics
    * (weight map keyed by the member column, default weight 1.0). */
  def unifiedWeighted(df: DataFrame, keys: Seq[String], score: String,
                      member: String, weights: Map[String, Double]): DataFrame = {
    val w = weights.foldLeft(lit(1.0)) { case (acc, (m, wt)) =>
      when(col(member) === m, lit(wt)).otherwise(acc)
    }
    df.groupBy(keys.map(col): _*)
      .agg(max(col(score)).as("unified_score"),
        (sum(col(score) * w) / sum(w)).as("unified_weighted"))
  }

  /** P18 derived ratio metric: error-rate = errors / total over the group. */
  def errorRate(isError: Column): Column =
    sum(when(isError, lit(1)).otherwise(lit(0))).cast("double") / count(lit(1))

  /** P17 rollouts: the composite key is just `keys :+ hashIdCol` — provided
    * as a named helper to mirror the reference's configurable hash_id column
    * (`CHANGELOG.md:481,497`). */
  def rolloutKeys(keys: Seq[String], hashIdCol: String): Seq[String] = keys :+ hashIdCol
}
