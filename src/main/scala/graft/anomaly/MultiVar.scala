package graft.anomaly

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multivariate co-windowing: several metrics of one entity assembled into
  * a `[w × n_features]` window MATRIX per composite key — the reference's
  * actual window payload (its changelog describes 2-D `[w, n_features]`
  * model inputs, `reference/CHANGELOG.md:74,189`; SURVEY §1.2 maps the
  * shape to `ArrayType(ArrayType(Double))`). The univariate assembler
  * (P3, `StreamOps.assemblerVec`) is the n_features = 1 special case.
  *
  * Shared batch/streaming semantics (the streaming face is
  * [[graft.stream.StreamOps.coWindowStream]]; MultiVarSpec pins parity):
  *  - time is bucketed into 1-hour STEPS; per (key, step, feature) the
  *    step's LAST sample (by ts, then event_id) is the step value;
  *  - missing features CARRY FORWARD the last known value (the standard
  *    co-windowing fill for irregular multi-metric streams); a step row
  *    exists only where the key saw ≥1 feature sample;
  *  - steps are emitted only once EVERY feature has been observed at
  *    least once (warm-up rows have no defined vector);
  *  - the matrix is the trailing `w` step-vectors (row-based, like the
  *    count-based univariate window), oldest row first, each row in the
  *    caller's fixed feature order.
  *
  * Scale shape: one keyed aggregation (key, step, feature), one pivot to
  * `n_features` columns (a grouped aggregation — the feature list is
  * FIXED, so no second pass to discover values), and one row-frame window
  * over (key ORDER BY step) for fill + assembly. Everything shuffles once
  * on the key; no per-feature join, no explode at matrix grain. At 100 TB
  * the plan is the same three keyed stages.
  */
object MultiVar {

  /** Batch co-window: `events(keyCol, tsCol, ordCol, metricCol, valueCol)`
    * → one row per (key, step) with `mat: array<array<double>>` of shape
    * `[w][features.size]`. */
  def coWindowMat(events: DataFrame, keyCol: String, tsCol: String,
                  ordCol: String, metricCol: String, valueCol: String,
                  features: Seq[String], w: Int): DataFrame = {
    require(features.nonEmpty && features.distinct == features,
      "features must be a non-empty list of distinct metric names")
    val stepped = events
      .filter(col(metricCol).isin(features: _*))
      .withColumn("step_ts", date_trunc("hour", col(tsCol)))
      .groupBy(col(keyCol), col("step_ts"), col(metricCol))
      .agg(max_by(col(valueCol), struct(col(tsCol), col(ordCol))).as("__v"))
    // fixed-list pivot: one grouped aggregation, no value-discovery pass
    val pivoted = stepped.groupBy(col(keyCol), col("step_ts"))
      .pivot(metricCol, features)
      .agg(first(col("__v")))
    val fill = Window.partitionBy(col(keyCol)).orderBy(col("step_ts"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = features.foldLeft(pivoted)((df, f) =>
      df.withColumn(f, last(col(f), ignoreNulls = true).over(fill)))
    val complete = filled
      .filter(features.map(col(_).isNotNull).reduce(_ && _))
    val asm = Window.partitionBy(col(keyCol)).orderBy(col("step_ts"))
      .rowsBetween(-(w - 1), Window.currentRow)
    complete
      .withColumn("mat", collect_list(array(features.map(col): _*)).over(asm))
      .filter(size(col("mat")) === w)
      .select(col(keyCol), col("step_ts").as("end_ts"), col("mat"))
  }

  /** Multivariate PCA on the window matrix: flatten `[w × f]` row-major to
    * a `w·f` vector and reuse the univariate machinery ([[Pca.fit]] /
    * [[Pca.reconErrExpr]]) at dim = w·f — a linear model on the flattened
    * matrix IS the matrix model (the reference's AE consumes the 2-D
    * window the same way: its first layer contracts over both axes). */
  def fitMat(windows: DataFrame, keyCol: String, matCol: String,
             w: Int, nFeatures: Int, k: Int): DataFrame =
    Pca.fit(windows.withColumn("__flat", flatten(col(matCol))),
      keyCol, "__flat", w * nFeatures, k)

  /** Reconstruction error per window matrix against [[fitMat]] models —
    * broadcast model join + one map-side array expression. */
  def reconstructionError(windows: DataFrame, models: DataFrame,
                          keyCol: String, matCol: String): DataFrame =
    Pca.reconstructionError(
      windows.withColumn("__flat", flatten(col(matCol))),
      models, keyCol, "__flat").drop("__flat")
}
