package graft.registry

import graft.anomaly.Threshold
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Model registry (SURVEY §2 P12/P13): the reference stored fitted
  * preprocess/threshold artifacts in Redis keyed by config; the engine's
  * registry is a parquet/table frame keyed by (composite key, trained_at)
  * — append-only, resolved by as-of lookup, joined broadcast (a model row
  * is tiny; at 100 TB the registry stays MBs while facts are TBs).
  */
object ModelRegistry {

  /** P12 trainer: fit one threshold model per (key, training day) from that
    * day's history. One grouped aggregation — partial aggregation map-side,
    * one shuffle on the composite key + day. Uses the builtin-aggregate fit
    * (codegen'd partials) rather than the typed Aggregator: at fact scale
    * the trainer reads the full history, so the aggregation is the job. */
  def train(events: DataFrame, keys: Seq[String], value: String,
            ts: String, k: Double = 3.0): DataFrame =
    Threshold.fitBuiltin(
      events.withColumn("trained_at", date_trunc("day", col(ts))),
      keys :+ "trained_at", value, k)

  /** Persist models (append-only registry convention). */
  def save(models: DataFrame, path: String): Unit =
    models.write.mode("append").parquet(path)

  def load(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** P13 as-of resolution: latest model per key with trained_at <= cutoff.
    * Ranking runs at key grain (small), never at fact grain. */
  def latestAsOf(registry: DataFrame, keys: Seq[String], cutoff: org.apache.spark.sql.Column): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("trained_at").desc)
    registry.filter(col("trained_at") <= cutoff)
      .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** P6/P7 load-or-fallback (reference `CHANGELOG.md:139,34`): score facts
    * with the fitted model where one resolves; otherwise fall back to the
    * configured static upper limit. Left join + coalesce keeps the error
    * path on the same single plan. */
  def scoreWithFallback(facts: DataFrame, models: DataFrame, keys: Seq[String],
                        value: String, staticLimit: Double): DataFrame = {
    // nanvl: a NaN threshold (e.g. an externally-written registry row) must
    // take the static path, not silently poison every score for its key.
    val thr = nanvl(col("threshold"), lit(null).cast("double"))
    facts.join(broadcast(models), keys, "left")
      .withColumn("model_source",
        when(thr.isNotNull, lit("fitted")).otherwise(lit("static")))
      .withColumn("score",
        Threshold.score(col(value), coalesce(thr, lit(staticLimit))))
  }
}
