package graft.metrics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** PromQL-style query semantics over a sample stream — the query layer the
  * reference sits on top of (its pipeline consumes `query_range` pulls and
  * its outputs are scraped back into Prometheus; CHANGELOG.md:90,10).
  * Three canonical PromQL behaviors, as reusable DataFrame transforms:
  *
  *  - `counterIncrease` — `increase()`/`resets()`: per-series adjacent
  *    deltas where a value drop marks a counter reset and contributes the
  *    post-reset value (the Prometheus reset rule) instead of a negative.
  *  - `instantVector` — an instant query at evaluation time T: the latest
  *    sample per series within the staleness lookback window (T-lb, T].
  *  - `histogramQuantile` — `histogram_quantile(q, buckets)`: linear
  *    interpolation inside the first cumulative le-bucket whose count
  *    reaches q·total; the +Inf bucket clamps to the highest finite bound.
  *
  * All three are single-window / single-aggregation shapes: the series key
  * partitions every shuffle, so a 10k-series × month range query and a
  * 100 TB backfill run the same plan.
  */
object PromQl {

  /** Per-sample increase contributions with Prometheus counter-reset
    * handling. Input needs (series key cols, ts, orderCol, value); adds
    * `inc` (double, 0 for the first sample of a series), `reset` (1 when
    * the counter dropped). */
  def counterIncrease(samples: DataFrame, seriesKey: Seq[String],
                      tsCol: String, orderCol: String, valueCol: String): DataFrame = {
    val w = Window.partitionBy(seriesKey.map(col): _*)
      .orderBy(col(tsCol), col(orderCol))
    samples
      .withColumn("__prev", lag(col(valueCol), 1).over(w))
      .withColumn("__delta", col(valueCol) - col("__prev"))
      .withColumn("inc",
        when(col("__prev").isNull, lit(0.0))
          .when(col("__delta") < 0, col(valueCol)) // reset: count from zero
          .otherwise(col("__delta")))
      .withColumn("reset", when(col("__delta") < 0, 1).otherwise(0))
      .drop("__prev", "__delta")
  }

  /** Instant query: latest sample per series with ts in (T - lookback, T].
    * Series with no sample inside the lookback are stale and drop out —
    * exactly Prometheus staleness semantics. */
  def instantVector(samples: DataFrame, seriesKey: Seq[String],
                    tsCol: String, orderCol: String,
                    evalTs: String, lookback: String): DataFrame = {
    val w = Window.partitionBy(seriesKey.map(col): _*)
      .orderBy(col(tsCol).desc, col(orderCol).desc)
    samples
      .filter(col(tsCol) <= to_timestamp(lit(evalTs)) &&
        col(tsCol) > to_timestamp(lit(evalTs)) - expr(s"INTERVAL $lookback"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** `histogram_quantile(q, ...)` from raw samples: bucket by the finite
    * `bounds` (+Inf implicit), accumulate per-group cumulative counts, and
    * interpolate inside the target bucket. `quantiles` become one output
    * row per (group, q). Determinism: the rank `q·total` is computed in
    * DECIMAL (exact — q has 4 digits, counts are integers), as is the
    * numerator `(rank − prevCum)·(hi − lo)`; only ONE double division (by
    * the bucket count) and one addition remain, a fixed shape both engines
    * evaluate identically. A pure-double rank was observed to land 1 ulp
    * apart across engines exactly on a round-6 half boundary. */
  def histogramQuantile(samples: DataFrame, groupKey: Seq[String],
                        valueCol: String, bounds: Seq[Double],
                        quantiles: Seq[Double]): DataFrame = {
    val gcols = groupKey.map(col)
    // bucket index: first bound >= value; bounds.size = +Inf bucket
    val idx = bounds.zipWithIndex.foldRight(lit(bounds.size)) {
      case ((b, i), els) => when(col(valueCol) <= b, i).otherwise(els)
    }
    val counts = samples.withColumn("__b", idx)
      .groupBy(gcols :+ col("__b"): _*).agg(count(lit(1)).as("__cnt"))
    val wCum = Window.partitionBy(gcols: _*).orderBy(col("__b"))
    val wAll = Window.partitionBy(gcols: _*)
    val cum = counts
      .withColumn("__cum", sum(col("__cnt")).over(wCum))
      .withColumn("__total", sum(col("__cnt")).over(wAll))
    val qDf = cum.sparkSession.createDataFrame(
      quantiles.map(Tuple1.apply)).toDF("q")
    // per (group, q): the first bucket whose cumulative count reaches rank
    val wPick = Window.partitionBy(gcols :+ col("q"): _*).orderBy(col("__b"))
    val lo = bounds.zipWithIndex.foldRight(lit(0.0)) {
      case ((b, i), els) => when(col("__b") === i + 1, b).otherwise(els)
    } // lower edge of bucket __b (bucket 0 starts at 0)
    val hi = bounds.zipWithIndex.foldRight(lit(bounds.last)) {
      case ((b, i), els) => when(col("__b") === i, b).otherwise(els)
    } // +Inf bucket clamps to highest finite bound
    cum.join(broadcast(qDf))
      .withColumn("__rank", col("q").cast("decimal(6,4)") * col("__total"))
      .filter(col("__cum") >= col("__rank"))
      .withColumn("__rn", row_number().over(wPick))
      .filter(col("__rn") === 1)
      .withColumn("quantile_value",
        when(col("__b") === bounds.size, lit(bounds.last))
          .otherwise(lo +
            ((col("__rank") - (col("__cum") - col("__cnt"))) *
              (hi - lo).cast("decimal(10,1)")).cast("double") / col("__cnt")))
      .select(gcols ++ Seq(col("q"), col("quantile_value")): _*)
  }
}
