package graft.anomaly

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** One-pass numerically-stable (count, mean, M2) accumulator — the merge
  * formula is Chan et al.'s parallel variance update, so partial buffers
  * combine associatively across partitions (map-side partials at scale).
  */
case class StdDevBuf(n: Long, mean: Double, m2: Double) {
  def add(x: Double): StdDevBuf = {
    val n1 = n + 1
    val d = x - mean
    val mean1 = mean + d / n1
    StdDevBuf(n1, mean1, m2 + d * (x - mean1))
  }
  def merge(o: StdDevBuf): StdDevBuf = {
    if (o.n == 0) this
    else if (n == 0) o
    else {
      val nt = n + o.n
      val d = o.mean - mean
      StdDevBuf(nt, mean + d * o.n / nt, m2 + o.m2 + d * d * n * o.n / nt)
    }
  }
  /** None (→ SQL NULL) when n < 2, matching `stddev_samp` in both Spark SQL
    * and DuckDB — NOT NaN, which is non-null and would defeat
    * `coalesce(threshold, staticLimit)` fallback logic downstream. */
  def stddevSamp: Option[Double] = if (n < 2) None else Some(math.sqrt(m2 / (n - 1)))
}

case class ThresholdModel(mean: Double, std: Option[Double], n: Long, threshold: Option[Double])

/** Threshold scorer (SURVEY §2 P7; reference StdDevThreshold,
  * `CHANGELOG.md:447,421,369`).
  *
  * Fit: threshold = mean + k * stddev over a key's history — implemented as
  * a typed `Aggregator` (SURVEY E24/E49) so fit is ONE pass (vs the naive
  * two-aggregate plan), registered usable from both the typed API and
  * `udaf`. Apply: score = err / threshold, clipped to [0, scoreLimit]
  * ("correct limit from conf", `CHANGELOG.md:253`).
  */
class ThresholdFit(k: Double) extends Aggregator[Double, StdDevBuf, ThresholdModel] {
  def zero: StdDevBuf = StdDevBuf(0L, 0.0, 0.0)
  def reduce(b: StdDevBuf, x: Double): StdDevBuf = b.add(x)
  def merge(a: StdDevBuf, b: StdDevBuf): StdDevBuf = a.merge(b)
  def finish(b: StdDevBuf): ThresholdModel = {
    val std = b.stddevSamp
    ThresholdModel(b.mean, std, b.n, std.map(s => b.mean + k * s))
  }
  def bufferEncoder: Encoder[StdDevBuf] = Encoders.product[StdDevBuf]
  def outputEncoder: Encoder[ThresholdModel] = Encoders.product[ThresholdModel]
}

object Threshold {
  /** Register the one-pass fit as a SQL/DataFrame UDAF named `threshold_fit`. */
  def register(spark: org.apache.spark.sql.SparkSession, k: Double = 3.0): Unit =
    spark.udf.register("threshold_fit", udaf(new ThresholdFit(k)))

  /** Fit per key: one-pass aggregator producing (mean, std, n, threshold). */
  def fit(df: DataFrame, keys: Seq[String], value: String, k: Double = 3.0): DataFrame = {
    val agg = udaf(new ThresholdFit(k))
    df.groupBy(keys.map(col): _*)
      .agg(agg(col(value)).as("model"))
      .select((keys.map(col) :+ col("model.mean").as("mean") :+ col("model.std").as("std")
        :+ col("model.n").as("n") :+ col("model.threshold").as("threshold")): _*)
  }

  /** Builtin-aggregate twin of [[fit]] — same output schema and NULL
    * semantics (stddev_samp is NULL at n < 2, so threshold is too). Use
    * this on fact-scale inputs: `avg`/`stddev_samp`/`count` stay inside
    * whole-stage codegen with map-side partials, where the typed
    * Aggregator pays per-row object ser/de. [[fit]] remains the E24/E49
    * demonstration and the two are asserted numerically equal in
    * ThresholdSpec. */
  def fitBuiltin(df: DataFrame, keys: Seq[String], value: String, k: Double = 3.0): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(avg(col(value)).as("mean"),
        stddev_samp(col(value)).as("std"),
        count(col(value)).as("n"))
      .withColumn("threshold", col("mean") + lit(k) * col("std"))

  /** Score: err / threshold, clipped into [0, limit]. */
  def score(err: Column, threshold: Column, limit: Double = 10.0): Column =
    least(greatest(err / (threshold + lit(1e-9)), lit(0.0)), lit(limit))

  /** Static-threshold fallback path (reference `CHANGELOG.md:139,369`):
    * score against a configured upper limit when no fitted model exists. */
  def staticScore(value: Column, upperLimit: Double, limit: Double = 10.0): Column =
    least(greatest(value / lit(upperLimit), lit(0.0)), lit(limit))
}
