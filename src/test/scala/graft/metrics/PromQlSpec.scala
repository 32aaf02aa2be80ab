package graft.metrics

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed PromQL semantics: counter resets, staleness lookback,
  * histogram_quantile interpolation. */
class PromQlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")

  test("counterIncrease applies the Prometheus reset rule") {
    // series A: 5 -> 8 -> 2 -> 6: incs 0, 3, 2 (reset: counts from zero), 4
    val df = Seq(
      (1L, ts(0), 5.0), (2L, ts(1), 8.0), (3L, ts(2), 2.0), (4L, ts(3), 6.0))
      .toDF("event_id", "ts", "value").withColumn("k", lit("a"))
    val out = PromQl.counterIncrease(df, Seq("k"), "ts", "event_id", "value")
      .orderBy("event_id").select("inc", "reset").collect()
    assert(out.map(_.getDouble(0)).toSeq == Seq(0.0, 3.0, 2.0, 4.0))
    assert(out.map(_.getInt(1)).toSeq == Seq(0, 0, 1, 0))
  }

  test("instantVector keeps the latest sample per series and drops stale series") {
    val df = Seq(
      // series a: two samples in lookback -> latest (value 7) wins
      ("a", 1L, ts(10), 3.0), ("a", 2L, ts(20), 7.0),
      // series b: only before the lookback window -> stale, dropped
      ("b", 3L, ts(0), 9.0),
      // series c: after eval time -> not yet visible
      ("c", 4L, ts(40), 1.0))
      .toDF("k", "event_id", "ts", "value")
    val out = PromQl.instantVector(df, Seq("k"), "ts", "event_id",
      "2024-01-01 10:30:00", "25 MINUTES")
    val rows = out.select("k", "value").collect().map(r => r.getString(0) -> r.getDouble(1))
    assert(rows.toSeq == Seq("a" -> 7.0))
  }

  test("histogramQuantile interpolates linearly and clamps the +Inf bucket") {
    // 100 values 1..100, bounds [50]: two buckets of 50.
    // q=0.5 -> rank 50, bucket 0: 0 + 50/50 * 50 = 50
    // q=0.9 -> rank 90 > 50, +Inf bucket -> clamps to 50 (highest finite)
    val df = (1 to 100).map(i => ("g", i.toDouble)).toDF("k", "value")
    val out = PromQl.histogramQuantile(df, Seq("k"), "value",
      bounds = Seq(50.0), quantiles = Seq(0.5, 0.9))
      .orderBy("q").collect()
    assert(out.map(_.getDouble(out.head.fieldIndex("quantile_value"))).toSeq == Seq(50.0, 50.0))
    // finer bounds: q=0.5 with bounds [25, 50, 75]: bucket (25,50], prevCum 25,
    // cnt 25 -> 25 + (50-25)/25 * 25 = 50; q=0.9 -> bucket (75, +inf) clamp 75.
    val out2 = PromQl.histogramQuantile(df, Seq("k"), "value",
      bounds = Seq(25.0, 50.0, 75.0), quantiles = Seq(0.5, 0.9))
      .orderBy("q").collect()
    assert(out2.map(_.getDouble(out2.head.fieldIndex("quantile_value"))).toSeq == Seq(50.0, 75.0))
    // monotone in q
    val qs = PromQl.histogramQuantile(df, Seq("k"), "value",
      bounds = Seq(10.0, 20.0, 40.0, 80.0), quantiles = Seq(0.1, 0.5, 0.9, 0.99))
      .orderBy("q").collect().map(_.getDouble(2))
    assert(qs.sliding(2).forall(p => p(0) <= p(1)), qs.mkString(","))
  }
}
