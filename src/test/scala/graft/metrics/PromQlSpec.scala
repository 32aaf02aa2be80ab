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

  test("rate: reset inside the range window counts from zero, normalized per second") {
    // one series, samples a minute apart: 10 -> 70 -> 10 (reset) -> 40
    // per-sample incs: 0, 60, 10 (reset contributes post-reset value), 30
    val df = Seq(
      (1L, ts(0), 10.0), (2L, ts(1), 70.0), (3L, ts(2), 10.0), (4L, ts(3), 40.0))
      .toDF("event_id", "ts", "value").withColumn("k", lit("a"))
    val out = PromQl.rate(df, Seq("k"), "ts", "event_id", "value", windowSec = 180)
      .orderBy("event_id").select("rate", "reset").collect()
    // trailing 180s frames: [0], [0,60], [0,60,10], [60,10,30]
    val expected = Seq(0.0, 60.0 / 180, 70.0 / 180, 100.0 / 180)
    out.map(_.getDouble(0)).zip(expected).foreach { case (got, want) =>
      assert(math.abs(got - want) < 1e-12, s"rate $got != $want")
    }
    assert(out.map(_.getInt(1)).toSeq == Seq(0, 0, 1, 0))
  }

  test("overTime: trailing-window sum/avg/max/min/count per series") {
    val df = Seq(
      (1L, ts(0), 2.0), (2L, ts(1), 4.0), (3L, ts(2), 12.0))
      .toDF("event_id", "ts", "value").withColumn("k", lit("a"))
    val out = PromQl.overTime(df, Seq("k"), "ts", "value", windowSec = 120)
      .orderBy("event_id")
      .select("count_ot", "avg_ot", "max_ot", "min_ot").collect()
    // trailing 120s frames: [2], [2,4], [4,12]
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 2L))
    assert(out.map(_.getDouble(1)).toSeq == Seq(2.0, 3.0, 8.0))
    assert(out.map(_.getDouble(2)).toSeq == Seq(2.0, 4.0, 12.0))
    assert(out.map(_.getDouble(3)).toSeq == Seq(2.0, 2.0, 4.0))
  }

  test("topk keeps the k largest per group with deterministic tie-break") {
    val df = Seq(
      ("cpu", 1L, 5.0), ("cpu", 2L, 9.0), ("cpu", 3L, 9.0), ("cpu", 4L, 1.0),
      ("mem", 5L, 3.0))
      .toDF("event_type", "user_id", "value")
    val out = PromQl.topk(df, 2, Seq("event_type"), "value", Seq("user_id"))
      .orderBy("event_type", "rank")
      .select("event_type", "rank", "user_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    // value ties (users 2 and 3 at 9.0) break on user_id ascending
    assert(out == Seq(("cpu", 1L, 2L), ("cpu", 2L, 3L), ("mem", 1L, 5L)))
  }

  test("histogramQuantile keeps sub-0.1 bucket widths exact") {
    // 100 values uniform in (0, 0.1]: bounds [0.05, 0.1] — widths 0.05.
    // q=0.5 -> rank 50, bucket 0 (cnt 50): 0 + (50-0)/50 * 0.05 = 0.05
    // q=0.9 -> rank 90, bucket 1 (prevCum 50, cnt 50): 0.05 + 40/50*0.05 = 0.09
    val df = (1 to 100).map(i => ("g", i / 1000.0)).toDF("k", "value")
    val out = PromQl.histogramQuantile(df, Seq("k"), "value",
      bounds = Seq(0.05, 0.1), quantiles = Seq(0.5, 0.9))
      .orderBy("q").collect()
    val vals = out.map(_.getDouble(out.head.fieldIndex("quantile_value"))).toSeq
    assert(math.abs(vals(0) - 0.05) < 1e-12 && math.abs(vals(1) - 0.09) < 1e-12,
      vals.mkString(","))
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
