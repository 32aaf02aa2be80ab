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

  // ---- PromQl.extrapolated: the upstream extrapolatedRate chain ----

  private def extraFixture(samples: Seq[(Long, Double)]) = {
    // epoch-second timestamps inside a [t=0, t=60] window
    samples.zipWithIndex.map { case ((sec, v), i) =>
      (i.toLong, new java.sql.Timestamp(sec * 1000L), v)
    }.toDF("event_id", "ts", "value").withColumn("k", lit("a"))
  }

  test("extrapolated matches the canonical Prometheus example exactly") {
    // 6 samples every 10 s (t=5..55, values 1..6) in a 60 s window:
    // sampled=50, avg=10, threshold=11, both edges 5 s away (< thr) so
    // they extrapolate fully; zero clamp: dz = 50·(1/5) = 10 > 5 — no
    // clamp. factor = (50+5+5)/50 = 1.2 → increase = 5·1.2 = 6 (one
    // increment per 10 s over the full window), rate = 0.1.
    val df = extraFixture(Seq((5L, 1.0), (15L, 2.0), (25L, 3.0),
      (35L, 4.0), (45L, 5.0), (55L, 6.0)))
    val inc = PromQl.extrapolated(df, Seq("k"), "ts", "event_id", "value",
      0L, 60L * 1000000L, isCounter = true, isRate = false)
      .select("value").collect().head.getDouble(0)
    assert(inc == 6.0, s"increase $inc")
    val rate = PromQl.extrapolated(df, Seq("k"), "ts", "event_id", "value",
      0L, 60L * 1000000L, isCounter = true, isRate = true)
      .select("value").collect().head.getDouble(0)
    assert(rate == 0.1, s"rate $rate")
  }

  test("extrapolated far edges fall back to half a sample spacing") {
    // samples at t=40,50 in a [0,60] window: sampled=10, avg=10,
    // thr=11; ds0=40 ≥ thr → ds=5 (half spacing); de0=10 < thr → de=10;
    // counter zero clamp: res=1, first=1 → dz=10·(1/1)=10 > 5, no clamp.
    // increase = 1 · (10+5+10)/10 = 2.5
    val df = extraFixture(Seq((40L, 1.0), (50L, 2.0)))
    val inc = PromQl.extrapolated(df, Seq("k"), "ts", "event_id", "value",
      0L, 60L * 1000000L, isCounter = true, isRate = false)
      .select("value").collect().head.getDouble(0)
    assert(inc == 2.5, s"increase $inc")
  }

  test("extrapolated counter clamps the start side at the zero crossing") {
    // samples (10,1),(50,100): sampled=40, avg=40, thr=44; ds0=10 < thr
    // → ds1=10; dz = 40·(1/99) ≈ 0.404 < 10 → CLAMPED; de0=10 < thr →
    // de=10. increase = 99·(40 + 40/99 + 10)/40; the gauge face (no
    // clamp) uses ds=10 → delta = 99·(40+10+10)/40 = 148.5
    val df = extraFixture(Seq((10L, 1.0), (50L, 100.0)))
    val inc = PromQl.extrapolated(df, Seq("k"), "ts", "event_id", "value",
      0L, 60L * 1000000L, isCounter = true, isRate = false)
      .select("value").collect().head.getDouble(0)
    val expected = 99.0 * ((40.0 + 40.0 * (1.0 / 99.0) + 10.0) / 40.0)
    assert(inc == expected, s"increase $inc vs $expected")
    val delta = PromQl.extrapolated(df, Seq("k"), "ts", "event_id", "value",
      0L, 60L * 1000000L, isCounter = false, isRate = false)
      .select("value").collect().head.getDouble(0)
    assert(delta == 148.5, s"delta $delta")
  }

  test("extrapolated yields no row for single-sample series") {
    val df = extraFixture(Seq((30L, 5.0)))
    assert(PromQl.extrapolated(df, Seq("k"), "ts", "event_id", "value",
      0L, 60L * 1000000L, isCounter = true, isRate = true).count() == 0)
  }
}
