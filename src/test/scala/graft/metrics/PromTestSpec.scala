package graft.metrics

import org.apache.spark.sql.functions.{col, lit}
import org.scalatest.funsuite.AnyFunSuite

/** promtool `test rules` harness: notation expansion, staleness-marker
  * semantics, and a promql_expr_test-shaped battery through the real
  * engine. */
class PromTestSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark

  private val KEY = Seq("metric", "job", "instance")

  test("notation: groups, slots, shorthand, negatives, bad tokens") {
    val sp = PromTest.parseSeries("""up{job="p", instance="i"}""",
      "0 1+1x3 _ stale 7x2 -3-2x2")
    assert(sp.metric == "up" && sp.labels == Map("job" -> "p", "instance" -> "i"))
    // slots: 0 | 1..4 | gap 5 | stale 6 | 7..9 | 10..12
    val slots = sp.groups.map(g => (g.slot0, g.count, g.stale))
    assert(slots == Seq((0L, 1L, false), (1L, 4L, false), (6L, 1L, true),
      (7L, 3L, false), (10L, 3L, false)))
    intercept[IllegalArgumentException] {
      PromTest.parseSeries("""up{job=p}""", "1")
    }
    intercept[NumberFormatException] {
      PromTest.parseSeries("up", "1 bogus")
    }
  }

  test("expansion: values and timestamps are the notation's arithmetic") {
    val df = PromTest.expand(spark,
      Seq(("""m{job="x"}""", "2+3x3 _ stale 1")), Seq("job"),
      "2024-01-01 00:00:00", 60L)
    val rows = df.collect().map(r => (r.getLong(3), r.getDouble(4),
      r.getBoolean(5))).sortBy(_._1)
    assert(rows.filterNot(_._3).map(r => (r._1, r._2)).toSeq ==
      Seq((0L, 2.0), (1L, 5.0), (2L, 8.0), (3L, 11.0), (6L, 1.0)))
    assert(rows.filter(_._3).map(_._1).toSeq == Seq(5L))
    val ts = df.filter("order = 6").collect()(0).getTimestamp(2)
    assert(ts.toString == "2024-01-01 00:06:00.0")
  }

  test("staleness: marker kills LOCF, next real sample revives") {
    val df = PromTest.expand(spark,
      Seq(("""up{job="x"}""", "1 1 stale _ _ 2")), Seq("job"),
      "2024-01-01 00:00:00", 60L)
    def at(t: String) =
      PromTest.instantVector(df, Seq("metric", "job"), t, "10 MINUTES")
        .collect().map(_.getDouble(2)).toSeq
    assert(at("2024-01-01 00:01:30") == Seq(1.0)) // before the marker
    assert(at("2024-01-01 00:02:30") == Seq())    // marker is newest → absent
    assert(at("2024-01-01 00:04:30") == Seq())    // still absent through the gap
    assert(at("2024-01-01 00:05:30") == Seq(2.0)) // revived
  }

  test("promql_expr_test battery: engine eval over expanded input_series") {
    // input_series:
    //   - series: requests{job="api"}   values: 0+10x20
    //   - series: requests{job="web"}   values: 0+5x10 stale 100x9
    val df = PromTest.expand(spark, Seq(
      ("""requests{job="api"}""", "0+10x20"),
      ("""requests{job="web"}""", "0+5x10 stale 100x9")),
      Seq("job", "instance"), "2024-01-01 00:00:00", 300L)
    val src = PromQlParser.PromSource(PromTest.rangeSamples(df), "metric",
      KEY, "ts", "order", "value")
    // eval rate(requests[15m]) at 30m: api pairs (20m,25m],(25m,30m] → 20/900
    val r = PromQlParser.eval(src, """rate(requests{job="api"}[15m])""",
      "2024-01-01 00:30:00").collect()
    assert(r.length == 1 &&
      math.abs(r(0).getAs[Double]("value") - 20.0 / 900) < 1e-12)
    // sum(requests) at 50m: api slot 10 = 100; web's marker at slot 11 is
    // range-invisible but instant selection through the STALE-AWARE view
    // is the harness's instantVector — check both faces disagree as
    // documented: rangeSamples-based LOCF sees web's slot-10 sample (50),
    // the stale-aware instant drops nothing here (marker at 55m).
    val s1 = PromQlParser.eval(src, "sum(requests)", "2024-01-01 00:50:00")
      .collect()
    assert(s1.length == 1 && s1(0).getAs[Double]("value") == 150.0)
    // at 55m the marker is web's newest sample: stale-aware instant keeps
    // only api (110); the marker-stripped engine view would LOCF web's
    // old 50 — the documented difference between the two faces.
    val iv = PromTest.instantVector(df, KEY, "2024-01-01 00:55:00")
      .collect()
    assert(iv.map(_.getAs[Double]("value")).toSeq == Seq(110.0))
  }

  test("alert_rule_test: promtool-shaped case through AlertRules") {
    // promtool test file shape:
    //   interval: 1m
    //   input_series:
    //     - series: 'up{job="api"}'   values: '1x4 0x9 1x6'
    //   alert_rule_test:
    //     - eval_time: 6m  → InstanceDown pending (for: 5m not yet served)
    //     - eval_time: 11m → InstanceDown firing
    //     - eval_time: 16m → no alerts (up recovered)
    val df = PromTest.expand(spark, Seq(("""up{job="api"}""", "1x4 0x9 1x6")),
      Seq("job", "instance"), "2024-01-01 00:00:00", 60L)
    val src = PromQlParser.PromSource(PromTest.rangeSamples(df), "metric",
      KEY, "ts", "order", "value")
    val alerts = AlertRules.evalRule(src,
      AlertRules.Rule("InstanceDown", """up == 0""", forSec = 300L),
      "2024-01-01 00:00:00", "2024-01-01 00:20:00", stepSec = 60L)
    def stateAt(min: Int): Seq[String] = alerts
      .filter(col("step_ts") === lit(f"2024-01-01 00:$min%02d:00").cast("timestamp"))
      .collect().map(_.getAs[String]("alertstate")).toSeq
    assert(stateAt(6) == Seq("pending"))
    assert(stateAt(11) == Seq("firing"))
    assert(stateAt(16) == Seq())
  }
}
