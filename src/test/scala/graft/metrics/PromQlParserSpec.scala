package graft.metrics

import graft.metrics.PromQlParser._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Parser + compiler semantics: AST shapes, Prometheus matcher anchoring,
  * parity between parsed plans and the hand-built PromQl transforms. */
class PromQlParserSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  private def ts(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")

  private def src(df: org.apache.spark.sql.DataFrame) =
    PromSource(df, "event_type", Seq("user_id", "event_type"),
      "ts", "event_id", "value")

  test("parse: full pipeline string produces the expected AST") {
    val ast = parse("""sum by (event_type) (rate(cpu{user_id!="9", env=~"prod.*"}[6h]))""")
    assert(ast == AggBy("sum", Seq("event_type"),
      RangeFn("rate",
        Selector(Some("cpu"), Seq(Matcher("user_id", "!=", "9"),
          Matcher("env", "=~", "prod.*"))), 21600L)))
    // by-clause after the argument list parses too (PromQL allows both)
    assert(parse("sum(increase(cpu[30m])) by (user_id)") ==
      AggBy("sum", Seq("user_id"),
        RangeFn("increase", Selector(Some("cpu"), Nil), 1800L)))
    assert(parse("topk(5, cpu)") == TopK(5, Nil, Selector(Some("cpu"), Nil)))
    // an aggregate keyword in metric-name position is a selector
    assert(parse("""sum{job="x"}""") ==
      Selector(Some("sum"), Seq(Matcher("job", "=", "x"))))
  }

  test("parse: malformed queries raise with context") {
    Seq("rate(cpu[6h)", "sum by () (cpu)", "topk(x, cpu)", "{}", "cpu} extra")
      .foreach { q =>
        val e = intercept[IllegalArgumentException](parse(q))
        assert(e.getMessage.contains("PromQL parse error"), q)
      }
  }

  test("regex matchers are fully anchored (Prometheus semantics)") {
    val df = Seq((1L, ts(0), 1L, "cpu", 5.0), (2L, ts(0), 1L, "cpu_total", 7.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    // 'cpu' must NOT match 'cpu_total'
    val out = eval(src(df), """{event_type=~"cpu"}""", "2024-01-01 10:02:00")
      .select("event_type").collect().map(_.getString(0))
    assert(out.toSeq == Seq("cpu"))
  }

  test("parsed rate ≡ hand-built counterIncrease aggregation (reset included)") {
    // series: 10 -> 70 -> 10 (reset) -> 40 within the window
    val df = Seq(
      (1L, ts(0), 10.0), (2L, ts(1), 70.0), (3L, ts(2), 10.0), (4L, ts(3), 40.0))
      .toDF("event_id", "ts", "value")
      .withColumn("user_id", lit(1L)).withColumn("event_type", lit("cpu"))
    val parsed = eval(src(df), "increase(cpu[1h])", "2024-01-01 10:30:00")
      .select("value").head().getDouble(0)
    // incs: 0 (first), 60, 10 (reset: counts from zero), 30 = 100
    assert(math.abs(parsed - 100.0) < 1e-9)
    val rate = eval(src(df), "rate(cpu[1h])", "2024-01-01 10:30:00")
      .select("value").head().getDouble(0)
    assert(math.abs(rate - 100.0 / 3600) < 1e-12)
  }

  test("parsed instant vector + aggregation ≡ PromQl.instantVector rollup") {
    val df = Seq(
      (1L, ts(0), 1L, "cpu", 3.0), (2L, ts(5), 1L, "cpu", 7.0),
      (3L, ts(5), 2L, "cpu", 9.0), (4L, ts(5), 2L, "mem", 4.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = eval(src(df), "sum by (event_type) (cpu)",
        "2024-01-01 10:06:00", lookback = "10 MINUTES")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // per-series latest: (1,cpu)->7, (2,cpu)->9; mem filtered by metric name
    assert(out == Map("cpu" -> 16.0))
  }

  test("delta = last − first; irate uses the last two samples with the reset rule") {
    // gauge: 10 -> 4 -> 16 over 3 minutes
    val g = Seq((1L, ts(0), 10.0), (2L, ts(1), 4.0), (3L, ts(2), 16.0))
      .toDF("event_id", "ts", "value")
      .withColumn("user_id", lit(1L)).withColumn("event_type", lit("mem"))
    val d = eval(src(g), "delta(mem[1h])", "2024-01-01 10:30:00")
      .select("value").head().getDouble(0)
    assert(d == 6.0) // 16 − 10, not min/max
    val ir = eval(src(g), "irate(mem[1h])", "2024-01-01 10:30:00")
      .select("value").head().getDouble(0)
    assert(math.abs(ir - (16.0 - 4.0) / 60.0) < 1e-12) // last two only
    // counter reset between the last two samples: 50 -> 7
    val c = Seq((1L, ts(0), 50.0), (2L, ts(1), 7.0))
      .toDF("event_id", "ts", "value")
      .withColumn("user_id", lit(1L)).withColumn("event_type", lit("cpu"))
    val ir2 = eval(src(c), "irate(cpu[1h])", "2024-01-01 10:30:00")
      .select("value").head().getDouble(0)
    assert(math.abs(ir2 - 7.0 / 60.0) < 1e-12) // counts from zero
    // a lone sample has no instantaneous rate
    val lone = Seq((1L, ts(0), 5.0)).toDF("event_id", "ts", "value")
      .withColumn("user_id", lit(1L)).withColumn("event_type", lit("cpu"))
    assert(eval(src(lone), "irate(cpu[1h])", "2024-01-01 10:30:00").count() == 0)
  }

  test("topk tie-break is total-ordered on the series key") {
    val df = Seq(
      (1L, ts(0), 5L, "cpu", 9.0), (2L, ts(0), 3L, "cpu", 9.0),
      (3L, ts(0), 1L, "cpu", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = eval(src(df), "topk(2, cpu)", "2024-01-01 10:02:00")
      .orderBy($"rank").select("rank", "user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out == Seq((1L, 3L), (2L, 5L)))
  }
}
