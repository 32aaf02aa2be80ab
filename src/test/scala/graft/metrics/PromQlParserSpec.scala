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
    // ...and so is ANY function name (PromQL reserves nothing): range
    // fns, topk, label fns followed by '{' or end-of-input select
    assert(parse("""changes{env="prod"}""") ==
      Selector(Some("changes"), Seq(Matcher("env", "=", "prod"))))
    assert(parse("resets") == Selector(Some("resets"), Nil))
    assert(parse("""topk{job="x"}""") ==
      Selector(Some("topk"), Seq(Matcher("job", "=", "x"))))
    assert(parse("""label_join{a="b"}""") ==
      Selector(Some("label_join"), Seq(Matcher("a", "=", "b"))))
    assert(parse("rate(deriv[5m])") ==
      RangeFn("rate", Selector(Some("deriv"), Nil), 300L))
  }

  test("parse: malformed queries raise with context") {
    Seq("rate(cpu[6h)", "a +", "topk(x, cpu)", "{}", "cpu} extra")
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

  test("parse: binary operators, precedence, matching modifiers, offset, without") {
    // * binds tighter than -, both left-associative
    assert(parse("a - b * c") ==
      BinOp("-", Selector(Some("a"), Nil),
        BinOp("*", Selector(Some("b"), Nil), Selector(Some("c"), Nil), None), None))
    // parens override precedence
    assert(parse("(a - b) * c") ==
      BinOp("*", BinOp("-", Selector(Some("a"), Nil), Selector(Some("b"), Nil), None),
        Selector(Some("c"), Nil), None))
    // on/ignoring attach to their operator
    assert(parse("a / on (user_id) b") ==
      BinOp("/", Selector(Some("a"), Nil), Selector(Some("b"), Nil),
        Some((true, Seq("user_id")))))
    assert(parse("a + ignoring (env) b") ==
      BinOp("+", Selector(Some("a"), Nil), Selector(Some("b"), Nil),
        Some((false, Seq("env")))))
    // scalar literals on either side
    assert(parse("rate(cpu[5m]) * 100") ==
      BinOp("*", RangeFn("rate", Selector(Some("cpu"), Nil), 300L),
        ScalarLit(100.0), None))
    // unary sign: -5 folds; -vector multiplies by −1; a - -b parses
    assert(parse("cpu * -5") ==
      BinOp("*", Selector(Some("cpu"), Nil), ScalarLit(-5.0), None))
    assert(parse("-cpu") ==
      BinOp("*", ScalarLit(-1.0), Selector(Some("cpu"), Nil), None))
    assert(parse("a - -b") ==
      BinOp("-", Selector(Some("a"), Nil),
        BinOp("*", ScalarLit(-1.0), Selector(Some("b"), Nil), None), None))
    assert(parse("0.5 + cpu") ==
      BinOp("+", ScalarLit(0.5), Selector(Some("cpu"), Nil), None))
    // offset on instant and range selectors
    assert(parse("cpu offset 1h") == Selector(Some("cpu"), Nil, 3600L))
    assert(parse("rate(cpu[5m] offset 30m)") ==
      RangeFn("rate", Selector(Some("cpu"), Nil, 1800L), 300L))
    // without grouping
    assert(parse("sum without (user_id) (cpu)") ==
      AggBy("sum", Seq("user_id"), Selector(Some("cpu"), Nil), without = true))
    // histogram_quantile
    assert(parse("histogram_quantile(0.9, rate(m[5m]))") ==
      HistQuantile(0.9, RangeFn("rate", Selector(Some("m"), Nil), 300L)))
  }

  test("binop: default matching joins on common labels; mismatches drop") {
    val df = Seq(
      (1L, ts(0), 1L, "cpu", 8.0), (2L, ts(0), 2L, "cpu", 6.0),
      (3L, ts(0), 1L, "mem", 2.0)) // user 2 has no mem series
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = eval(src(df), """{event_type="cpu"} / on (user_id) {event_type="mem"}""",
        "2024-01-01 10:02:00")
      .collect().map(r => r.getAs[Long]("user_id") -> r.getAs[Double]("value")).toMap
    assert(out == Map(1L -> 4.0)) // user 2 dropped (label mismatch)
  }

  test("binop: ignoring() removes labels from the match key") {
    val df = Seq(
      (1L, ts(0), 1L, "cpu", 9.0), (2L, ts(0), 1L, "mem", 4.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    // event_type differs between sides; ignoring(event_type) matches on user_id
    val out = eval(src(df),
        """{event_type="cpu"} - ignoring (event_type) {event_type="mem"}""",
        "2024-01-01 10:02:00")
      .select("value").head().getDouble(0)
    assert(out == 5.0)
    // but DEFAULT matching (all common labels incl. event_type) drops all
    assert(eval(src(df), """{event_type="cpu"} - {event_type="mem"}""",
      "2024-01-01 10:02:00").count() == 0)
  }

  test("binop: scalar operand is a map-side projection; x/0 follows IEEE") {
    val df = Seq((1L, ts(0), 1L, "cpu", 7.0), (2L, ts(0), 2L, "cpu", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val scaled = eval(src(df), "cpu * 100", "2024-01-01 10:02:00")
      .collect().map(r => r.getAs[Long]("user_id") -> r.getAs[Double]("value")).toMap
    assert(scaled == Map(1L -> 700.0, 2L -> 0.0))
    val div = eval(src(df), """cpu / {event_type="cpu"}""", "2024-01-01 10:02:00")
      .collect().map(r => r.getAs[Long]("user_id") -> r.getAs[Double]("value")).toMap
    assert(div(1L) == 1.0)
    assert(div(2L).isNaN) // 0/0
    val inv = eval(src(df), """100 / {event_type="cpu"}""", "2024-01-01 10:02:00")
      .collect().map(r => r.getAs[Long]("user_id") -> r.getAs[Double]("value")).toMap
    assert(inv(2L) == Double.PositiveInfinity) // 100/0
  }

  test("offset shifts the evaluation window into the past") {
    val df = Seq((1L, ts(0), 10.0), (2L, ts(30), 99.0))
      .toDF("event_id", "ts", "value")
      .withColumn("user_id", lit(1L)).withColumn("event_type", lit("cpu"))
    // at 10:31 the latest sample is 99; offset 30m re-evaluates at 10:01
    val now = eval(src(df), "cpu", "2024-01-01 10:31:00", lookback = "10 MINUTES")
      .select("value").head().getDouble(0)
    val back = eval(src(df), "cpu offset 30m", "2024-01-01 10:31:00",
      lookback = "10 MINUTES").select("value").head().getDouble(0)
    assert(now == 99.0 && back == 10.0)
  }

  test("without groups by every label except the listed ones") {
    val df = Seq(
      (1L, ts(0), 1L, "cpu", 3.0), (2L, ts(0), 2L, "cpu", 4.0),
      (3L, ts(0), 1L, "mem", 5.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = eval(src(df), """sum without (user_id) ({event_type=~".+"})""",
        "2024-01-01 10:02:00")
      .collect().map(r => r.getAs[String]("event_type") -> r.getAs[Double]("value")).toMap
    assert(out == Map("cpu" -> 7.0, "mem" -> 5.0))
  }

  test("histogram_quantile interpolates le-labeled cumulative buckets") {
    // one giant series of bucket counters: cum counts 10 (le=1), 30 (le=2), 40 (+Inf)
    val df = Seq(
      (1L, ts(0), 1L, "lat", "1", 10.0), (2L, ts(0), 1L, "lat", "2", 30.0),
      (3L, ts(0), 1L, "lat", "+Inf", 40.0))
      .toDF("event_id", "ts", "user_id", "event_type", "le", "value")
    val s = PromSource(df, "event_type", Seq("user_id", "event_type", "le"),
      "ts", "event_id", "value")
    val q50 = eval(s, """histogram_quantile(0.5, sum by (event_type, le) ({le=~".+"}))""",
      "2024-01-01 10:02:00").select("value").head().getDouble(0)
    // rank = 20: inside (1, 2], lo=1, cnt=20, prevCum=10 → 1 + 10/20 * 1 = 1.5
    assert(math.abs(q50 - 1.5) < 1e-12)
    val q99 = eval(s, """histogram_quantile(0.99, sum by (event_type, le) ({le=~".+"}))""",
      "2024-01-01 10:02:00").select("value").head().getDouble(0)
    assert(q99 == 2.0) // +Inf bucket clamps to the highest finite bound
  }

  test("evalRange: grid rate uses only pairs fully inside each step window") {
    // samples at 10:00(v=10), 10:20(v=30), 10:40(v=35); step=20m, window=30m
    val df = Seq((1L, ts(0), 10.0), (2L, ts(20), 30.0), (3L, ts(40), 35.0))
      .toDF("event_id", "ts", "value")
      .withColumn("user_id", lit(1L)).withColumn("event_type", lit("cpu"))
    val out = PromQlParser.evalRange(src(df), "increase(cpu[30m])",
        "2024-01-01 10:00:00", "2024-01-01 11:00:00", stepSec = 1200)
      .collect()
      .map(r => r.getAs[java.sql.Timestamp]("step_ts").toString -> r.getAs[Double]("value"))
      .toMap
    // T=10:20 window (09:50,10:20]: pair(10:00→10:20) inside → 20
    // T=10:40 window (10:10,10:40]: pair(10:20→10:40) inside; pair(10:00→10:20)
    //   has its prev endpoint outside → only 5
    // T=10:00 and T=11:00: no pair fully inside → absent
    assert(out == Map("2024-01-01 10:20:00.0" -> 20.0, "2024-01-01 10:40:00.0" -> 5.0))
  }

  test("evalRange: instant selector applies staleness per step") {
    val df = Seq((1L, ts(0), 42.0))
      .toDF("event_id", "ts", "value")
      .withColumn("user_id", lit(1L)).withColumn("event_type", lit("cpu"))
    val out = PromQlParser.evalRange(src(df), "cpu",
        "2024-01-01 10:00:00", "2024-01-01 10:30:00", stepSec = 600,
        lookbackSec = 900)
      .collect()
      .map(r => r.getAs[java.sql.Timestamp]("step_ts").toString -> r.getAs[Double]("value"))
      .toMap
    // sample at 10:00 is live for T in [10:00, 10:15) → steps 10:00, 10:10
    assert(out == Map("2024-01-01 10:00:00.0" -> 42.0, "2024-01-01 10:10:00.0" -> 42.0))
  }

  test("parse: comparisons, bool, set operators, group_left/right precedence") {
    val (a, b, c) = (Selector(Some("a"), Nil), Selector(Some("b"), Nil),
      Selector(Some("c"), Nil))
    // comparison binds tighter than 'and'; 'and' tighter than 'or'
    assert(parse("a > b and c") ==
      BinOp("and", BinOp(">", a, b, None), c, None))
    assert(parse("a and b or c") ==
      BinOp("or", BinOp("and", a, b, None), c, None))
    assert(parse("a unless b") == BinOp("unless", a, b, None))
    // bool modifier on a comparison
    assert(parse("a == bool 5") ==
      BinOp("==", a, ScalarLit(5.0), None, None, bool = true))
    assert(parse("a >= b") == BinOp(">=", a, b, None))
    // group_left with and without a copy-label list
    assert(parse("a / on (x) group_left (t) b") ==
      BinOp("/", a, b, Some((true, Seq("x"))), Some(Grp(true, Seq("t")))))
    assert(parse("a * on (x) group_right b") ==
      BinOp("*", a, b, Some((true, Seq("x"))), Some(Grp(false, Nil))))
  }

  test("comparison filters keep the vector's value; bool projects 1/0") {
    val df = Seq((1L, ts(0), 1L, "cpu", 7.0), (2L, ts(0), 2L, "cpu", 3.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    def run(q: String) = eval(src(df), q, "2024-01-01 10:02:00")
      .collect().map(r => r.getAs[Long]("user_id") -> r.getAs[Double]("value")).toMap
    // filter mode drops non-satisfying samples, value untouched
    assert(run("cpu > 5") == Map(1L -> 7.0))
    // scalar on the LEFT still keeps the VECTOR's value (5 > x ⇒ x stays)
    assert(run("5 > cpu") == Map(2L -> 3.0))
    // bool keeps every sample, projecting 1.0/0.0
    assert(run("cpu > bool 5") == Map(1L -> 1.0, 2L -> 0.0))
    assert(run("5 >= bool cpu") == Map(1L -> 0.0, 2L -> 1.0))
    // vector-vector comparison: filter on the joined pair, lhs value kept
    val two = Seq(
      (1L, ts(0), 1L, "cpu", 8.0), (2L, ts(0), 1L, "mem", 2.0),
      (3L, ts(0), 2L, "cpu", 1.0), (4L, ts(0), 2L, "mem", 6.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val vv = eval(src(two),
        """{event_type="cpu"} > ignoring (event_type) {event_type="mem"}""",
        "2024-01-01 10:02:00")
      .collect().map(r => r.getAs[Long]("user_id") -> r.getAs[Double]("value")).toMap
    assert(vv == Map(1L -> 8.0)) // user 2: 1 > 6 fails, dropped
  }

  test("set operators: and = semi, unless = anti, or = union-with-fill") {
    val df = Seq(
      (1L, ts(0), 1L, "cpu", 8.0), (2L, ts(0), 2L, "cpu", 6.0),
      (3L, ts(0), 1L, "mem", 2.0)) // user 2 has no mem series
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    def run(q: String) = eval(src(df), q, "2024-01-01 10:02:00")
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type")) ->
        r.getAs[Double]("value")).toMap
    assert(run("""{event_type="cpu"} and ignoring (event_type) {event_type="mem"}""") ==
      Map((1L, "cpu") -> 8.0))
    assert(run("""{event_type="cpu"} unless ignoring (event_type) {event_type="mem"}""") ==
      Map((2L, "cpu") -> 6.0))
    // or: every mem sample, plus cpu samples for users with no mem series
    assert(run("""{event_type="mem"} or ignoring (event_type) {event_type="cpu"}""") ==
      Map((1L, "mem") -> 2.0, (2L, "cpu") -> 6.0))
  }

  test("group_left/group_right: many-to-one matching with copy labels") {
    // tier is a per-user label: the aggregated ONE side keeps it, the MANY
    // side (per event_type) does not — group_left(tier) copies it over.
    val df = Seq(
      (1L, ts(0), 1L, "cpu", "a", 3.0), (2L, ts(0), 1L, "mem", "a", 5.0),
      (3L, ts(0), 2L, "cpu", "b", 2.0))
      .toDF("event_id", "ts", "user_id", "event_type", "tier", "value")
    val s = PromSource(df, "event_type", Seq("user_id", "event_type", "tier"),
      "ts", "event_id", "value")
    def toMap(rows: Array[org.apache.spark.sql.Row]) = rows.map(r =>
      (r.getAs[Long]("user_id"), r.getAs[String]("event_type"),
        r.getAs[String]("tier")) -> r.getAs[Double]("value")).toMap
    val expected = Map(
      (1L, "cpu", "a") -> 15.0, (1L, "mem", "a") -> 25.0, (2L, "cpu", "b") -> 4.0)
    val gl = eval(s,
      """sum by (user_id, event_type) ({event_type=~".+"}) * on (user_id) group_left (tier) max by (user_id, tier) ({event_type=~".+"})""",
      "2024-01-01 10:02:00")
    assert(toMap(gl.collect()) == expected)
    // group_right mirrors: the one side is on the LEFT, copy labels flow
    // from it; lhs-op-rhs order is preserved (multiplication commutes so
    // the values coincide by construction).
    val gr = eval(s,
      """max by (user_id, tier) ({event_type=~".+"}) * on (user_id) group_right (tier) sum by (user_id, event_type) ({event_type=~".+"})""",
      "2024-01-01 10:02:00")
    assert(toMap(gr.collect()) == expected)
    // non-commutative check of operand order under group_right:
    // one-side max minus many-side sum
    val diff = eval(s,
      """max by (user_id, tier) ({event_type=~".+"}) - on (user_id) group_right (tier) sum by (user_id, event_type) ({event_type=~".+"})""",
      "2024-01-01 10:02:00")
    assert(toMap(diff.collect()) == Map(
      (1L, "cpu", "a") -> 2.0, (1L, "mem", "a") -> 0.0, (2L, "cpu", "b") -> 0.0))
  }

  test("stddev/stdvar/quantile aggregations and absent()") {
    // values 2, 4, 6 per metric: pop variance = 8/3, stddev = sqrt(8/3)
    val df = Seq(
      (1L, ts(0), 1L, "cpu", 2.0), (2L, ts(0), 2L, "cpu", 4.0),
      (3L, ts(0), 3L, "cpu", 6.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    def run(q: String) = eval(src(df), q, "2024-01-01 10:02:00")
      .select("value").head().getDouble(0)
    assert(math.abs(run("stdvar by (event_type) (cpu)") - 8.0 / 3) < 1e-12)
    assert(math.abs(run("stddev by (event_type) (cpu)") - math.sqrt(8.0 / 3)) < 1e-12)
    // linear interpolation between sorted values: φ=0.75 → 4 + 0.5·2 = 5
    assert(run("quantile by (event_type) (0.75, cpu)") == 5.0)
    assert(run("quantile(0.5, cpu)") == 4.0) // ungrouped median
    // absent: empty for a live selector, one labeled 1.0-sample otherwise
    assert(eval(src(df), "absent(cpu)", "2024-01-01 10:02:00").count() == 0)
    val miss = eval(src(df), """absent(mem{user_id="7"})""", "2024-01-01 10:02:00")
      .collect()
    assert(miss.length == 1)
    assert(miss(0).getAs[String]("user_id") == "7" && miss(0).getAs[Double]("value") == 1.0)
    // grid absent: 42.0-sample at 10:00 is live (15m lookback) for the
    // first two 10-min steps; absent() fires on the later steps only
    val lone = Seq((1L, ts(0), 42.0)).toDF("event_id", "ts", "value")
      .withColumn("user_id", lit(1L)).withColumn("event_type", lit("cpu"))
    val gridAbs = PromQlParser.evalRange(src(lone), "absent(cpu)",
        "2024-01-01 10:00:00", "2024-01-01 10:30:00", stepSec = 600,
        lookbackSec = 900)
      .collect().map(_.getAs[java.sql.Timestamp]("step_ts").toString).sorted
    assert(gridAbs.toSeq == Seq("2024-01-01 10:20:00.0", "2024-01-01 10:30:00.0"))
  }

  test("scalar vector functions: abs/clamp/round ties-up; bottomk ascends") {
    val df = Seq(
      (1L, ts(0), 1L, "cpu", 7.25), (2L, ts(0), 2L, "cpu", 2.0),
      (3L, ts(0), 3L, "cpu", 9.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    def run(q: String) = eval(src(df), q, "2024-01-01 10:02:00")
      .collect().map(r => r.getAs[Long]("user_id") -> r.getAs[Double]("value")).toMap
    assert(run("clamp(cpu, 3, 8)") == Map(1L -> 7.25, 2L -> 3.0, 3L -> 8.0))
    assert(run("clamp_min(cpu, 4)") == Map(1L -> 7.25, 2L -> 4.0, 3L -> 9.0))
    // round to multiples of 0.5; 7.25 is a tie → rounds UP (PromQL rule)
    assert(run("round(cpu, 0.5)") == Map(1L -> 7.5, 2L -> 2.0, 3L -> 9.0))
    assert(run("floor(cpu)") == Map(1L -> 7.0, 2L -> 2.0, 3L -> 9.0))
    assert(run("sqrt(clamp_max(cpu, 4))") == Map(1L -> 2.0, 2L -> math.sqrt(2.0), 3L -> 2.0))
    val bk = eval(src(df), "bottomk(2, cpu)", "2024-01-01 10:02:00")
      .orderBy($"rank").select("rank", "user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(bk == Seq((1L, 2L), (2L, 1L))) // smallest first
  }

  test("over_time round-out: last/present/stddev/stdvar/quantile") {
    val df = Seq((1L, ts(0), 2.0), (2L, ts(1), 4.0), (3L, ts(2), 6.0))
      .toDF("event_id", "ts", "value")
      .withColumn("user_id", lit(1L)).withColumn("event_type", lit("cpu"))
    def run(q: String) = eval(src(df), q, "2024-01-01 10:30:00")
      .select("value").head().getDouble(0)
    assert(run("last_over_time(cpu[1h])") == 6.0)
    assert(run("present_over_time(cpu[1h])") == 1.0)
    assert(math.abs(run("stdvar_over_time(cpu[1h])") - 8.0 / 3) < 1e-12)
    assert(math.abs(run("stddev_over_time(cpu[1h])") - math.sqrt(8.0 / 3)) < 1e-12)
    assert(run("quantile_over_time(0.5, cpu[1h])") == 4.0)
    // absent window → no row at all
    assert(eval(src(df), "present_over_time(mem[1h])", "2024-01-01 10:30:00").count() == 0)
  }

  test("deriv is the least-squares slope; predict_linear extrapolates it") {
    // (10:00, 0) and (10:10, 60): slope = 0.1/s; at T=10:10 the fitted
    // line passes through 60, so +600 s predicts 120
    val df = Seq((1L, ts(0), 0.0), (2L, ts(10), 60.0))
      .toDF("event_id", "ts", "value")
      .withColumn("user_id", lit(1L)).withColumn("event_type", lit("cpu"))
    def run(q: String) = eval(src(df), q, "2024-01-01 10:10:00")
      .select("value").head().getDouble(0)
    assert(math.abs(run("deriv(cpu[1h])") - 0.1) < 1e-12)
    assert(math.abs(run("predict_linear(cpu[1h], 600)") - 120.0) < 1e-9)
    // a lone sample fits no line
    val lone = Seq((1L, ts(0), 5.0)).toDF("event_id", "ts", "value")
      .withColumn("user_id", lit(1L)).withColumn("event_type", lit("cpu"))
    assert(eval(src(lone), "deriv(cpu[1h])", "2024-01-01 10:10:00").count() == 0)
  }

  test("label_replace anchors and keeps unmatched rows; label_join concatenates") {
    val df = Seq(
      (1L, ts(0), 1L, "cpu_total", 5.0), (2L, ts(0), 2L, "mem", 7.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = eval(src(df),
        """label_replace({event_type=~".+"}, "kind", "$1", "event_type", "(cpu)_.*")""",
        "2024-01-01 10:02:00")
      .collect().map(r => r.getAs[String]("event_type") -> r.getAs[String]("kind")).toMap
    // cpu_total matches (full anchor) → kind=cpu; mem doesn't → kind null
    assert(out == Map("cpu_total" -> "cpu", "mem" -> null))
    val joined = eval(src(df),
        """label_join({event_type="mem"}, "series", "|", "user_id", "event_type")""",
        "2024-01-01 10:02:00")
      .select("series").head().getString(0)
    assert(joined == "2|mem")
  }

  test("subquery: *_over_time over a step-gridded inner expression") {
    assert(parse("max_over_time(rate(cpu[5m])[1h:10m])") ==
      RangeSub("max_over_time",
        Subquery(RangeFn("rate", Selector(Some("cpu"), Nil), 300L), 3600L, 600L)))
    // counter 0→60→240 at 10:00/10:10/10:20; the [20m:10m] grid at the
    // aligned T=10:20 is the CLOSED [10:00, 10:20] — three absolute
    // 10m multiples (upstream "range/step + 1") — but 10:00 carries no
    // pair, so rate[15m] samples exist at 10:10 (pair 10:00→10:10,
    // inc 60) and 10:20 (pair 10:10→10:20, inc 180); a 10m inner window
    // would EXCLUDE both: the rate window stays left-open, so a prev
    // sample exactly w before T is outside it
    val df = Seq((1L, ts(0), 0.0), (2L, ts(10), 60.0), (3L, ts(20), 240.0))
      .toDF("event_id", "ts", "value")
      .withColumn("user_id", lit(1L)).withColumn("event_type", lit("cpu"))
    def run(q: String) = eval(src(df), q, "2024-01-01 10:20:00")
      .select("value").head().getDouble(0)
    def run2(q: String, t: String) = eval(src(df), q, t)
      .select("value").head().getDouble(0)
    assert(math.abs(run("max_over_time(rate(cpu[15m])[20m:10m])") - 180.0 / 900) < 1e-12)
    assert(math.abs(run("min_over_time(rate(cpu[15m])[20m:10m])") - 60.0 / 900) < 1e-12)
    assert(run("count_over_time(rate(cpu[15m])[20m:10m])") == 2.0)
    // last_over_time picks the newest grid point; avg is the decimal mean
    assert(math.abs(run("last_over_time(rate(cpu[15m])[20m:10m])") - 180.0 / 900) < 1e-12)
    assert(math.abs(run("avg_over_time(rate(cpu[15m])[20m:10m])") - 0.1333335) < 1e-9)
    // subquery over an aggregated expression (parenthesized)
    assert(math.abs(
      run("max_over_time((sum by (event_type) (rate(cpu[15m])))[20m:10m])") - 180.0 / 900) < 1e-12)
    // a non-over_time function over a subquery is rejected
    val e = intercept[IllegalArgumentException](
      eval(src(df), "rate(cpu[20m:10m])", "2024-01-01 10:20:00"))
    assert(e.getMessage.contains("subquery"))
    // subquery on the query_range grid: inner rate evaluates once on the
    // shared fine grid (10:10/10:20 carry pairs → 1/15 and 0.2), each
    // fine sample folds onto the outer steps whose CLOSED [T−20m, T]
    // window holds it (upstream alignment, round 10) — so the 10:40 step
    // still sees the 10:20 sample sitting exactly range back
    val grid = PromQlParser.evalRange(src(df),
        "max_over_time(rate(cpu[15m])[20m:10m])",
        "2024-01-01 10:20:00", "2024-01-01 10:40:00", stepSec = 600)
      .collect()
      .map(r => r.getAs[java.sql.Timestamp]("step_ts").toString -> r.getAs[Double]("value"))
      .toMap
    assert(grid.keySet == Set("2024-01-01 10:20:00.0", "2024-01-01 10:30:00.0",
      "2024-01-01 10:40:00.0"))
    assert(math.abs(grid("2024-01-01 10:20:00.0") - 0.2) < 1e-12)
    assert(math.abs(grid("2024-01-01 10:30:00.0") - 0.2) < 1e-12)
    assert(math.abs(grid("2024-01-01 10:40:00.0") - 0.2) < 1e-12)
    // absolute alignment makes ANY outer step agree with instant eval at
    // the same instant (the old step-divisibility restriction is gone):
    // steps 10:20/10:35/10:50 fold the same absolute 10m-multiple fine
    // samples instant evaluation would use
    val grid900 = PromQlParser.evalRange(src(df),
        "max_over_time(rate(cpu[15m])[20m:10m])",
        "2024-01-01 10:20:00", "2024-01-01 10:50:00", stepSec = 900)
      .collect()
      .map(r => r.getAs[java.sql.Timestamp]("step_ts").toString -> r.getAs[Double]("value"))
      .toMap
    assert(grid900.keySet == Set("2024-01-01 10:20:00.0", "2024-01-01 10:35:00.0"))
    assert(math.abs(grid900("2024-01-01 10:35:00.0") - 0.2) < 1e-12)
    // instant eval at the unaligned 10:35 matches the grid's 10:35 row
    assert(math.abs(run2("max_over_time(rate(cpu[15m])[20m:10m])",
      "2024-01-01 10:35:00") - 0.2) < 1e-12)
    // unaligned T with range < step: no aligned instant in (T−range, T]
    // → empty vector, as upstream
    assert(eval(src(df), "max_over_time(rate(cpu[15m])[4m:10m])",
      "2024-01-01 10:35:00").count() == 0)
  }

  test("UTF-8 names (3.x) and __name__ matchers") {
    // quoted metric name, alone and with matchers / quoted label names
    assert(parse("""{"http.requests"}""") ==
      Selector(Some("http.requests"), Nil))
    assert(parse("""{"http.requests", job="api", "host zone"=~"eu.*"}""") ==
      Selector(Some("http.requests"),
        Seq(Matcher("job", "=", "api"), Matcher("host zone", "=~", "eu.*"))))
    assert(PromQlFormat.format(parse("""{"http.requests", "host zone"="eu"}""")) ==
      """{"http.requests", "host zone"="eu"}""")
    // a bare AND quoted metric name together is an error
    intercept[Exception](parse("""cpu{"mem"}"""))
    // __name__ matchers hit the metric column — the Grafana multi-metric
    // idiom {__name__=~"a|b"} and the equality form both evaluate
    val df = Seq(
      (1L, ts(0), 1L, "cpu", 5.0), (2L, ts(0), 1L, "mem", 7.0),
      (3L, ts(0), 1L, "disk", 9.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    def names(q: String) = eval(src(df), q, "2024-01-01 10:02:00")
      .collect().map(_.getAs[String]("event_type")).toSet
    assert(names("""{__name__=~"cpu|mem"}""") == Set("cpu", "mem"))
    assert(names("""{__name__="disk"}""") == Set("disk"))
    assert(names("""{__name__!~"d.*"}""") == Set("cpu", "mem"))
    // quoted label names EVALUATE against dotted columns (3.x UTF-8
    // names end-to-end): matchers bind dot-safely, and by-lists accept
    // the quoted spelling
    val dotted = Seq(
      (1L, ts(0), 1L, "cpu", 5.0, "eu"), (2L, ts(0), 2L, "cpu", 7.0, "eu"),
      (3L, ts(0), 3L, "cpu", 9.0, "us"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "zone.region")
    val dsrc = PromSource(dotted, "event_type",
      Seq("user_id", "event_type", "zone.region"), "ts", "event_id", "value")
    val eu = eval(dsrc, """cpu{"zone.region"="eu"}""", "2024-01-01 10:02:00")
      .collect()
    assert(eu.length == 2, eu.toSeq)
    val by = eval(dsrc, """sum by ("zone.region") (cpu)""",
      "2024-01-01 10:02:00")
      .collect().map(r => (r.getAs[String]("zone.region"),
        r.getAs[Double]("value"))).toMap
    assert(by == Map("eu" -> 12.0, "us" -> 9.0), by)
    // parse + canonical print of the quoted by-list
    assert(parse("""sum by ("zone.region") (cpu)""") ==
      AggBy("sum", Seq("zone.region"), Selector(Some("cpu"), Nil)))
    assert(PromQlFormat.format(parse("""sum by ("zone.region") (cpu)""")) ==
      """sum by ("zone.region") (cpu)""")
  }

  test("info(): data-label enrichment, matcher narrowing, pass-through") {
    // parse + print
    assert(parse("info(cpu)") == InfoFn(Selector(Some("cpu"), Nil)))
    assert(parse("""info(rate(cpu[5m]), {tier="gold"})""") ==
      InfoFn(RangeFn("rate", Selector(Some("cpu"), Nil), 300L),
        Seq(Matcher("tier", "=", "gold"))))
    assert(PromQlFormat.format(parse("""info(cpu, {tier=~"g.*"})""")) ==
      """info(cpu, {tier=~"g.*"})""")
    // samples: users 1 and 2; info rows: user 1 has an older gold and a
    // newer silver row (newest wins), user 2 has none (pass-through)
    val df = Seq((1L, ts(5), 1L, "cpu", 5.0), (2L, ts(5), 2L, "cpu", 7.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val infoDf = Seq(
      (10L, ts(1), 1L, "user_info", "gold", "z1"),
      (11L, ts(3), 1L, "user_info", "silver", "z2"))
      .toDF("event_id", "ts", "user_id", "info_name", "tier", "zone")
    val s = src(df).copy(info = Some(InfoBinding(infoDf, "info_name",
      Seq("user_id"), Seq("tier", "zone"), "ts", "event_id")))
    def rows(q: String) = eval(s, q, "2024-01-01 10:05:30")
      .collect().map(r => r.getAs[Long]("user_id") ->
        (r.getAs[String]("tier"), scala.util.Try(r.getAs[String]("zone")).toOption))
      .toMap
    // newest info row per key wins; unmatched user 2 passes through null
    assert(rows("info(cpu)") ==
      Map(1L -> ("silver", Some("z2")), 2L -> (null, Some(null))))
    // a data-label matcher FILTERS info rows (the older gold row is the
    // newest surviving one) AND narrows the copied labels to the matched
    // set (zone is not copied at all)
    assert(rows("""info(cpu, {tier="gold"})""") ==
      Map(1L -> ("gold", None), 2L -> (null, None)))
    // a __name__ matcher selects info metrics
    assert(rows("""info(cpu, {__name__="other_info", tier=~".+"})""") ==
      Map(1L -> (null, None), 2L -> (null, None)))
    // no binding → loud error; unknown data label → loud error
    val e1 = intercept[IllegalArgumentException](
      eval(src(df), "info(cpu)", "2024-01-01 10:06:00"))
    assert(e1.getMessage.contains("binding"))
    val e2 = intercept[IllegalArgumentException](
      eval(s, """info(cpu, {nope="x"})""", "2024-01-01 10:06:00").collect())
    assert(e2.getMessage.contains("not a data label"))
    // grid: the per-step join tracks info CHANGES across steps — user 1
    // is gold until the silver row lands at 10:06; user 2 stays null
    val infoDf2 = Seq(
      (10L, ts(1), 1L, "user_info", "gold", "z1"),
      (11L, ts(6), 1L, "user_info", "silver", "z2"))
      .toDF("event_id", "ts", "user_id", "info_name", "tier", "zone")
    val s2 = src(df).copy(info = Some(InfoBinding(infoDf2, "info_name",
      Seq("user_id"), Seq("tier", "zone"), "ts", "event_id")))
    val g = PromQlParser.evalRange(s2, "info(cpu)",
        "2024-01-01 10:05:00", "2024-01-01 10:07:00", 60)
      .collect()
      .map(r => (r.getAs[java.sql.Timestamp]("step_ts").toString.substring(14, 16),
        r.getAs[Long]("user_id")) -> r.getAs[String]("tier")).toMap
    assert(g == Map(("05", 1L) -> "gold", ("05", 2L) -> null,
      ("06", 1L) -> "silver", ("06", 2L) -> null,
      ("07", 1L) -> "silver", ("07", 2L) -> null))
  }

  test("resets/changes count window transitions; idelta is the last difference") {
    // 10 → 10 → 4 → 9 → 9: resets 1 (10→4); changes 2 (10→4, 4→9)
    val df = Seq((1L, ts(0), 10.0), (2L, ts(1), 10.0), (3L, ts(2), 4.0),
      (4L, ts(3), 9.0), (5L, ts(4), 9.0))
      .toDF("event_id", "ts", "value")
      .withColumn("user_id", lit(1L)).withColumn("event_type", lit("cpu"))
    def run(q: String) = eval(src(df), q, "2024-01-01 10:30:00")
      .select("value").head().getDouble(0)
    assert(run("resets(cpu[1h])") == 1.0)
    assert(run("changes(cpu[1h])") == 2.0)
    assert(run("idelta(cpu[1h])") == 0.0) // 9 − 9
    // lone sample: present but zero transitions
    val lone = Seq((1L, ts(0), 5.0)).toDF("event_id", "ts", "value")
      .withColumn("user_id", lit(1L)).withColumn("event_type", lit("cpu"))
    assert(eval(src(lone), "changes(cpu[1h])", "2024-01-01 10:30:00")
      .select("value").head().getDouble(0) == 0.0)
    // grid form: per-step windows see different transition sets; the
    // 10:02 step's 2m window holds samples 10:01/10:02 (one change);
    // the 10:04 step's holds 10:03/10:04 (none)
    val grid = PromQlParser.evalRange(src(df), "changes(cpu[2m])",
        "2024-01-01 10:02:00", "2024-01-01 10:04:00", stepSec = 120)
      .collect()
      .map(r => r.getAs[java.sql.Timestamp]("step_ts").toString -> r.getAs[Double]("value"))
      .toMap
    assert(grid == Map("2024-01-01 10:02:00.0" -> 1.0, "2024-01-01 10:04:00.0" -> 0.0))
  }

  test("time() is the evaluation instant; per-step on the grid") {
    val df = Seq((1L, ts(0), 1L, "cpu", 7.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    // 2024-01-01 10:02:00 UTC = 1704103320
    val inst = eval(src(df), "time() - cpu * 0", "2024-01-01 10:02:00")
      .select("value").head().getDouble(0)
    assert(inst == 1704103320.0)
    // grid: each step carries its own T_i
    val grid = PromQlParser.evalRange(src(df), "cpu * 0 + time()",
        "2024-01-01 10:00:00", "2024-01-01 10:10:00", stepSec = 600,
        lookbackSec = 1200)
      .collect()
      .map(r => r.getAs[java.sql.Timestamp]("step_ts").toString -> r.getAs[Double]("value"))
      .toMap
    assert(grid == Map(
      "2024-01-01 10:00:00.0" -> 1704103200.0,
      "2024-01-01 10:10:00.0" -> 1704103800.0))
  }

  test("timestamp() is the newest sample's epoch; time() - timestamp() is age") {
    val df = Seq((1L, ts(0), 10.0), (2L, ts(5), 99.0))
      .toDF("event_id", "ts", "value")
      .withColumn("user_id", lit(1L)).withColumn("event_type", lit("cpu"))
    def run(q: String) = eval(src(df), q, "2024-01-01 10:07:00")
      .select("value").head().getDouble(0)
    // 2024-01-01 10:05:00 UTC = 1704103500
    assert(run("timestamp(cpu)") == 1704103500.0)
    assert(run("time() - timestamp(cpu)") == 120.0)
    // stale series (outside lookback) drop out entirely
    assert(eval(src(df), "timestamp(cpu)", "2024-01-01 11:00:00")
      .count() == 0)
  }

  test("count_values buckets series by sample value as a string label") {
    val df = Seq(
      (1L, ts(0), 1L, "cpu", 7.5), (2L, ts(0), 2L, "cpu", 7.5),
      (3L, ts(0), 3L, "cpu", 2.0), (4L, ts(0), 1L, "mem", 7.5))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = eval(src(df), """count_values by (event_type) ("v", {event_type=~".+"})""",
        "2024-01-01 10:02:00")
      .collect().map(r => (r.getAs[String]("event_type"), r.getAs[String]("v")) ->
        r.getAs[Double]("value")).toMap
    // the value label uses the explicit fixed-point rule: trailing zeros
    // (and a bare point) trimmed, so 2.0 prints "2" — the Prometheus
    // FormatFloat('f', -1) shape, not an engine's default double cast
    assert(out == Map(
      ("cpu", "7.5") -> 2.0, ("cpu", "2") -> 1.0, ("mem", "7.5") -> 1.0))
    // ungrouped: value label only
    val flat = eval(src(df), """count_values("v", {event_type=~".+"})""",
        "2024-01-01 10:02:00")
      .collect().map(r => r.getAs[String]("v") -> r.getAs[Double]("value")).toMap
    assert(flat == Map("7.5" -> 3.0, "2" -> 1.0))
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

  test("rate() divergence from upstream is DELIBERATE: sum-of-increases/window, no boundary extrapolation") {
    // Two samples 60 s apart (values 0 → 60) in a 300 s window ending at
    // 10:05. Engine rate = sum of reset-aware increases / window =
    // 60 / 300 = 0.2. Real Prometheus extrapolates the 1-sample-pair
    // slope to the window boundary (extrapolatedRate, promql/functions.go)
    // and would report a LARGER value here. The engine's definition is a
    // pure function of the in-window samples — deterministic, partition-
    // order-free, and oracle-checkable — and this spec pins the choice so
    // a future round doesn't "fix" it silently. (SCALE.md documents it.)
    val df = Seq((1L, ts(3), 1L, "cpu", 0.0), (2L, ts(4), 1L, "cpu", 60.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = eval(src(df), "rate(cpu[5m])", "2024-01-01 10:05:00")
      .select("value").collect().map(_.getDouble(0))
    assert(out.toSeq == Seq(60.0 / 300.0))
  }

  test("sort/sort_desc order the instant vector by value (presentation only)") {
    val df = Seq(
      (1L, ts(0), 1L, "cpu", 5.0), (2L, ts(0), 2L, "cpu", 9.0),
      (3L, ts(0), 3L, "cpu", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val desc = eval(src(df), "sort_desc(cpu)", "2024-01-01 10:02:00")
      .select("value").collect().map(_.getDouble(0)).toSeq
    assert(desc == Seq(9.0, 5.0, 1.0))
    val asc = eval(src(df), "sort(cpu)", "2024-01-01 10:02:00")
      .select("value").collect().map(_.getDouble(0)).toSeq
    assert(asc == Seq(1.0, 5.0, 9.0))
  }

  test("scalar(): one-element value, NaN otherwise; vector() lifts a scalar") {
    val df = Seq(
      (1L, ts(0), 1L, "cpu", 5.0), (2L, ts(0), 2L, "cpu", 9.0),
      (3L, ts(0), 1L, "mem", 4.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    def one(q: String): Double =
      eval(src(df), q, "2024-01-01 10:02:00").select("value")
        .collect().map(_.getDouble(0)).head
    // sum(...) is a one-element vector → its value; cpu has 2 series → NaN
    assert(one("vector(scalar(sum(cpu)))") == 14.0)
    assert(one("vector(scalar(cpu))").isNaN)
    assert(one("vector(42)") == 42.0)
    // scalar() as a binary operand broadcast-joins (no collect)
    val shares = eval(src(df), "cpu / scalar(sum(cpu))", "2024-01-01 10:02:00")
      .select("user_id", "value").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(shares == Map(1L -> 5.0 / 14.0, 2L -> 9.0 / 14.0))
    // or vector(0): full-label-set matching appends the no-label default
    assert(one("sum(nosuch) or vector(0)") == 0.0)
  }

  test("set operators match on the COMPLETE label sets (union, absent = \"\")") {
    val df = Seq(
      (1L, ts(0), 1L, "cpu", 5.0), (2L, ts(0), 2L, "cpu", 9.0),
      (3L, ts(0), 1L, "mem", 4.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    // lhs grouped by user_id (labels {user_id}), rhs grouped by user_id +
    // event_type (labels {user_id, event_type}): under full-label-set
    // matching NO lhs series equals an rhs series (rhs carries an extra
    // label), so `or` keeps both sides — intersection matching would have
    // dropped the rhs rows for users present on the lhs.
    val out = eval(src(df),
        "sum by (user_id) (cpu) or sum by (user_id, event_type) (mem)",
        "2024-01-01 10:02:00")
      .select("user_id", "value").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toSeq.sorted
    assert(out == Seq(1L -> 4.0, 1L -> 5.0, 2L -> 9.0))
    // and via on(user_id): explicit keys still narrow the match
    val and = eval(src(df),
        "sum by (user_id) (cpu) and on (user_id) sum by (user_id, event_type) (mem)",
        "2024-01-01 10:02:00")
      .select("user_id").collect().map(_.getLong(0)).toSeq
    assert(and == Seq(1L))
  }

  test("time components: instant constants, grid steps, and vector-argument form") {
    val df = Seq((1L, ts(0), 1L, "cpu", 5.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    def one(q: String, at: String = "2024-01-01 10:02:00"): Double =
      eval(src(df), q, at).select("value").collect().map(_.getDouble(0)).head
    // 2024-01-01 is a Monday; all components read the UTC eval instant
    assert(one("vector(0) + hour()") == 10.0)
    assert(one("vector(0) + minute()") == 2.0)
    assert(one("vector(0) + day_of_week()") == 1.0)
    assert(one("vector(0) + day_of_month()") == 1.0)
    assert(one("vector(0) + days_in_month()") == 31.0)
    assert(one("vector(0) + month()") == 1.0)
    assert(one("vector(0) + year()") == 2024.0)
    // leap February
    assert(one("vector(0) + days_in_month()", "2024-02-10 00:00:00") == 29.0)
    // vector-argument form: component of each sample's value read as epoch
    // seconds (timestamp(cpu) = 2024-01-01 10:00:00 UTC)
    assert(one("hour(timestamp(cpu))") == 10.0)
    // the alert-silencing gate: hour() = 10 ≥ 6 keeps, < 6 drops
    assert(eval(src(df), "cpu and on() hour() >= 6", "2024-01-01 10:02:00").count() == 1)
    assert(eval(src(df), "cpu and on() hour() < 6", "2024-01-01 10:02:00").count() == 0)
    // grid: each step evaluates its own instant's component
    val grid = PromQlParser.evalRange(src(df), "vector(0) + minute()",
        "2024-01-01 10:00:00", "2024-01-01 10:02:00", stepSec = 60)
      .select("value").collect().map(_.getDouble(0)).toSeq.sorted
    assert(grid == Seq(0.0, 1.0, 2.0))
  }

  test("@ modifier pins the evaluation instant; offset composes relative to it") {
    val df = Seq(
      (1L, ts(0), 1L, "cpu", 1.0), (2L, ts(2), 1L, "cpu", 2.0),
      (3L, ts(4), 1L, "cpu", 3.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    def one(q: String, at: String): Double =
      eval(src(df), q, at).select("value").collect().map(_.getDouble(0)).head
    // 2024-01-01 10:02:00 UTC = 1704103320; evaluated MUCH later, @ still
    // reads the sample live at 10:02
    assert(one("cpu @ 1704103320", "2024-01-01 23:00:00") == 2.0)
    // offset 2m relative to the pin → 10:00's sample
    assert(one("cpu @ 1704103320 offset 2m", "2024-01-01 23:00:00") == 1.0)
    // range function with @: window ends at the pin
    assert(one("sum_over_time(cpu[5m] @ 1704103320)", "2024-01-01 23:00:00") == 3.0)
    // grid: an @-pinned selector is step-invariant (broadcast across steps)
    val grid = PromQlParser.evalRange(src(df), "cpu @ 1704103320",
        "2024-01-01 12:00:00", "2024-01-01 12:02:00", stepSec = 60)
      .select("value").collect().map(_.getDouble(0)).toSeq
    assert(grid == Seq(2.0, 2.0, 2.0))
    // parse round-trip sanity: @ in either order with offset
    assert(parse("cpu offset 2m @ 1704103320") ==
      Selector(Some("cpu"), Nil, 120L, Some(AtTs(1704103320L))))
    assert(parse("cpu @ start()") == Selector(Some("cpu"), Nil, 0L, Some(AtStart)))
    // grid: @ start()/end() pin to the range's own edges (step-invariant)
    val edges = PromQlParser.evalRange(src(df), "cpu @ end()",
        "2024-01-01 10:02:00", "2024-01-01 10:04:00", stepSec = 60)
      .select("value").collect().map(_.getDouble(0)).toSeq
    assert(edges == Seq(3.0, 3.0, 3.0)) // end = 10:04 → sample at 10:04
    val starts = PromQlParser.evalRange(src(df), "cpu @ start()",
        "2024-01-01 10:02:00", "2024-01-01 10:04:00", stepSec = 60)
      .select("value").collect().map(_.getDouble(0)).toSeq
    assert(starts == Seq(2.0, 2.0, 2.0)) // start = 10:02 → sample at 10:02
    // instant: start() and end() are the evaluation instant itself
    assert(one("cpu @ end()", "2024-01-01 10:02:00") == 2.0)
  }

  test("absent_over_time: presence over the range window, not the lookback") {
    val df = Seq((1L, ts(0), 1L, "cpu", 5.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    // cpu HAS a sample in the last hour → empty
    assert(eval(src(df), "absent_over_time(cpu[1h])", "2024-01-01 10:30:00")
      .count() == 0)
    // nothing in a 5m window starting after the sample → one 1.0 row with
    // the equality-matcher labels
    val out = eval(src(df), """absent_over_time(cpu{user_id="7"}[5m])""",
        "2024-01-01 10:30:00").collect()
    assert(out.length == 1)
    assert(out.head.getAs[String]("user_id") == "7")
    assert(out.head.getAs[Double]("value") == 1.0)
    // grid: per-step absence flips when the window slides past the sample
    val grid = PromQlParser.evalRange(src(df), "absent_over_time(cpu[10m])",
        "2024-01-01 10:05:00", "2024-01-01 10:30:00", stepSec = 300)
      .select("step_ts", "value").collect()
    // sample at 10:00 is inside (T−10m, T] for T = 10:05 only
    assert(grid.length == 5)
  }

  test("holt_winters replays the Prometheus double-smoothing recursion") {
    // y = [1, 2, 4, 8], sf = 0.5, tf = 0.25 — hand-computed:
    //   i=1: b=1,     s=2       (seed b = y1−y0)
    //   i=2: b'=1,    s=3.5
    //   i=3: b'=1.125, s=6.3125
    val df = Seq(
      (1L, ts(0), 1L, "cpu", 1.0), (2L, ts(1), 1L, "cpu", 2.0),
      (3L, ts(2), 1L, "cpu", 4.0), (4L, ts(3), 1L, "cpu", 8.0),
      (5L, ts(0), 2L, "cpu", 9.0)) // lone sample → drops out (<2)
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = eval(src(df), "holt_winters(cpu[10m], 0.5, 0.25)",
        "2024-01-01 10:05:00")
      .select("user_id", "value").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out == Map(1L -> 6.3125))
    // factors outside (0,1) are rejected at parse time
    intercept[IllegalArgumentException](parse("holt_winters(cpu[10m], 1.5, 0.25)"))
  }

  test("trig battery, pi() scalar folding, day_of_year, holt_winters alias") {
    val df = Seq((1L, ts(0), 1L, "cpu", 0.5))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    def one(q: String): Double =
      eval(src(df), q, "2024-01-01 10:02:00").select("value")
        .collect().map(_.getDouble(0)).head
    assert(one("sin(cpu)") == math.sin(0.5))
    assert(one("atan(cpu)") == math.atan(0.5))
    assert(one("cosh(cpu)") == math.cosh(0.5))
    assert(math.abs(one("deg(rad(cpu))") - 0.5) < 1e-12)
    assert(one("cpu * pi()") == 0.5 * math.Pi)
    assert(parse("pi()") == ScalarLit(math.Pi))
    assert(one("day_of_year(timestamp(cpu))") == 1.0)
    // Prometheus's current name for holt_winters parses to the same AST
    assert(parse("double_exponential_smoothing(cpu[10m], 0.5, 0.25)") ==
      parse("holt_winters(cpu[10m], 0.5, 0.25)"))
  }

  test("limitk keeps the lexical first k per group; sort_by_label orders by labels") {
    val df = Seq(
      (1L, ts(0), 3L, "cpu", 5.0), (2L, ts(0), 1L, "cpu", 9.0),
      (3L, ts(0), 2L, "cpu", 1.0), (4L, ts(0), 9L, "mem", 4.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val lim = eval(src(df), "limitk(2, {event_type=~\".+\"}) by (event_type)",
        "2024-01-01 10:02:00")
      .select("event_type", "user_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    // lexical first 2 user_ids per metric, value-independent
    assert(lim == Set(("cpu", 1L), ("cpu", 2L), ("mem", 9L)))
    val sorted = eval(src(df), """sort_by_label_desc({event_type="cpu"}, "user_id")""",
        "2024-01-01 10:02:00")
      .select("user_id").collect().map(_.getLong(0)).toSeq
    assert(sorted == Seq(3L, 2L, 1L))
  }

  test("limit_ratio partitions exactly: r and r-1 select complements, ±1 and 0 pin") {
    val df = (1L to 40L).map(u => (u, ts(0), u, "cpu", u.toDouble))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    def keep(q: String): Set[Long] =
      eval(src(df), q, "2024-01-01 10:02:00")
        .select("user_id").collect().map(_.getLong(0)).toSet
    val all = keep("limit_ratio(1.0, cpu)")
    assert(all == (1L to 40L).toSet)              // r = 1 keeps everything
    assert(keep("limit_ratio(-1.0, cpu)") == all) // frac ≥ 0 also keeps all
    assert(keep("limit_ratio(0.0, cpu)").isEmpty) // r = 0 keeps nothing
    val head = keep("limit_ratio(0.3, cpu)")
    val tail = keep("limit_ratio(-0.7, cpu)")
    // the complementarity contract: an exact partition of the vector
    assert((head & tail).isEmpty && (head | tail) == all)
    // deterministic: same query, same kept set
    assert(keep("limit_ratio(0.3, cpu)") == head)
    // a plausible sample size for a uniform hash over 40 series
    assert(head.size >= 3 && head.size <= 21)
    // grid path agrees with the instant path on the same instant
    val g = PromQlParser.evalRange(src(df), "limit_ratio(0.3, cpu)",
      "2024-01-01 10:02:00", "2024-01-01 10:02:00", 60)
      .select("user_id").collect().map(_.getLong(0)).toSet
    assert(g == head)
    intercept[IllegalArgumentException] {
      parse("limit_ratio(1.5, cpu)")
    }
  }

  test("mad_over_time is the interpolating MAD; ts_of_* return sample epochs") {
    // 1, 3, 7, 100 → median (3+7)/2 = 5; |dev| sorted {2,2,4,95} → MAD 3
    val df = Seq((1L, ts(0), 1.0), (2L, ts(1), 3.0), (3L, ts(2), 7.0),
      (4L, ts(3), 100.0))
      .toDF("event_id", "ts", "value")
      .withColumn("user_id", lit(1L)).withColumn("event_type", lit("cpu"))
    def run(q: String) = eval(src(df), q, "2024-01-01 10:30:00")
      .select("value").head().getDouble(0)
    assert(run("mad_over_time(cpu[1h])") == 3.0)
    // 10:00 = 1704103200; max (100.0) sits at 10:03, min (1.0) at 10:00
    assert(run("ts_of_max_over_time(cpu[1h])") == 1704103380.0)
    assert(run("ts_of_min_over_time(cpu[1h])") == 1704103200.0)
    assert(run("ts_of_last_over_time(cpu[1h])") == 1704103380.0)
    // tie rule — PINNED (upstream's is unspecified): equal values resolve
    // to the LATEST timestamp for max and the EARLIEST for min
    val tie = Seq((1L, ts(0), 5.0), (2L, ts(1), 5.0))
      .toDF("event_id", "ts", "value")
      .withColumn("user_id", lit(1L)).withColumn("event_type", lit("cpu"))
    def runT(q: String) = eval(src(tie), q, "2024-01-01 10:30:00")
      .select("value").head().getDouble(0)
    assert(runT("ts_of_max_over_time(cpu[1h])") == 1704103260.0)
    assert(runT("ts_of_min_over_time(cpu[1h])") == 1704103200.0)
    // grid form rides the shared *_over_time explode (per-step windows)
    val grid = PromQlParser.evalRange(src(df), "ts_of_max_over_time(cpu[2m])",
        "2024-01-01 10:01:00", "2024-01-01 10:03:00", stepSec = 120)
      .collect()
      .map(r => r.getAs[java.sql.Timestamp]("step_ts").toString -> r.getAs[Double]("value"))
      .toMap
    assert(grid == Map(
      "2024-01-01 10:01:00.0" -> 1704103260.0,  // window {10:00,10:01} → 3.0@10:01
      "2024-01-01 10:03:00.0" -> 1704103380.0)) // window {10:02,10:03} → 100@10:03
  }

  test("% ^ atan2: precedence, ^ right-associativity, Prometheus edge rules") {
    val df = Seq((1L, ts(0), 1L, "cpu", 7.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    def run(q: String) = eval(src(df), q, "2024-01-01 10:02:00")
      .select("value").head().getDouble(0)
    assert(run("cpu % 4") == 3.0)
    assert(run("cpu % 0").isNaN)           // Go math.Mod(x, 0) = NaN
    assert(run("cpu % -4") == 3.0)         // sign of the DIVIDEND
    assert(run("cpu ^ 2") == 49.0)
    assert(run("2 ^ cpu") == 128.0)        // scalar-on-left keeps pow order
    assert(run("cpu atan2 7") == math.Pi / 4)
    // ^ is right-associative and the tightest binary tier: the scalar
    // tail folds FIRST (2^3 = 8); left association would give (cpu^2)^3
    assert(parse("cpu ^ 2 ^ 3") ==
      BinOp("^", Selector(Some("cpu"), Nil), ScalarLit(8.0), None))
    assert(parse("cpu atan2 cpu + 1") == BinOp("+",
      BinOp("atan2", Selector(Some("cpu"), Nil), Selector(Some("cpu"), Nil), None),
      ScalarLit(1), None))
    // unary sign binds LOOSER than ^: -2^2 = −(2^2) = −4
    assert(run("cpu * 0 + -2 ^ 2") == -4.0)
    // a metric NAMED atan2 still selects (PromQL reserves nothing)
    assert(parse("""atan2{job="x"}""") ==
      Selector(Some("atan2"), Seq(Matcher("job", "=", "x"))))
  }

  test("clamp with min > max yields NaN; round(v, 0) is rejected") {
    val df = Seq((1L, ts(0), 1L, "cpu", 5.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val v = eval(src(df), "clamp(cpu, 10, 2)", "2024-01-01 10:02:00")
      .select("value").collect().map(_.getDouble(0)).head
    assert(v.isNaN)
    intercept[IllegalArgumentException] {
      eval(src(df), "round(cpu, 0)", "2024-01-01 10:02:00").collect()
    }
  }

  test("duration expressions (3.4 experimental) fold at parse time") {
    // range position: arithmetic, parens, bare numbers as seconds
    assert(parse("cpu[30m * 2]") == RangeVec(Selector(Some("cpu"), Nil), 3600L))
    assert(parse("cpu[1h + 30m]") == RangeVec(Selector(Some("cpu"), Nil), 5400L))
    assert(parse("cpu[3600 / 2]") == RangeVec(Selector(Some("cpu"), Nil), 1800L))
    assert(parse("cpu[(2h - 30m) / 3]") == RangeVec(Selector(Some("cpu"), Nil), 1800L))
    assert(parse("rate(cpu[2 * 5m])") ==
      RangeFn("rate", Selector(Some("cpu"), Nil), 600L))
    // precedence matches scalar arithmetic: ^ tightest + right-assoc,
    // unary binds looser than ^, then * / %, then + -
    assert(parse("cpu[2^2^3 + 44]") == RangeVec(Selector(Some("cpu"), Nil), 300L))
    assert(parse("cpu[7m % 2m]") == RangeVec(Selector(Some("cpu"), Nil), 60L))
    assert(parse("cpu[1h - 2 * 15m]") == RangeVec(Selector(Some("cpu"), Nil), 1800L))
    // subquery: both range and step take expressions
    assert(parse("avg_over_time(cpu[30m * 2 : 10m / 2])") ==
      RangeSub("avg_over_time",
        Subquery(Selector(Some("cpu"), Nil), 3600L, 300L)))
    // offset: parenthesized expression (sign outside, the 2.26 form)
    assert(parse("cpu offset (1h + 30m)") == Selector(Some("cpu"), Nil, 5400L))
    assert(parse("cpu offset -(2h - 30m)") == Selector(Some("cpu"), Nil, -5400L))
    // an UN-parenthesized '+' after the duration stays a scalar binop
    assert(parse("cpu offset 1h + 2") ==
      BinOp("+", Selector(Some("cpu"), Nil, 3600L), ScalarLit(2.0), None))
    // guards: non-positive range, non-integral seconds (second-granular
    // grid — rejected loudly, not truncated; documented divergence)
    intercept[IllegalArgumentException](parse("cpu[5m - 10m]"))
    intercept[IllegalArgumentException](parse("cpu[5m / 7]"))
    intercept[IllegalArgumentException](parse("cpu[1h : 5m - 5m]"))
    // printer emits the folded canonical duration → parse∘print = id
    assert(PromQlFormat.format(parse("cpu[90m + 30m]")) == "cpu[2h]")
    assert(PromQlFormat.format(parse("cpu offset (90m * 2)")) == "cpu offset 3h")
  }

  test("subquery offset and @ shift/pin the whole subquery window") {
    // parse shapes: modifiers in either order, negative offset, durexpr
    assert(parse("avg_over_time(cpu[1h:5m] offset 30m)") ==
      RangeSub("avg_over_time",
        Subquery(Selector(Some("cpu"), Nil), 3600L, 300L, 1800L)))
    assert(parse("avg_over_time(cpu[1h:5m] @ 1704103200 offset -1h)") ==
      RangeSub("avg_over_time", Subquery(Selector(Some("cpu"), Nil),
        3600L, 300L, -3600L, Some(AtTs(1704103200L)))))
    assert(parse("max_over_time(cpu[1h:5m] offset (10m * 3))") ==
      RangeSub("max_over_time",
        Subquery(Selector(Some("cpu"), Nil), 3600L, 300L, 1800L)))
    // semantics: samples at 10:00..10:59; the offset window must fold
    // EXACTLY the shifted grid instants (last-in-lookback per point)
    val df = (0 until 60).map { m =>
      ((m + 1).toLong, ts(m), 1L, "cpu", m.toDouble)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
    def one(q: String, at: String) =
      eval(src(df), q, at).select("value").collect().map(_.getDouble(0)).head
    // grid for [30m:10m] ending 11:00 = CLOSED [10:30, 11:00] →
    // instants {10:30,10:40,10:50,11:00} → values {30,40,50,59}, max 59;
    // offset 30m re-anchors to 10:30 → closed [10:00, 10:30] → max 30
    assert(one("max_over_time(cpu[30m:10m])", "2024-01-01 11:00:00") == 59.0)
    assert(one("max_over_time(cpu[30m:10m] offset 30m)", "2024-01-01 11:00:00") == 30.0)
    // @ pin: evaluated at 23:00 but pinned to 10:30 → same 30; offset
    // composes relative to the pin (pin-first-then-shift)
    val pin = java.sql.Timestamp.valueOf("2024-01-01 10:30:00").getTime / 1000
    assert(one(s"max_over_time(cpu[30m:10m] @ $pin)", "2024-01-01 23:00:00") == 30.0)
    assert(one(s"max_over_time(cpu[30m:10m] @ ${pin + 1800} offset 30m)",
      "2024-01-01 23:00:00") == 30.0)
    // query_range parity: each outer step equals instant evaluation
    val g = evalRange(src(df), "max_over_time(cpu[30m:10m] offset 30m)",
      "2024-01-01 10:40:00", "2024-01-01 11:00:00", 600)
      .orderBy("step_ts").select("value").collect().map(_.getDouble(0))
    val direct = Seq("2024-01-01 10:40:00", "2024-01-01 10:50:00",
      "2024-01-01 11:00:00")
      .map(t => one("max_over_time(cpu[30m:10m] offset 30m)", t))
    assert(g.toSeq == direct)
    // @-pinned subquery on the grid is step-invariant
    val gp = evalRange(src(df), s"max_over_time(cpu[30m:10m] @ $pin)",
      "2024-01-01 10:40:00", "2024-01-01 11:00:00", 600)
      .select("value").collect().map(_.getDouble(0))
    assert(gp.length == 3 && gp.forall(_ == 30.0))
    // printer round-trips the modifiers (canonical @-then-offset order)
    assert(PromQlFormat.format(parse("avg_over_time(cpu[1h:5m] offset 30m @ 17)")) ==
      "avg_over_time((cpu)[1h:5m] @ 17 offset 30m)")
    // `[1h:]` empty step defaults to the 60 s engine resolution
    assert(parse("avg_over_time(cpu[1h:])") ==
      RangeSub("avg_over_time", Subquery(Selector(Some("cpu"), Nil), 3600L, 60L)))
    assert(parse("avg_over_time(cpu[1h:] offset 5m)") ==
      RangeSub("avg_over_time",
        Subquery(Selector(Some("cpu"), Nil), 3600L, 60L, 300L)))
  }

  test("grid irate/idelta agree with instant evaluation at every step") {
    // cpu: 1@10:00 5@10:04 3@10:09 9@10:10 (reset at 10:09)
    val df = Seq(
      (1L, ts(0), 7L, "cpu", 1.0), (2L, ts(4), 7L, "cpu", 5.0),
      (3L, ts(9), 7L, "cpu", 3.0), (4L, ts(10), 7L, "cpu", 9.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    for (fn <- Seq("irate", "idelta")) {
      val grid = evalRange(src(df), s"$fn(cpu[6m])",
        "2024-01-01 10:02:00", "2024-01-01 10:12:00", 120L)
        .collect().map(r => (r.getAs[java.sql.Timestamp]("step_ts").toString,
          math.round(r.getAs[Double]("value") * 1e9))).toSet
      val inst = (0 to 5).flatMap { i =>
        val t = f"2024-01-01 10:${2 + 2 * i}%02d:00"
        eval(src(df), s"$fn(cpu[6m])", t)
          .collect().map(r => (t + ".0", math.round(r.getAs[Double]("value") * 1e9)))
      }.toSet
      assert(grid == inst, s"$fn grid != instant")
    }
    // spot-check the reset + guard: at 10:10 the pair is (3@10:09, 9@10:10)
    // → no reset (9 > 3) Δ=6 over 60 s; at 10:02 the only in-window sample
    // is 1@10:00 whose predecessor is absent → no output row
    val at1010 = eval(src(df), "irate(cpu[6m])", "2024-01-01 10:10:00").collect()
    assert(at1010.length == 1 && at1010(0).getAs[Double]("value") == 0.1)
    assert(eval(src(df), "irate(cpu[6m])", "2024-01-01 10:02:00").collect().isEmpty)
  }

  test("extended range selectors: parse, restrict, format/json, eval") {
    // parse both modes, either side of offset
    assert(parse("rate(cpu[1m] anchored)") ==
      ExtRange("anchored", "rate", Selector(Some("cpu"), Nil), 60L))
    assert(parse("increase(cpu[5m] smoothed)") ==
      ExtRange("smoothed", "increase", Selector(Some("cpu"), Nil), 300L))
    assert(parse("delta(cpu[5m] offset 1m anchored)") ==
      ExtRange("anchored", "delta",
        Selector(Some("cpu"), Nil, offsetSec = 60L), 300L))
    assert(parse("rate(cpu[5m] anchored offset 1m)") ==
      ExtRange("anchored", "rate",
        Selector(Some("cpu"), Nil, offsetSec = 60L), 300L))
    // 'anchored'/'smoothed' in metric-name position still select
    assert(parse("anchored") == Selector(Some("anchored"), Nil))
    // only rate/increase/delta accept the modifier (upstream restriction)
    for (bad <- Seq("sum_over_time(cpu[5m] anchored)",
      "irate(cpu[5m] smoothed)", "holt_winters(cpu[5m] anchored, 0.5, 0.5)"))
      assert(intercept[IllegalArgumentException](parse(bad))
        .getMessage.contains("not allowed"), bad)
    // format round-trip: format(parse(q)) re-parses to the same AST
    for (q <- Seq("rate(cpu[1m] anchored)", "increase(cpu[5m] smoothed)",
      "delta(cpu[5m] offset 1m anchored)"))
      assert(parse(PromQlFormat.format(parse(q))) == parse(q), q)
    // parse_query JSON carries the modifier on the matrix selector
    assert(PromQlJson.json(parse("rate(cpu[1m] anchored)"))
      .contains("\"timeRangeMode\":\"anchored\""))
    // instant eval: constant-rate counter (+6/min) at T = the last
    // sample, window start 10:01:30 BETWEEN samples; the left anchor /
    // straddle comes from BEFORE the window via the extended fetch.
    // smoothed interpolates the start boundary (v=9) → exactly 0.1;
    // anchored holds the 10:01 sample (v=6) → exactly 12/90 (the
    // zero-order-hold face). No post-window data exists at the head, so
    // the right edge is the last in-window sample in both modes.
    val df = Seq(
      (1L, ts(0), 1L, "cpu", 0.0), (2L, ts(1), 1L, "cpu", 6.0),
      (3L, ts(2), 1L, "cpu", 12.0), (4L, ts(3), 1L, "cpu", 18.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    def one(q: String): Double = {
      val out = eval(src(df), q, "2024-01-01 10:03:00").collect()
      assert(out.length == 1, s"$q: ${out.toSeq}")
      out(0).getAs[Double]("value")
    }
    assert(math.abs(one("rate(cpu[90s] smoothed)") - 0.1) < 1e-12)
    assert(math.abs(one("rate(cpu[90s] anchored)") - 12.0 / 90) < 1e-12)
    assert(math.abs(one("increase(cpu[90s] smoothed)") - 9.0) < 1e-12)
    assert(math.abs(one("delta(cpu[90s] smoothed)") - 9.0) < 1e-12)
    // grid eval: a ONE-STEP range query must equal the instant query
    // EXACTLY (shared decimal-difference boundary math — the prefix-sum
    // bases of the two fetches cancel in decimal)
    for (q <- Seq("rate(cpu[90s] anchored)", "rate(cpu[90s] smoothed)",
      "increase(cpu[90s] smoothed)", "delta(cpu[90s] smoothed)")) {
      val grid = evalRange(src(df), q,
        "2024-01-01 10:03:00", "2024-01-01 10:03:00", 60L)
        .collect().map(r => (r.getAs[String]("event_type"),
          r.getAs[Double]("value"))).toSeq
      val inst = eval(src(df), q, "2024-01-01 10:03:00")
        .collect().map(r => (r.getAs[String]("event_type"),
          r.getAs[Double]("value"))).toSeq
      assert(grid == inst, s"$q grid != instant: $grid vs $inst")
    }
    // a mid-grid step gets its left anchor from before its own window
    val gridMid = evalRange(src(df), "increase(cpu[90s] anchored)",
      "2024-01-01 10:02:00", "2024-01-01 10:03:00", 60L)
      .collect().map(r => (r.getAs[java.sql.Timestamp]("step_ts").toString,
        r.getAs[Double]("value"))).toMap
    // T=10:02: window (10:00:30,10:02], anchor=10:00 (v0) -> 12−0 = 12
    // T=10:03: anchor=10:01 (v6) -> 18−6 = 12
    assert(gridMid == Map("2024-01-01 10:02:00.0" -> 12.0,
      "2024-01-01 10:03:00.0" -> 12.0), gridMid)
  }

  test("literal-alternation matchers: detection, equivalence, pushdown") {
    import PromQlParser.literalAlternatives
    assert(literalAlternatives("a|b|c") == Some(Seq("a", "b", "c")))
    assert(literalAlternatives("click") == Some(Seq("click")))
    assert(literalAlternatives("a|") == Some(Seq("a", "")))
    assert(literalAlternatives("under_score|dash-ok|colon:ok") ==
      Some(Seq("under_score", "dash-ok", "colon:ok")))
    // anything needing regex machinery stays on RLIKE
    for (re <- Seq("a.*", "a|b+", "a(b)", "a[b]", "a{2}", "^a", "a$", "a\\|b"))
      assert(literalAlternatives(re).isEmpty, re)
    // semantics: IN path ≡ regex path on a fixture with empty-alt form
    val df = Seq(
      (1L, ts(0), 1L, "click", 1.0), (2L, ts(0), 1L, "view", 2.0),
      (3L, ts(0), 1L, "clicky", 3.0), (4L, ts(0), 1L, "", 4.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    def vals(q: String) = eval(src(df), q, "2024-01-01 10:01:00")
      .select("value").collect().map(_.getDouble(0)).toSet
    assert(vals("""{event_type=~"click|view"}""") == Set(1.0, 2.0))
    assert(vals("""{event_type=~"click|"}""") == Set(1.0, 4.0))
    assert(vals("""{event_type!~"click|view"}""") == Set(3.0, 4.0))
    assert(vals("""{event_type=~"click.*"}""") == Set(1.0, 3.0)) // regex path
    // and the IN list reaches the parquet scan as a pushed filter —
    // RLIKE never does; at 100 TB this is row-group pruning vs full scan
    val real = PromSource(graft.Tables.events(spark, graft.TestSpark.SF),
      "event_type", Seq("user_id", "event_type"), "ts", "event_id", "value")
    val q = eval(real, """{event_type=~"click|view"}""", "2024-01-10 00:00:00")
    q.count()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("In(event_type, [click,view])"),
      s"IN not pushed:\n${plan.take(2500)}")
  }
}
