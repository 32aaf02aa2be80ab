package graft.metrics

import org.scalatest.funsuite.AnyFunSuite

/** Whole-surface smoke battery: every PromQL function/operator the engine
  * claims must actually EVALUATE (instant query on a tiny two-series
  * fixture) — a regression in any function's compiler path fails here
  * even if no declared query happens to exercise it. Value-level
  * correctness lives in the oracle-checked q89–q150 battery; this spec
  * guards existence + evaluability of the full surface in one place. */
class PromQlSurfaceSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  private lazy val src: PromQlParser.PromSource = {
    val rows = for {
      m <- Seq("cpu", "mem"); i <- 0 until 20
    } yield (m, (i % 3).toString, // instance label
      java.sql.Timestamp.valueOf(f"2024-01-01 10:${i}%02d:00"),
      (i * 7 % 13).toDouble + (if (m == "cpu") 1.0 else 2.0), i.toLong)
    val df = rows.toDF("metric", "inst", "ts", "value", "ord")
    PromQlParser.PromSource(df, "metric", Seq("metric", "inst"), "ts", "ord", "value")
  }

  private val T = "2024-01-01 10:20:00"

  private val instants = Seq(
    // selectors, matchers, offsets, @, subqueries
    "cpu", """cpu{inst="1"}""", """cpu{inst=~"1|2"}""", """cpu{inst!="1"}""",
    """{__name__="cpu"}""", "cpu offset 5m", "cpu @ 1704103200",
    "avg_over_time(cpu[10m:1m])", "max_over_time(cpu[10m:2m] offset 2m)",
    // aggregations
    "sum(cpu)", "min(cpu)", "max(cpu)", "avg(cpu)", "count(cpu)",
    "group(cpu)", "stddev(cpu)", "stdvar(cpu)", "quantile(0.9, cpu)",
    "topk(2, cpu)", "bottomk(2, cpu)", "count_values(\"v\", cpu)",
    "limitk(2, cpu)", "limit_ratio(0.5, cpu)",
    "sum by (inst) (cpu)", "sum without (inst) (cpu)",
    "sort(cpu)", "sort_desc(cpu)",
    "sort_by_label(cpu, \"inst\")", "sort_by_label_desc(cpu, \"inst\")",
    // range functions
    "rate(cpu[10m])", "irate(cpu[10m])", "increase(cpu[10m])",
    "delta(cpu[10m])", "idelta(cpu[10m])", "deriv(cpu[10m])",
    "resets(cpu[10m])", "changes(cpu[10m])",
    "avg_over_time(cpu[10m])", "sum_over_time(cpu[10m])",
    "min_over_time(cpu[10m])", "max_over_time(cpu[10m])",
    "count_over_time(cpu[10m])", "last_over_time(cpu[10m])",
    "stddev_over_time(cpu[10m])", "stdvar_over_time(cpu[10m])",
    "quantile_over_time(0.5, cpu[10m])", "mad_over_time(cpu[10m])",
    "present_over_time(cpu[10m])", "absent_over_time(cpu[10m])",
    "ts_of_last_over_time(cpu[10m])", "ts_of_max_over_time(cpu[10m])",
    "ts_of_min_over_time(cpu[10m])",
    "predict_linear(cpu[10m], 300)", "holt_winters(cpu[10m], 0.5, 0.5)",
    "double_exponential_smoothing(cpu[10m], 0.5, 0.5)",
    // scalar math
    "abs(cpu)", "ceil(cpu)", "floor(cpu)", "round(cpu)", "round(cpu, 5)",
    "exp(cpu)", "ln(cpu)", "log2(cpu)", "log10(cpu)", "sqrt(cpu)",
    "sgn(cpu)", "clamp(cpu, 2, 8)", "clamp_min(cpu, 2)", "clamp_max(cpu, 8)",
    "sin(cpu)", "cos(cpu)", "tan(cpu)", "asin(clamp(cpu, 0, 1))",
    "acos(clamp(cpu, 0, 1))", "atan(cpu)", "sinh(clamp(cpu, 0, 2))",
    "cosh(clamp(cpu, 0, 2))", "tanh(cpu)", "atanh(clamp(cpu, 0, 0.9))",
    "acosh(clamp(cpu, 1, 10))", "asinh(cpu)", "deg(cpu)", "rad(cpu)",
    // time functions
    "time()", "pi()", "vector(1)", "scalar(sum(cpu))",
    "timestamp(cpu)", "minute(cpu)", "hour(cpu)", "day_of_month(cpu)",
    "day_of_week(cpu)", "day_of_year(cpu)", "days_in_month(cpu)",
    "month(cpu)", "year(cpu)",
    // label manipulation
    """label_replace(cpu, "dst", "$1", "inst", "(.*)")""",
    """label_join(cpu, "dst", "-", "metric", "inst")""",
    // absent
    "absent(nosuchmetric)", "absent(cpu)",
    // binary ops + vector matching + bool
    "cpu + mem", "cpu - mem", "cpu * 2", "cpu / 2", "cpu % 3", "cpu ^ 2",
    "cpu > bool 5", "cpu == bool mem", "cpu > 5", "-cpu",
    "cpu + on (inst) group_left sum by (inst) (mem)",
    "cpu and mem", "cpu or mem", "cpu unless mem",
    "cpu atan2 mem", // atan2 is an infix binary operator upstream
    // scalar result type (top-level pure-scalar queries)
    "time() % 3600", "pi() * 2", "1 >= bool 2",
    // duration expressions (3.4) — step() is 0 on an instant query, so a
    // usable instant form needs a max() floor (the upstream pattern)
    "last_over_time(cpu[max(step()*10, 10m)] @ 1704103200)",
    "avg_over_time(cpu[min(20m, 1h):max(step(), 2m)])")

  test(s"every claimed PromQL form evaluates (${""}instant)") {
    val failures = instants.flatMap { q =>
      try { PromQlParser.eval(src, q, T).collect(); None }
      catch { case e: Throwable => Some(q + " -> " + e.getMessage.take(120)) }
    }
    assert(failures.isEmpty, "\n" + failures.mkString("\n"))
  }

  test("the same surface evaluates on the range grid") {
    // one representative per family through evalRange
    val ranges = Seq("sum(rate(cpu[10m]))", "quantile(0.5, cpu)",
      "limitk(1, cpu)", "sort_by_label(cpu, \"inst\")",
      "predict_linear(cpu[10m], 60)", "cpu + on (inst) group_left sum by (inst) (mem)",
      // step() resolves to the range query's own step (300 s here)
      "avg_over_time(cpu[step()*2])", "time()", "cpu + time()*2")
    val failures = ranges.flatMap { q =>
      try {
        PromQlParser.evalRange(src, q, "2024-01-01 10:05:00", T, 300).collect()
        None
      } catch { case e: Throwable => Some(q + " -> " + e.getMessage.take(120)) }
    }
    assert(failures.isEmpty, "\n" + failures.mkString("\n"))
  }
}
