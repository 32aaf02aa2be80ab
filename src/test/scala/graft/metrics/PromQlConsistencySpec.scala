package graft.metrics

import org.scalatest.funsuite.AnyFunSuite

/** Cross-compiler consistency: the instant compiler (`eval`) and the
  * grid compiler (`evalRange`) are SEPARATE code paths over the same
  * semantics, so a one-step range query at T must produce exactly the
  * instant result at T for every supported form. This pins the two
  * compilers to each other — a regression in either one's fold order,
  * staleness rule, or matching logic fails here even if its own oracle
  * query happens not to exercise the divergent branch.
  *
  * Values compare at 9 dp (both paths route sums through the same
  * decimal discipline; 9 dp catches any real divergence while ignoring
  * representation noise in double formatting).
  */
class PromQlConsistencySpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  private lazy val src: PromQlParser.PromSource = {
    val rows = for {
      m <- Seq("cpu", "mem"); i <- 0 until 24
    } yield (m, (i % 3).toString,
      java.sql.Timestamp.valueOf(f"2024-01-01 10:${2 * i}%02d:00"),
      (i * 7 % 13).toDouble + (if (m == "cpu") 1.0 else 2.0), i.toLong)
    val df = rows.toDF("metric", "inst", "ts", "value", "ord")
    PromQlParser.PromSource(df, "metric", Seq("metric", "inst"), "ts", "ord", "value")
  }

  private val T = "2024-01-01 10:40:00"

  private val forms = Seq(
    "cpu", """cpu{inst="1"}""", "cpu offset 10m", "cpu @ 1704105600",
    "sum(cpu)", "sum by (inst) (cpu)", "sum without (inst) (cpu)",
    "avg(cpu)", "min(cpu)", "max(cpu)", "count(cpu)", "group(cpu)",
    "stddev(cpu)", "stdvar(cpu)", "quantile(0.9, cpu)",
    "count_values(\"v\", cpu)",
    "rate(cpu[20m])", "increase(cpu[20m])", "delta(cpu[20m])",
    "irate(cpu[20m])", "idelta(cpu[20m])", "deriv(cpu[20m])",
    "resets(cpu[20m])", "changes(cpu[20m])",
    "avg_over_time(cpu[20m])", "sum_over_time(cpu[20m])",
    "min_over_time(cpu[20m])", "max_over_time(cpu[20m])",
    "count_over_time(cpu[20m])", "last_over_time(cpu[20m])",
    "stddev_over_time(cpu[20m])", "quantile_over_time(0.5, cpu[20m])",
    "present_over_time(cpu[20m])", "predict_linear(cpu[20m], 300)",
    "abs(cpu)", "ceil(cpu)", "exp(cpu)", "sqrt(cpu)", "round(cpu, 2)",
    "clamp(cpu, 2, 8)", "sgn(cpu)", "tanh(cpu)",
    "timestamp(cpu)", "minute(cpu)", "hour(cpu)",
    "cpu + mem", "cpu - mem", "cpu * 2", "cpu / 2", "cpu % 3", "cpu ^ 2",
    "cpu > bool 5", "cpu > 5", "-cpu",
    "cpu and mem", "cpu or mem", "cpu unless mem", "cpu atan2 mem",
    "cpu + on (inst) group_left sum by (inst) (mem)",
    """label_replace(cpu, "dst", "$1", "inst", "(.*)")""",
    """label_join(cpu, "dst", "-", "metric", "inst")""",
    "scalar(sum(cpu))", "vector(1)", "time()", "pi() * 2",
    "avg_over_time(cpu[20m:5m])", "max_over_time(cpu[20m:5m] offset 5m)",
    "sort(cpu)", "sort_by_label(cpu, \"inst\")",
    // extended range selectors (3.5): decimal-difference boundary math
    // makes the two compilers' different fetch bases cancel exactly
    "rate(cpu[20m] anchored)", "increase(cpu[20m] anchored)",
    "delta(cpu[20m] anchored)", "rate(cpu[20m] smoothed)",
    "increase(cpu[20m] smoothed)", "delta(cpu[20m] smoothed)",
    "rate(cpu[20m] anchored offset 5m)",
    "sum by (inst) (increase(cpu[20m] smoothed))")

  private def canon(df: org.apache.spark.sql.DataFrame): Set[String] = {
    val drop = Set("step_ts", "__step", "rank")
    val cols = df.columns.filterNot(drop).sorted
    df.selectExpr(cols.map(c =>
        if (df.schema(c).dataType == org.apache.spark.sql.types.DoubleType)
          s"cast(round(`$c`, 9) as string) as `$c`"
        else s"cast(`$c` as string) as `$c`"): _*)
      .collect()
      .map(r => cols.map(c => s"$c=${r.getAs[String](c)}").mkString("|"))
      .toSet
  }

  test("one-step evalRange == eval at the same instant, whole surface") {
    val failures = forms.flatMap { q =>
      try {
        val inst = canon(PromQlParser.eval(src, q, T))
        val grid = canon(PromQlParser.evalRange(src, q, T, T, stepSec = 60))
        if (inst == grid) None
        else Some(s"$q\n  instant: ${inst.toSeq.sorted.take(4).mkString("; ")}" +
          s"\n  grid:    ${grid.toSeq.sorted.take(4).mkString("; ")}")
      } catch { case e: Throwable => Some(q + " -> threw " + e.getMessage.take(120)) }
    }
    assert(failures.isEmpty, s"\n${failures.size} divergent forms:\n" +
      failures.mkString("\n"))
  }
}
