package graft.metrics

import graft.metrics.PromQlParser.{PromSource, eval}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Recording rules: grid results re-enter the source under the record
  * name and are selectable/queryable like any scraped metric. */
class RecordingRulesSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  private def ts(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")

  private def src(df: org.apache.spark.sql.DataFrame) =
    PromSource(df, "event_type", Seq("user_id", "event_type"),
      "ts", "event_id", "value")

  test("recorded series keep labels, take the record name, and re-query") {
    val df = (0 to 4).map(m => (m.toLong, ts(m), (m + 1).toDouble))
      .toDF("event_id", "ts", "value")
      .withColumn("user_id", lit(1L)).withColumn("event_type", lit("cpu"))
    val rec = RecordingRules.materialize(src(df), "job:cpu:count",
      "count_over_time(cpu[2m])",
      "2024-01-01 10:02:00", "2024-01-01 10:04:00", stepSec = 120)
    // three recorded samples: counts over (10:00,10:02] and (10:02,10:04]
    val direct = eval(rec, """{event_type="job:cpu:count"}""",
        "2024-01-01 10:04:00")
      .select("value").collect().map(_.getDouble(0)).toSeq
    assert(direct == Seq(2.0)) // newest sample in the 5m lookback
    // a range fn over the recorded metric composes: both grid samples
    val summed = eval(rec, """sum_over_time({event_type="job:cpu:count"}[4m])""",
        "2024-01-01 10:04:00")
      .select("value").collect().map(_.getDouble(0)).toSeq
    assert(summed == Seq(4.0)) // 2 + 2
    // the original metric is untouched
    assert(eval(rec, "cpu", "2024-01-01 10:04:00")
      .select("value").head().getDouble(0) == 5.0)
  }

  test("RuleGroup dependency analysis: batches, conservatism, later reads") {
    import RuleGroup.{Rule, batches, readsOf}
    // exact pins: bare metric, __name__=, metricCol=
    assert(readsOf("""rate(cpu[5m])""", "event_type") == (Set("cpu"), false))
    assert(readsOf("""{__name__="a"} + {event_type="b"}""", "event_type") ==
      (Set("a", "b"), false))
    // regex / bare-matcher selectors conservatively read everything
    assert(readsOf("""{event_type=~"c.*"}""", "event_type")._2)
    assert(readsOf("""{job="x"}""", "event_type")._2)
    // chain: a,b independent; c reads both; d reads c; e unrelated
    val rules = Seq(
      Rule("a", "rate(cpu[5m])"),
      Rule("b", "rate(mem[5m])"),
      Rule("c", """{event_type="a"} / on(job) {event_type="b"}"""),
      Rule("d", """{event_type="c"} * 2"""),
      Rule("e", "rate(disk[5m])"))
    assert(batches(rules, "event_type") == Seq(0, 0, 1, 2, 0))
    // a read-everything rule serializes behind every earlier record
    assert(batches(rules :+ Rule("f", """sum({event_type=~".+"})"""),
      "event_type").last == 3)
    // reading a LATER rule's name = previous cycle upstream → no
    // in-group edge here (documented divergence), so both stay batch 0
    assert(batches(Seq(Rule("x", """{event_type="y"} * 1"""),
      Rule("y", "rate(cpu[5m])")), "event_type") == Seq(0, 0))
  }

  test("batches: forward-edge constraint keeps a later rule's records " +
    "out of an earlier rule's batch input") {
    import RuleGroup.{Rule, batches}
    // [P, A reads {P,C}, C]: without the forward constraint C lands in
    // batch 0 and A (batch 1, via its P dep) would read C's records —
    // diverging from sequential "forward reads see nothing". The fix
    // forces out(C) >= out(A).
    val rules = Seq(
      Rule("p", "rate(cpu[5m])"),
      Rule("a", """{event_type="p"} + {event_type="c"}"""),
      Rule("c", "rate(mem[5m])"))
    val bs = batches(rules, "event_type")
    assert(bs(0) == 0 && bs(1) == 1)
    assert(bs(2) >= bs(1), s"C must not evaluate before A's batch: $bs")
  }

  test("evalBatched == evalSequential on the forward-edge fixture") {
    import RuleGroup.Rule
    // cpu and mem series; A sums p and c records via ignoring-match —
    // sequentially A's read of c (declared later) sees NOTHING, so A ==
    // p's value alone. Pre-fix batched let A see c's batch-0 records.
    val df = (0 to 4).flatMap(m => Seq(
        (m.toLong, ts(m), (m + 1).toDouble, "cpu"),
        (m.toLong + 100, ts(m), 10.0 * (m + 1), "mem")))
      .toDF("event_id", "ts", "value", "event_type")
      .withColumn("user_id", lit(1L))
    val rules = Seq(
      Rule("p", """{event_type="cpu"} * 1"""),
      Rule("a", """{event_type="p"} or {event_type="c"}"""),
      Rule("c", """{event_type="mem"} * 1"""))
    val (start, end) = ("2024-01-01 10:01:00", "2024-01-01 10:04:00")
    val (batched, _) = RuleGroup.evalBatched(src(df), rules, start, end, 60L)
    val sequential = RuleGroup.evalSequential(src(df), rules, start, end, 60L)
    def recs(s: PromSource) = s.df
      .filter(col("event_type").isin("p", "a", "c"))
      .select("event_type", "ts", "value")
      .collect().map(r => (r.getString(0), r.getTimestamp(1), r.getDouble(2)))
      .toSeq.sortBy(t => (t._1, t._2.getTime))
    val b = recs(batched); val q = recs(sequential)
    assert(b == q)
    // and A genuinely saw only p (4 grid samples), never c
    assert(b.count(_._1 == "a") == 4)
    assert(b.filter(_._1 == "a").map(_._3) ==
      b.filter(_._1 == "p").map(_._3))
  }

  test("multi-cycle: a forward reference reads the PREVIOUS cycle's " +
    "sample; plan face == iterative face exactly, including a gap") {
    import RuleGroup.Rule
    // cpu sampled at minutes 1,2,4,5 (minute 3 missing) → tot has a gap
    // at cycle 3; lag@k = tot@(k−1) when present, so lag exists at
    // cycles {2,3,5} and NOT at 4 — the gap pins the lookback-width fix
    // (a plain shifted selector would fall through to tot@2 at cycle 4).
    val df = Seq(1, 2, 4, 5).map(m => (m.toLong, ts(m), (m + 1).toDouble))
      .toDF("event_id", "ts", "value")
      .withColumn("user_id", lit(1L)).withColumn("event_type", lit("cpu"))
    val rules = Seq(
      Rule("lag", """{event_type="tot"}"""),
      Rule("tot", "sum_over_time(cpu[1m])"))
    val cycles = (1 to 5).map(m => f"2024-01-01 10:$m%02d:00")
    val iter = RuleGroup.evalCyclesIterative(src(df), rules, cycles, 90L)
    val plan = RuleGroup.evalCyclesPlan(src(df), rules,
      cycles.head, cycles.last, 60L, 90L)
    def recs(s: PromSource) = s.df
      .filter(col("event_type").isin("lag", "tot"))
      .select("event_type", "ts", "value")
      .collect().map(r => (r.getString(0), r.getTimestamp(1).getTime, r.getDouble(2)))
      .toSeq.sorted
    val it = recs(iter)
    assert(recs(plan) == it)
    def minuteOf(ms: Long) = ((ms - ts(0).getTime) / 60000L).toInt
    assert(it.filter(_._1 == "tot").map(t => (minuteOf(t._2), t._3)) ==
      Seq((1, 2.0), (2, 3.0), (4, 5.0), (5, 6.0)))
    assert(it.filter(_._1 == "lag").map(t => (minuteOf(t._2), t._3)) ==
      Seq((2, 2.0), (3, 3.0), (5, 5.0)))
  }

  test("evalCyclesPlan rejects feedback loops and mixed-lookback rules") {
    import RuleGroup.Rule
    val df = Seq((1L, ts(1), 1.0)).toDF("event_id", "ts", "value")
      .withColumn("user_id", lit(1L)).withColumn("event_type", lit("cpu"))
    // a <-> b feedback: recursive across cycles, only iterative can run it
    intercept[IllegalArgumentException] {
      RuleGroup.evalCyclesPlan(src(df),
        Seq(Rule("a", """{event_type="b"} * 1"""),
          Rule("b", """{event_type="a"} * 1""")),
        "2024-01-01 10:01:00", "2024-01-01 10:02:00", 60L, 90L)
    }
    // a forward read mixed with a raw read in one expr: two lookbacks
    intercept[IllegalArgumentException] {
      RuleGroup.evalCyclesPlan(src(df),
        Seq(Rule("m", """{event_type="z"} or {event_type="cpu"}"""),
          Rule("z", """{event_type="cpu"} * 2""")),
        "2024-01-01 10:01:00", "2024-01-01 10:02:00", 60L, 90L)
    }
    // and the lookback must exceed the step at all
    intercept[IllegalArgumentException] {
      RuleGroup.evalCyclesPlan(src(df),
        Seq(Rule("z", """{event_type="cpu"} * 2""")),
        "2024-01-01 10:01:00", "2024-01-01 10:02:00", 60L, 60L)
    }
  }
}
