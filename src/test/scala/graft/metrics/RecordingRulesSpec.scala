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
}
