package graft.metrics

import graft.metrics.PromQlParser.PromSource
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The alerting-rule state machine: pending until a run of active steps is
  * `for` old, firing from then on; a gap resets ActiveAt (upstream rule). */
class AlertRulesSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  private def ts(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")

  private def src(df: org.apache.spark.sql.DataFrame) =
    PromSource(df, "event_type", Seq("user_id", "event_type"),
      "ts", "event_id", "value")

  test("pending -> firing after `for`; a gap resets the run") {
    // active at minutes 0-3 and 6-7 (samples, 60s lookback = presence at
    // exactly the sample's step); for = 120s
    val df = Seq(0, 1, 2, 3, 6, 7).zipWithIndex
      .map { case (m, i) => (i.toLong, ts(m), 1.0) }
      .toDF("event_id", "ts", "value")
      .withColumn("user_id", lit(1L)).withColumn("event_type", lit("cpu"))
    val out = AlertRules.evalRule(src(df),
        AlertRules.Rule("Up", "cpu", forSec = 120),
        "2024-01-01 10:00:00", "2024-01-01 10:09:00", stepSec = 60,
        lookbackSec = 60)
      .select(col("step_ts"), col("alertstate")).collect()
      .map(r => r.getTimestamp(0).toString.substring(14, 16) -> r.getString(1))
      .toMap
    assert(out == Map(
      "00" -> "pending", "01" -> "pending",          // elapsed 0s, 60s
      "02" -> "firing", "03" -> "firing",            // elapsed >= 120s
      "06" -> "pending", "07" -> "pending"))         // gap reset ActiveAt
    // for = 0 fires on the first active step
    val immediate = AlertRules.evalRule(src(df),
        AlertRules.Rule("Up", "cpu", forSec = 0),
        "2024-01-01 10:00:00", "2024-01-01 10:00:00", stepSec = 60,
        lookbackSec = 60)
      .select("alertstate").collect().map(_.getString(0)).toSeq
    assert(immediate == Seq("firing"))
  }

  test("keep_firing_for: kept tails, bridging without pending restart, pending dies") {
    // active minutes 0-2 and 5 and 9; for=60s, keep_firing_for=120s
    //  - run 0-2: pending@0, firing@1,2
    //  - gap 3-4: within keep (first inactive 3; 5 ≤ 3+2) → BRIDGE:
    //    3,4 kept firing, 5 firing immediately (no pending restart)
    //  - gap 6-8: 9 > 6+2 → kept tail 6,7 (elapsed 0s,60s... up to 120s
    //    at 8? floor(120/60)=2 → 6,7,8 kept), then 9 starts FRESH pending
    val df = Seq(0, 1, 2, 5, 9).zipWithIndex
      .map { case (m, i) => (i.toLong, ts(m), 10.0 + m) }
      .toDF("event_id", "ts", "value")
      .withColumn("user_id", lit(1L)).withColumn("event_type", lit("cpu"))
    val out = AlertRules.evalRule(src(df),
        AlertRules.Rule("Up", "cpu", forSec = 60, keepFiringSec = 120),
        "2024-01-01 10:00:00", "2024-01-01 10:09:00", stepSec = 60,
        lookbackSec = 60)
      .select(col("step_ts"), col("alertstate"), col("value")).collect()
      .map(r => r.getTimestamp(0).toString.substring(14, 16) ->
        ((r.getString(1), r.getDouble(2))))
      .toMap
    assert(out == Map(
      "00" -> ("pending", 10.0), "01" -> ("firing", 11.0), "02" -> ("firing", 12.0),
      "03" -> ("firing", 12.0), "04" -> ("firing", 12.0),   // bridged gap, carried value
      "05" -> ("firing", 15.0),                             // no pending restart
      "06" -> ("firing", 15.0), "07" -> ("firing", 15.0),   // kept tail
      "08" -> ("firing", 15.0),                             // elapsed 120s ≤ keep
      "09" -> ("pending", 19.0)))                           // fresh run
    // a PENDING run that clears dies with no kept tail; the trailing
    // kept tail clips at the grid end
    val df2 = Seq((1L, ts(0), 1.0), (2L, ts(3), 2.0), (3L, ts(4), 3.0))
      .toDF("event_id", "ts", "value")
      .withColumn("user_id", lit(1L)).withColumn("event_type", lit("cpu"))
    val out2 = AlertRules.evalRule(src(df2),
        AlertRules.Rule("Up", "cpu", forSec = 60, keepFiringSec = 3600),
        "2024-01-01 10:00:00", "2024-01-01 10:05:00", stepSec = 60,
        lookbackSec = 60)
      .select(col("step_ts"), col("alertstate")).collect()
      .map(r => r.getTimestamp(0).toString.substring(14, 16) -> r.getString(1))
      .toMap
    assert(out2 == Map(
      "00" -> "pending",                     // lone step dies silently (1-2 empty)
      "03" -> "pending", "04" -> "firing",   // second run matures
      "05" -> "firing"))                     // kept tail clipped at grid end
  }

  test("evalGroup unions rules with differing label sets") {
    val df = Seq((1L, ts(0), 1L, "cpu", 9.0), (2L, ts(0), 2L, "mem", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = AlertRules.evalGroup(src(df), Seq(
        AlertRules.Rule("AnyCpu", """sum by (event_type) ({event_type="cpu"})""", 0),
        AlertRules.Rule("PerUser", """{event_type="mem"}""", 0)),
        "2024-01-01 10:00:00", "2024-01-01 10:00:00", stepSec = 60,
        lookbackSec = 300)
      .select("alertname", "alertstate").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(out == Set(("AnyCpu", "firing"), ("PerUser", "firing")))
  }
}
