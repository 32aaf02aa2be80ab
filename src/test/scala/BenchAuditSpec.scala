import org.scalatest.funsuite.AnyFunSuite

/** The audit gate's JSON readers (round-9 rework: a regex reader silently
  * mis-parsed nested/escaped shapes — the exact failure mode a mechanical
  * gate exists to prevent). Default package because BenchAudit is. */
class BenchAuditSpec extends AnyFunSuite {

  test("parseFlat reads a baseline file shape exactly") {
    val m = BenchAudit.parseFlat(
      """{ "q01": 1.5, "__probe__": 0.42, "s57": 2, "note": "ignored" }""", "t")
    assert(m === Map("q01" -> 1.5, "__probe__" -> 0.42, "s57" -> 2.0))
  }

  test("parseFlat FAILS LOUDLY on malformed JSON (gate must not disarm silently)") {
    val e = intercept[IllegalArgumentException] {
      BenchAudit.parseFlat("""{ "q01": 1.5, """, "t")
    }
    assert(e.getMessage.contains("not valid JSON"))
    val e2 = intercept[IllegalArgumentException] { BenchAudit.parseFlat("""[1,2]""", "t") }
    assert(e2.getMessage.contains("expected a JSON object"))
  }

  test("parseBenchFull reads nested queries + worse probe sample") {
    val (qs, probe) = BenchAudit.parseBenchFull(
      """{"metric":"total","value":3.0,"probe":{"start":0.4,"end":0.9},
         "queries":{"q01":1.0,"s57":2.0},"reps":{"q01":[0.9,1.0,1.2]}}""")
    assert(qs === Map("q01" -> 1.0, "s57" -> 2.0))
    assert(probe === Some(0.9))
  }

  test("parseBenchFull tolerates a pre-probe-era artifact (no probe field)") {
    val (qs, probe) = BenchAudit.parseBenchFull("""{"queries":{"q01":1.0}}""")
    assert(qs === Map("q01" -> 1.0) && probe.isEmpty)
  }

  test("parseBenchFull does NOT confuse per-rep arrays with medians") {
    // the old regex reader would have matched "q01" inside "reps" too
    val (qs, _) = BenchAudit.parseBenchFull(
      """{"queries":{"q01":1.0},"reps":{"q01":[9.0,9.0,9.0]}}""")
    assert(qs("q01") === 1.0)
  }

  test("Bench.loadVerdict: loaded box stamps true, quiet false, no baseline null") {
    assert(graft.Bench.loadVerdict(0.30, Some(0.18)) == "true")  // 1.67x
    assert(graft.Bench.loadVerdict(0.20, Some(0.18)) == "false")
    assert(graft.Bench.loadVerdict(0.20, None) == "null")
    assert(graft.Bench.loadVerdict(0.20, Some(0.0)) == "null") // degenerate base
  }
}
