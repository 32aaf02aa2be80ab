package graft.metrics

import org.scalatest.funsuite.AnyFunSuite

/** rule_files loader (the declarative config face of q135/q136/q239/q253):
  * verbatim upstream-format YAML lands in the existing AlertRules.Rule /
  * RuleGroup.Rule structures; promtool strictness throws on every
  * malformation class. */
class RuleFilesSpec extends AnyFunSuite {
  import RuleFiles._

  // Shaped after the prometheus.io alerting/recording docs examples.
  val upstream: String =
    """# the example from the Prometheus docs, verbatim structure
      |groups:
      |  - name: example-record
      |    interval: 30s
      |    rules:
      |      - record: job:http_requests:rate5m
      |        expr: sum by (job) (rate(http_requests_total[5m]))
      |        labels:
      |          team: ops
      |  - name: example-alert
      |    rules:
      |      - alert: HighRequestLatency
      |        expr: job:request_latency_seconds:mean5m{job="myjob"} > 0.5
      |        for: 10m
      |        keep_firing_for: 5m
      |        labels:
      |          severity: page
      |        annotations:
      |          summary: "High request latency on {{ $labels.job }}"
      |          description: |
      |            latency is above 500ms
      |            (current value: {{ $value }}s)
      |      - alert: InstanceDown
      |        expr: up == 0
      |        for: 5m
      |""".stripMargin

  test("verbatim upstream rule file parses into the existing structures") {
    val groups = load(upstream)
    assert(groups.map(_.name) == Seq("example-record", "example-alert"))

    val rec = groups.head
    assert(rec.intervalSec.contains(30L))
    assert(rec.recordingRules == Seq(
      RuleGroup.Rule("job:http_requests:rate5m",
        "sum by (job) (rate(http_requests_total[5m]))")))
    assert(rec.rules.head.labels == Map("team" -> "ops"))
    assert(rec.alertRules.isEmpty)

    val al = groups(1)
    assert(al.intervalSec.isEmpty) // global default
    assert(al.alertRules == Seq(
      AlertRules.Rule("HighRequestLatency",
        """job:request_latency_seconds:mean5m{job="myjob"} > 0.5""",
        600L, 300L),
      AlertRules.Rule("InstanceDown", "up == 0", 300L, 0L)))
    val hrl = al.rules.head
    assert(hrl.labels == Map("severity" -> "page"))
    assert(hrl.annotations("summary") == "High request latency on {{ $labels.job }}")
    // literal block scalar preserves the line break
    assert(hrl.annotations("description") ==
      "latency is above 500ms\n(current value: {{ $value }}s)")
  }

  test("durations: the model.Duration grammar") {
    assert(parseDuration("0") == 0L)
    assert(parseDuration("90s") == 90L)
    assert(parseDuration("1h30m") == 5400L)
    assert(parseDuration("2d4h") == 2 * 86400L + 4 * 3600L)
    assert(parseDuration("1w") == 604800L)
    assert(parseDuration("1y") == 31536000L)
    assert(parseDuration("2000ms") == 2L)
    intercept[IllegalArgumentException](parseDuration("5"))      // bare number
    intercept[IllegalArgumentException](parseDuration("30m1h"))  // unit order
    intercept[IllegalArgumentException](parseDuration("1h1h"))   // repeat
    intercept[IllegalArgumentException](parseDuration("500ms"))  // sub-second
    intercept[IllegalArgumentException](parseDuration("-5m"))
  }

  test("promtool strictness: every malformation class throws") {
    def bad(y: String): Unit =
      intercept[IllegalArgumentException](load(y))
    // unknown top-level / group / rule field
    bad("grups:\n  - name: x\n")
    bad("groups:\n  - name: x\n    foo: 1\n    rules:\n      - record: r\n        expr: up\n")
    bad("groups:\n  - name: x\n    rules:\n      - record: r\n        expr: up\n        what: 1\n")
    // both record and alert / neither
    bad("groups:\n  - name: x\n    rules:\n      - record: r\n        alert: a\n        expr: up\n")
    bad("groups:\n  - name: x\n    rules:\n      - expr: up\n")
    // recording rule with for / annotations; invalid record name
    bad("groups:\n  - name: x\n    rules:\n      - record: r\n        expr: up\n        for: 5m\n")
    bad("groups:\n  - name: x\n    rules:\n      - record: r\n        expr: up\n        annotations:\n          a: b\n")
    bad("groups:\n  - name: x\n    rules:\n      - record: 5bad\n        expr: up\n")
    // expr must parse as PromQL
    bad("groups:\n  - name: x\n    rules:\n      - record: r\n        expr: rate(\n")
    // duplicate group names, duplicate keys, tab indentation
    bad("groups:\n  - name: x\n    rules:\n      - record: r\n        expr: up\n  - name: x\n    rules:\n      - record: r2\n        expr: up\n")
    bad("groups:\n  - name: x\n    name: y\n    rules:\n      - record: r\n        expr: up\n")
    bad("groups:\n\t- name: x\n")
    // missing expr / missing name / groups not a list
    bad("groups:\n  - name: x\n    rules:\n      - alert: a\n")
    bad("groups:\n  - interval: 5m\n    rules:\n      - record: r\n        expr: up\n")
    bad("groups: up\n")
  }

  test("scalar forms: quotes, escapes, comments, folded blocks") {
    val g = load(
      """groups:
        |  - name: scalars
        |    rules:
        |      - alert: 'It''s fine'   # trailing comment
        |        expr: up == 0
        |        annotations:
        |          a: "line\nbreak \"quoted\""
        |          b: >
        |            folded onto
        |            one line
        |""".stripMargin)
    val r = g.head.rules.head
    assert(r.alert.contains("It's fine"))
    assert(r.annotations("a") == "line\nbreak \"quoted\"")
    assert(r.annotations("b") == "folded onto one line")
  }

  test("loaded groups evaluate through the existing engine unchanged") {
    // The q253-style two-rule group, but sourced from YAML: loading must
    // produce rules that evaluate IDENTICALLY to the structure-built twin.
    val yaml =
      """groups:
        |  - name: cycles
        |    interval: 1m
        |    rules:
        |      - record: "purchase:lag"
        |        expr: '{event_type="purchase:tot"}'
        |      - record: "purchase:tot"
        |        expr: 'sum(sum_over_time({event_type="purchase"}[90m]))'
        |""".stripMargin
    val fromYaml = load(yaml).head.recordingRules
    val handBuilt = Seq(
      RuleGroup.Rule("purchase:lag", """{event_type="purchase:tot"}"""),
      RuleGroup.Rule("purchase:tot",
        """sum(sum_over_time({event_type="purchase"}[90m]))"""))
    assert(fromYaml == handBuilt)
    // and the dependency batcher sees the same structure
    assert(RuleGroup.batches(fromYaml, "event_type") ==
      RuleGroup.batches(handBuilt, "event_type"))
  }
}
