package graft.metrics

import org.scalatest.funsuite.AnyFunSuite

/** Exposition parser vs the 0.0.4 grammar: special values, label
  * escaping, comment/blank filtering, optional timestamps, and the
  * render→parse round trip against this repo's own writer. */
class ExpositionSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  private def parse(lines: String*) =
    Exposition.parseSamples(lines.toDF("line"), "line").collect()

  test("value grammar: +Inf/-Inf/NaN, exponents, optional ms timestamp") {
    val rows = parse(
      """up{job="api"} 1 1700000000123""",
      """temp -2.5e3""",
      """ratio{q="0.99"} +Inf""",
      """drop NaN""",
      """neg -Inf""")
    val byName = rows.map(r => r.getString(0) -> r).toMap
    assert(byName("up").getDouble(2) == 1.0 &&
      byName("up").getLong(3) == 1700000000123L)
    assert(byName("temp").getDouble(2) == -2500.0 &&
      byName("temp").isNullAt(3))
    assert(byName("ratio").getDouble(2).isPosInfinity)
    assert(byName("drop").getDouble(2).isNaN)
    assert(byName("neg").getDouble(2).isNegInfinity)
  }

  test("labels: multiple pairs, escaped quote/newline/backslash") {
    val rows = parse(
      "m{a=\"x\",b=\"y z\"} 2",
      "esc{p=\"l1\\nl2\",q=\"say \\\"hi\\\"\",r=\"c:\\\\tmp\"} 3")
    val m = rows.find(_.getString(0) == "m").get.getMap[String, String](1)
    assert(m("a") == "x" && m("b") == "y z")
    val e = rows.find(_.getString(0) == "esc").get.getMap[String, String](1)
    assert(e("p") == "l1\nl2" && e("q") == "say \"hi\"" && e("r") == "c:\\tmp")
  }

  test("comments and blanks drop; malformed lines keep a null name") {
    val rows = parse(
      "# HELP up is up",
      "# TYPE up gauge",
      "   ",
      "up 1",
      "!bad line!")
    assert(rows.length == 2)
    assert(rows.count(_.isNullAt(0)) == 1) // the malformed line
    assert(rows.exists(r => !r.isNullAt(0) && r.getString(0) == "up"))
  }

  test("round trip: /federate output parses back to the served samples") {
    val df = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:04:00"), 1L, "cpu", 9.5),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 10:03:00"), 2L, "cpu", 3.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val src = PromQlParser.PromSource(df, "event_type",
      Seq("user_id", "event_type"), "ts", "event_id", "value")
    Observed.use(spark) { obs =>
      val srv = new MetricsServer(obs, promSource = Some(src))
      try {
        val url = new java.net.URI(
          s"http://127.0.0.1:${srv.boundPort}/federate?match%5B%5D=cpu&time=2024-01-01T10:05:00Z").toURL
        val txt = scala.io.Source.fromInputStream(url.openStream()).mkString
        val back = Exposition.parseSamples(
          txt.split("\n").toSeq.toDF("line"), "line").collect()
          .filter(!_.isNullAt(0))
        assert(back.length == 2)
        val vals = back.map(r =>
          r.getMap[String, String](1)("user_id") -> r.getDouble(2)).toMap
        assert(vals == Map("1" -> 9.5, "2" -> 3.0))
        // original sample timestamps survive the trip (ms precision)
        assert(back.map(_.getLong(3)).toSet ==
          Set(java.sql.Timestamp.valueOf("2024-01-01 10:04:00").getTime,
            java.sql.Timestamp.valueOf("2024-01-01 10:03:00").getTime))
      } finally srv.close()
    }
  }
}
