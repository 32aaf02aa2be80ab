package graft.metrics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Prometheus text-exposition PARSER — the scrape-ingest inverse of
  * [[MetricsServer.render]]/`/federate`: sample lines
  *
  *   `name{label="value",...} value [timestamp-ms]`
  *
  * parse into (name, labels map, value, ts_ms) with pure column regexes
  * (codegen'd, no UDFs) — a 100 TB scrape archive parses map-side at
  * scan speed. Comment (`# HELP/TYPE`) and blank lines drop; `+Inf`,
  * `-Inf` and `NaN` parse to their IEEE values (the exposition 0.0.4
  * value grammar); label values unescape `\\n`, `\\"`, `\\\\` (the only
  * escapes the format defines — applied longest-first, exact for any
  * renderer that escapes on write, including this repo's).
  */
object Exposition {

  private val linePat =
    "^([a-zA-Z_:][a-zA-Z0-9_:]*)(?:\\{(.*)\\})?\\s+(\\S+)(?:\\s+(-?[0-9]+))?$"
  private val pairPat = "([a-zA-Z_][a-zA-Z0-9_]*)=\"((?:[^\"\\\\]|\\\\.)*)\""

  private def unescape(v: Column): Column =
    // \\ must resolve LAST or it would re-introduce escape heads
    regexp_replace(
      regexp_replace(
        regexp_replace(v, "\\\\n", "\n"),
        "\\\\\"", "\""),
      "\\\\\\\\", "\\\\")

  private def parseValue(s: Column): Column =
    when(s === "+Inf", lit(Double.PositiveInfinity))
      .when(s === "-Inf", lit(Double.NegativeInfinity))
      // try_cast: a malformed value token is a scrape error (null), not an
      // ANSI runtime failure; handles NaN and decimal/exponent forms
      .otherwise(s.try_cast("double"))

  // ---------- OpenMetrics 1.0 (the 3.x scrape-preferred format) -------

  /** OpenMetrics sample grammar: like 0.0.4 but timestamps are FLOAT
    * SECONDS (not integer ms) and a sample may carry an EXEMPLAR after
    * ` # `: `name{labels} value [ts] # {exemplar-labels} exvalue [exts]`.
    * The label body is matched lazily so it cannot swallow the exemplar
    * braces; `# EOF` / `# TYPE` / `# HELP`/`# UNIT` comment lines drop
    * like any comment. */
  private val omPat =
    "^([a-zA-Z_:][a-zA-Z0-9_:]*)(?:\\{(.*?)\\})?\\s+(\\S+)" +
      "(?:\\s+(-?[0-9.eE+]+))?" +
      "(?:\\s+#\\s+\\{(.*)\\}\\s+(\\S+)(?:\\s+(-?[0-9.eE+]+))?)?$"

  /** Parse OpenMetrics lines into `(name, labels, value, ts_sec,
    * ex_labels, ex_value, ex_ts_sec)` — exemplar columns null when the
    * sample carries none. Pure column regexes, zero UDFs, map-side. */
  def parseOpenMetrics(df: DataFrame, lineCol: String): DataFrame = {
    val line = trim(col(lineCol))
    def grp(i: Int) = regexp_extract(line, omPat, i)
    def pairsOf(body: Column) = map_from_entries(transform(
      regexp_extract_all(body, lit(pairPat), lit(0)), p => struct(
        regexp_extract(p, pairPat, 1).as("k"),
        unescape(regexp_extract(p, pairPat, 2)).as("v"))))
    df.filter(!line.startsWith(lit("#")) && line =!= "")
      .select(
        when(grp(1) =!= "", grp(1)).as("name"),
        pairsOf(grp(2)).as("labels"),
        parseValue(grp(3)).as("value"),
        when(grp(4) =!= "", grp(4).try_cast("double")).as("ts_sec"),
        when(grp(5) =!= "", pairsOf(grp(5))).as("ex_labels"),
        when(grp(6) =!= "", parseValue(grp(6))).as("ex_value"),
        when(grp(7) =!= "", grp(7).try_cast("double")).as("ex_ts_sec"))
  }

  /** Parse a frame of exposition lines; malformed non-comment lines keep
    * a null name (callers can count them as scrape errors). */
  def parseSamples(df: DataFrame, lineCol: String): DataFrame = {
    val line = trim(col(lineCol))
    val pairs = regexp_extract_all(
      regexp_extract(line, linePat, 2), lit(pairPat), lit(0))
    df.filter(!line.startsWith(lit("#")) && line =!= "")
      .select(
        when(regexp_extract(line, linePat, 1) =!= "",
          regexp_extract(line, linePat, 1)).as("name"),
        map_from_entries(transform(pairs, p => struct(
          regexp_extract(p, pairPat, 1).as("k"),
          unescape(regexp_extract(p, pairPat, 2)).as("v")))).as("labels"),
        parseValue(regexp_extract(line, linePat, 3)).as("value"),
        when(regexp_extract(line, linePat, 4) =!= "",
          regexp_extract(line, linePat, 4).cast("long")).as("ts_ms"))
  }
}
