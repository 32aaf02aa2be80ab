package graft.metrics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The promtool `test rules` harness surface: expanding the upstream
  * series NOTATION into a sample frame, and the two staleness-marker
  * behaviors PromQL evaluation needs over it.
  *
  * Notation (the `input_series.values` grammar of `promtool test
  * rules`): space-separated tokens, each filling one or more interval
  * slots —
  *   - `N` / `N.M` / `-N`    one sample with that value
  *   - `a+bxN` / `a-bxN`     a, a±b, a±2b, …, a±Nb  (N+1 samples)
  *   - `axN`                 a repeated N+1 times (shorthand, b = 0)
  *   - `_`                   no sample in this slot (a scrape gap)
  *   - `stale`               a STALENESS MARKER sample
  * Slot i sits at `base + i·interval`.
  *
  * Staleness (Prometheus staleness handling): a marker is a real sample
  * for INSTANT selection — if it is the newest in-lookback sample the
  * series is ABSENT at that instant (the marker kills LOCF; a later
  * real sample revives the series) — but range selection never sees
  * markers at all (range vectors skip stale samples).
  *
  * Scale note: the spec list is configuration-sized BY NATURE (promtool
  * inputs are hand-written test fixtures), so building a literal frame
  * from it is the same adjudicated class as the streaming replay
  * harness; the expansion itself is `explode(sequence(…))` column math
  * — no driver-side sample loop — and everything downstream is ordinary
  * keyed evaluation. */
object PromTest {

  /** One expansion group: `count` samples starting at slot `slot0`,
    * value `start + i·inc` (NaN start marks a stale marker group). */
  final case class Group(slot0: Long, start: Double, inc: Double,
                         count: Long, stale: Boolean)

  final case class SeriesSpec(metric: String, labels: Map[String, String],
                              groups: Seq[Group])

  private val SelRe = """([A-Za-z_:][A-Za-z0-9_:]*)?(?:\{([^}]*)\})?""".r
  private val LblRe = """\s*([A-Za-z_][A-Za-z0-9_]*)\s*=\s*"([^"]*)"\s*""".r
  private val XRe = """(-?\d+(?:\.\d+)?)([+-]\d+(?:\.\d+)?)?x(\d+)""".r

  /** Parse `up{job="prometheus"}` + `0 1+1x3 _ stale 7x2` into a spec. */
  def parseSeries(series: String, values: String): SeriesSpec = {
    val (metric, lblStr) = series.trim match {
      case SelRe(m, l) => (Option(m).getOrElse(""), Option(l).getOrElse(""))
      case other => throw new IllegalArgumentException(s"bad series: $other")
    }
    val labels = lblStr.split(',').filter(_.trim.nonEmpty).map {
      case LblRe(k, v) => k -> v
      case other => throw new IllegalArgumentException(s"bad label: $other")
    }.toMap
    var slot = 0L
    val groups = Seq.newBuilder[Group]
    for (tok <- values.trim.split("\\s+") if tok.nonEmpty) tok match {
      case "_" => slot += 1
      case "stale" =>
        groups += Group(slot, Double.NaN, 0, 1, stale = true); slot += 1
      case XRe(a, b, n) =>
        val cnt = n.toLong + 1
        groups += Group(slot, a.toDouble,
          Option(b).map(_.toDouble).getOrElse(0.0), cnt, stale = false)
        slot += cnt
      case num =>
        groups += Group(slot, num.toDouble, 0, 1, stale = false); slot += 1
    }
    SeriesSpec(metric, labels, groups.result())
  }

  /** Expand specs into a sample frame: `metric`, one column per label in
    * `labelCols` (null where a series lacks it), `ts` (timestamp),
    * `order` (global slot index), `value`, `stale`. Values come out of
    * one `explode(sequence)` projection — exact for the integral-step
    * fixtures promtool tests use. */
  def expand(spark: SparkSession, specs: Seq[(String, String)],
             labelCols: Seq[String], baseTs: String,
             intervalSec: Long): DataFrame = {
    val parsed = specs.map { case (s, v) => parseSeries(s, v) }
    val rows = parsed.flatMap { sp =>
      sp.groups.map(g => (sp.metric,
        labelCols.map(sp.labels.get),
        g.slot0, g.start, g.inc, g.count, g.stale))
    }
    val baseSec = java.time.LocalDateTime.parse(baseTs.replace(' ', 'T'))
      .toEpochSecond(java.time.ZoneOffset.UTC)
    import spark.implicits._
    val df = rows.toDF("metric", "__lbls", "slot0", "start", "inc", "cnt",
      "stale")
    df.select(
        col("metric") +: labelCols.zipWithIndex.map { case (l, i) =>
          col("__lbls").getItem(i).as(l)
        } :+ col("slot0") :+ col("start") :+ col("inc") :+ col("cnt") :+
          col("stale"): _*)
      .withColumn("__i", explode(sequence(lit(0L), col("cnt") - 1)))
      .select(
        (col("metric") +: labelCols.map(col)) ++ Seq(
          timestamp_micros((lit(baseSec) + (col("slot0") + col("__i")) *
            lit(intervalSec)) * 1000000L).as("ts"),
          (col("slot0") + col("__i")).as("order"),
          (col("start") + col("__i") * col("inc")).as("value"),
          col("stale")): _*)
  }

  /** Stale-aware instant vector at `evalTs`: newest in-lookback sample
    * per series by (ts, order); a winning MARKER removes the series (a
    * marker is newer than the last real sample until the next real
    * sample arrives — the LOCF-kill rule). One keyed max_by, map-side
    * partial. */
  def instantVector(df: DataFrame, seriesKey: Seq[String], evalTs: String,
                    lookback: String = "5 MINUTES"): DataFrame = {
    val t = lit(evalTs).cast("timestamp")
    df.filter(col("ts") <= t && col("ts") > t - expr(s"INTERVAL $lookback"))
      .groupBy(seriesKey.map(PromQlParser.labelCol): _*)
      .agg(max_by(struct(col("value"), col("stale")),
        struct(col("ts"), col("order"))).as("__s"))
      .filter(!col("__s.stale"))
      .select(seriesKey.map(PromQlParser.labelCol) :+ col("__s.value").as("value"): _*)
  }

  /** Range-selection view: markers are invisible to range vectors. */
  def rangeSamples(df: DataFrame): DataFrame = df.filter(!col("stale"))
}
