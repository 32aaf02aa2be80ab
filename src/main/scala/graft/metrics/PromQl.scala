package graft.metrics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** PromQL-style query semantics over a sample stream — the query layer the
  * reference sits on top of (its pipeline consumes `query_range` pulls and
  * its outputs are scraped back into Prometheus; CHANGELOG.md:90,10).
  * Three canonical PromQL behaviors, as reusable DataFrame transforms:
  *
  *  - `counterIncrease` — `increase()`/`resets()`: per-series adjacent
  *    deltas where a value drop marks a counter reset and contributes the
  *    post-reset value (the Prometheus reset rule) instead of a negative.
  *  - `instantVector` — an instant query at evaluation time T: the latest
  *    sample per series within the staleness lookback window (T-lb, T].
  *  - `histogramQuantile` — `histogram_quantile(q, buckets)`: linear
  *    interpolation inside the first cumulative le-bucket whose count
  *    reaches q·total; the +Inf bucket clamps to the highest finite bound.
  *
  * All three are single-window / single-aggregation shapes: the series key
  * partitions every shuffle, so a 10k-series × month range query and a
  * 100 TB backfill run the same plan.
  */
object PromQl {

  /** Per-sample increase contributions with Prometheus counter-reset
    * handling. Input needs (series key cols, ts, orderCol, value); adds
    * `inc` (double, 0 for the first sample of a series), `reset` (1 when
    * the counter dropped). */
  def counterIncrease(samples: DataFrame, seriesKey: Seq[String],
                      tsCol: String, orderCol: String, valueCol: String): DataFrame = {
    val w = Window.partitionBy(seriesKey.map(PromQlParser.labelCol): _*)
      .orderBy(col(tsCol), col(orderCol))
    samples
      .withColumn("__prev", lag(col(valueCol), 1).over(w))
      .withColumn("__delta", col(valueCol) - col("__prev"))
      .withColumn("inc",
        when(col("__prev").isNull, lit(0.0))
          .when(col("__delta") < 0, col(valueCol)) // reset: count from zero
          .otherwise(col("__delta")))
      .withColumn("reset", when(col("__delta") < 0, 1).otherwise(0))
      .drop("__prev", "__delta")
  }

  /** Prometheus's EXACT boundary extrapolation — upstream
    * `extrapolatedRate` (promql/functions.go, 3.x), the semantics behind
    * real `rate()`/`increase()`/`delta()`: the raw last−first result
    * (reset-corrected via [[counterIncrease]] when `isCounter`) is scaled
    * from the sampled interval out toward the full window. Each edge
    * extrapolates the full distance to the boundary when the edge sample
    * sits within 1.1× the average sample spacing of it, else half the
    * average spacing; the counter face additionally clamps the start-side
    * extrapolation at the counter's zero crossing. This is the upstream
    * fidelity face of [[rate]]'s documented no-extrapolation baseline —
    * both are available, and q220 hash-proves this one against a SQL twin.
    *
    * `winSamples` must already be filtered to the (start, end] range
    * selection; `startUs`/`endUs` feed only the boundary math. Series
    * with fewer than 2 samples in the window yield no row (upstream
    * returns none). Determinism route: the result value is a DECIMAL sum
    * of 6-dp increments; the factor chain is written as the SAME ordered
    * double expression the DuckDB twin uses, so every step is the same
    * IEEE op in both engines.
    *
    * Scale shape: one keyed window (the [[counterIncrease]] lag) + one
    * keyed agg — per-series semantics, parallel across series, nothing
    * corpus-global. */
  def extrapolated(winSamples: DataFrame, seriesKey: Seq[String],
                   tsCol: String, orderCol: String, valueCol: String,
                   startUs: Long, endUs: Long,
                   isCounter: Boolean, isRate: Boolean): DataFrame = {
    val keyCols = seriesKey.map(PromQlParser.labelCol)
    val ord = struct(col(tsCol), col(orderCol))
    val tUs = expr(s"unix_micros($tsCol)")
    val withInc =
      if (isCounter)
        counterIncrease(winSamples, seriesKey, tsCol, orderCol, valueCol)
          .withColumn("__inc", round(col("inc"), 6).cast("decimal(18,6)"))
      else winSamples.withColumn("__inc",
        lit(0).cast("decimal(18,6)")) // gauge: last−first below
    val agg = withInc.groupBy(keyCols: _*)
      .agg(count(lit(1)).as("__n"),
        min(tUs).as("__first_us"), max(tUs).as("__last_us"),
        min_by(col(valueCol), ord).as("__first_v"),
        max_by(col(valueCol), ord).as("__last_v"),
        sum(col("__inc")).as("__res_dec"))
    val res =
      if (isCounter) col("__res_dec").cast("double")
      else col("__last_v") - col("__first_v")
    val firstV = col("__first_v")
    val sampled = (col("__last_us") - col("__first_us")).cast("double") / 1e6
    val avgDur = sampled / (col("__n") - 1).cast("double")
    val thr = avgDur * 1.1
    val ds0 = (col("__first_us") - lit(startUs)).cast("double") / 1e6
    val de0 = (lit(endUs) - col("__last_us")).cast("double") / 1e6
    val ds1 = when(ds0 >= thr, avgDur / 2).otherwise(ds0)
    val dz = sampled * (firstV / res)
    val ds =
      if (isCounter) when(res > 0 && firstV >= 0 && dz < ds1, dz).otherwise(ds1)
      else ds1
    val de = when(de0 >= thr, avgDur / 2).otherwise(de0)
    val factor0 = (sampled + ds + de) / sampled
    val factor =
      if (isRate) factor0 / lit((endUs - startUs) / 1e6) else factor0
    agg.filter(col("__n") >= 2)
      .select(keyCols :+ (res * factor).as("value") :+ col("__n").as("n"): _*)
  }

  /** PromQL `rate()`: the reset-aware increase over a trailing range
    * window, normalized per second. Per sample, the frame is the trailing
    * `windowSec` seconds ([t − windowSec + 1, t] on whole-second grain —
    * the (T−w, T] range-vector selection), and
    * `rate = sum(inc over frame) / windowSec`. Counter resets inside the
    * window contribute the post-reset value via [[counterIncrease]], which
    * is exactly Prometheus's reset rule applied per adjacent pair.
    *
    * Determinism: per-sample increases are rounded to 6 digits and summed
    * as DECIMAL inside the range frame (windowed decimal sums are exact and
    * association-free — a raw double moving-window sum would let the two
    * engines associate additions differently), leaving ONE double division
    * by the window length. Plan shape: one partition-by-series window with
    * a bounded range frame — no extra shuffle beyond counterIncrease's. */
  def rate(samples: DataFrame, seriesKey: Seq[String], tsCol: String,
           orderCol: String, valueCol: String, windowSec: Int): DataFrame = {
    val w = Window.partitionBy(seriesKey.map(PromQlParser.labelCol): _*)
      .orderBy(col(tsCol).cast("long"))
      .rangeBetween(-(windowSec - 1L), Window.currentRow)
    // rate_winsum (the EXACT decimal window sum) rides along so rollups
    // can aggregate decimals and divide ONCE at the end — re-rounding the
    // per-sample quotient invites round-half boundaries that the two
    // oracle engines resolve differently (observed once at sf0.1).
    counterIncrease(samples, seriesKey, tsCol, orderCol, valueCol)
      .withColumn("rate_winsum",
        sum(round(col("inc"), 6).cast("decimal(18,6)")).over(w))
      .withColumn("rate", col("rate_winsum").cast("double") / windowSec)
  }

  /** `*_over_time` aggregations over a trailing range window per series:
    * adds `sum_ot` (exact DECIMAL), `count_ot`, `avg_ot`, `max_ot`,
    * `min_ot` for the trailing `windowSec` seconds. The sum routes through
    * an exact windowed DECIMAL (same rationale as [[rate]]); max/min/count
    * are order-insensitive by nature. `avg_ot` is the one quotient
    * (sum_ot / count_ot, a single double division) — downstream rollups
    * that need cross-engine hash parity should aggregate `sum_ot` /
    * `count_ot` rather than re-round the quotient (rounding a quotient
    * whose divisor is 2^a·5^b can land exactly on a round-half boundary).
    * One window spec — all aggregates share the single series-keyed sort. */
  def overTime(samples: DataFrame, seriesKey: Seq[String], tsCol: String,
               valueCol: String, windowSec: Int): DataFrame = {
    val w = Window.partitionBy(seriesKey.map(PromQlParser.labelCol): _*)
      .orderBy(col(tsCol).cast("long"))
      .rangeBetween(-(windowSec - 1L), Window.currentRow)
    samples
      .withColumn("count_ot", count(lit(1)).over(w))
      .withColumn("sum_ot",
        sum(round(col(valueCol), 6).cast("decimal(18,6)")).over(w)
          .cast("decimal(18,6)"))
      .withColumn("avg_ot", col("sum_ot").cast("double") / col("count_ot"))
      .withColumn("max_ot", max(col(valueCol)).over(w))
      .withColumn("min_ot", min(col(valueCol)).over(w))
  }

  /** EXTENDED range selectors — Prometheus 3.5's experimental `anchored` /
    * `smoothed` range-selector modifiers
    * (`--enable-feature=promql-extended-range-selectors`), the upstream
    * answer to extrapolation guesswork: instead of scaling the sampled
    * interval outward ([[extrapolated]]), the window's BOUNDARY values are
    * made explicit from the samples straddling each boundary —
    *
    *  - `anchored`: the boundary value is the last sample AT OR BEFORE the
    *    boundary (zero-order hold). The left anchor may sit BEFORE the
    *    window (that is the point of the feature: a 1m window over 2m
    *    scrapes still covers the full range); a missing left anchor falls
    *    back to the first in-window sample, a window with no samples holds
    *    the left anchor flat (increase 0 — the stale-counter face).
    *  - `smoothed`: the boundary value is LINEARLY INTERPOLATED between
    *    the last sample ≤ boundary and the first sample > boundary; an
    *    absent side falls back to the present side's sample value (no
    *    extrapolation past the data).
    *
    * result = vEnd − vStart, rate divides by the FULL window once. Counter
    * semantics ride the [[counterIncrease]] reset chain: boundary values
    * live on the reset-adjusted cumulative scale (a DECIMAL prefix sum of
    * 6-dp increments — exact, association-free), so a reset between the
    * left anchor and the window contributes exactly the post-reset level,
    * and interpolation happens on the monotone scale, as upstream does.
    *
    * `samples` must already cover the EXTENDED fetch — (start − lookback,
    * end + lookahead] — so the range predicate rides the scan (pushdown).
    * Series yield a row when the window holds ≥ 1 sample AND a usable
    * left anchor exists (a pre sample, or a second in-window sample) —
    * the rule shared verbatim with the grid compiler's face.
    *
    * Scale shape: one series-keyed window (the inc chain + prefix sum) +
    * one keyed agg with conditional min_by/max_by — no self-joins, no
    * per-boundary passes; parallel across series. */
  def extendedRange(samples: DataFrame, seriesKey: Seq[String],
                    tsCol: String, orderCol: String, valueCol: String,
                    startUs: Long, endUs: Long, mode: String,
                    isCounter: Boolean, isRate: Boolean): DataFrame = {
    require(mode == "anchored" || mode == "smoothed", s"bad mode: $mode")
    val keyCols = seriesKey.map(PromQlParser.labelCol)
    val tagged = adjusted(samples, seriesKey, tsCol, orderCol, valueCol,
      isCounter)
      .withColumn("__reg",
        when(col("__t_us") <= startUs, "pre")
          .when(col("__t_us") <= endUs, "in").otherwise("post"))
    val ord = struct(col("__t_us"), col(orderCol))
    val pt = struct(col("__t_us").as("t"), col("__adj").as("v"))
    def only(reg: String, c: Column) = when(col("__reg") === reg, c)
    val agg = tagged.groupBy(keyCols: _*)
      .agg(sum(when(col("__reg") === "in", 1L).otherwise(0L)).as("n"),
        max_by(only("pre", pt), only("pre", ord)).as("__pre"),
        min_by(only("in", pt), only("in", ord)).as("__fin"),
        max_by(only("in", pt), only("in", ord)).as("__lin"),
        min_by(only("post", pt), only("post", ord)).as("__post"))
    // emission rule shared with the grid face: ≥1 in-window sample and
    // a usable left anchor (a pre sample, or a second in-window sample)
    agg.filter(col("n") >= 1 &&
        (col("__pre").isNotNull || col("n") >= 2))
      .withColumn("value", boundaryValue(mode, col("__pre"), col("__fin"),
        col("__lin"), col("__post"), lit(startUs), lit(endUs),
        if (isRate) Some((endUs - startUs) / 1e6) else None))
      .select(keyCols :+ col("value") :+ col("n"): _*)
  }

  /** Reset-adjusted 6-dp DECIMAL level per sample (`__adj`) + epoch-µs
    * (`__t_us`): the shared base of [[extendedRange]] and the grid
    * compiler's extended-selector face. Counters: a decimal prefix sum
    * of 6-dp increments over the fetch (exact, association-free);
    * gauges: the 6-dp value itself. DECIMAL (not double) on purpose —
    * boundary math works on decimal DIFFERENCES, so the arbitrary
    * prefix-sum base cancels EXACTLY and an instant eval equals a grid
    * step bit for bit even though their fetches start elsewhere. */
  private[metrics] def adjusted(samples: DataFrame, seriesKey: Seq[String],
                                tsCol: String, orderCol: String,
                                valueCol: String,
                                isCounter: Boolean): DataFrame = {
    val keyCols = seriesKey.map(PromQlParser.labelCol)
    val wCum = Window.partitionBy(keyCols: _*)
      .orderBy(col(tsCol), col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val based =
      if (isCounter)
        counterIncrease(samples, seriesKey, tsCol, orderCol, valueCol)
          .withColumn("__adj",
            sum(round(col("inc"), 6).cast("decimal(18,6)")).over(wCum)
              .cast("decimal(18,6)"))
      else samples.withColumn("__adj",
        round(col(valueCol), 6).cast("decimal(18,6)"))
    based.withColumn("__t_us", expr(s"unix_micros($tsCol)"))
  }

  /** The extended-selector boundary math over (t, DECIMAL adj) anchor
    * structs — shared verbatim by instant and grid faces:
    *
    *  - anchored: vEnd − vStart = lin − (pre | fin), one exact decimal
    *    difference cast to double;
    *  - smoothed: (lin − pre) − (fin − pre)·r₁ + (post − lin)·r₂, where
    *    r = the boundary's position inside its straddling pair — decimal
    *    differences go double only at the multiply. A missing pre makes
    *    the start boundary the first in-window sample; a missing post
    *    (the at-the-head case, and every instant eval) makes the end
    *    boundary the last in-window sample.
    *
    * `rateDenom` divides once at the end (rate), None for increase/delta. */
  private[metrics] def boundaryValue(mode: String, pre: Column, fin: Column,
                                     lin: Column, post: Column,
                                     startUs: Column, endUs: Column,
                                     rateDenom: Option[Double]): Column = {
    def d(a: Column, b: Column): Column =
      (a.getField("v") - b.getField("v")).cast("double")
    def ratio(b: Column, le: Column, gt: Column): Column =
      (b - le.getField("t")).cast("double") /
        (gt.getField("t") - le.getField("t")).cast("double")
    val res =
      if (mode == "anchored") when(pre.isNull, d(lin, fin))
        .otherwise(d(lin, pre))
      else {
        val base = when(pre.isNull, d(lin, fin))
          .otherwise(d(lin, pre) - d(fin, pre) * ratio(startUs, pre, fin))
        val endCorr = when(post.isNull, lit(0.0))
          .otherwise(d(post, lin) * ratio(endUs, lin, post))
        base + endCorr
      }
    rateDenom.map(w => res / lit(w)).getOrElse(res)
  }

  /** PromQL `topk(k, v by (group))`: the k largest-valued series of an
    * instant vector within each group, rank attached. Ties break on
    * `tieCols` so the selection is total-ordered and oracle-checkable.
    *
    * The global form (empty `groupKey`) goes through sort+limit, which
    * Spark compiles to TakeOrderedAndProject — per-partition top-k merged
    * at the driver — instead of a single-partition window that would pull
    * every series into one task; only the k survivors are then ranked. */
  def topk(vector: DataFrame, k: Int, groupKey: Seq[String],
           valueCol: String, tieCols: Seq[String],
           asc: Boolean = false): DataFrame = {
    val vOrd = if (asc) col(valueCol).asc else col(valueCol).desc
    val ord = vOrd +: tieCols.map(col(_).asc)
    if (groupKey.isEmpty) {
      val w = Window.orderBy(ord: _*)
      vector.orderBy(ord: _*).limit(k)
        .withColumn("rank", row_number().over(w).cast("long"))
    } else {
      val w = Window.partitionBy(groupKey.map(col): _*).orderBy(ord: _*)
      vector.withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= k)
    }
  }

  /** Instant query: latest sample per series with ts in (T - lookback, T].
    * Series with no sample inside the lookback are stale and drop out —
    * exactly Prometheus staleness semantics. */
  def instantVector(samples: DataFrame, seriesKey: Seq[String],
                    tsCol: String, orderCol: String,
                    evalTs: String, lookback: String): DataFrame = {
    // backtick-quoted: series labels may be UTF-8 (dotted) names, 3.x
    val w = Window.partitionBy(seriesKey.map(n => col(s"`$n`")): _*)
      .orderBy(col(tsCol).desc, col(orderCol).desc)
    samples
      .filter(col(tsCol) <= to_timestamp(lit(evalTs)) &&
        col(tsCol) > to_timestamp(lit(evalTs)) - expr(s"INTERVAL $lookback"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** `histogram_quantile(q, ...)` from raw samples: bucket by the finite
    * `bounds` (+Inf implicit), accumulate per-group cumulative counts, and
    * interpolate inside the target bucket. `quantiles` become one output
    * row per (group, q). Determinism: the rank `q·total` is computed in
    * DECIMAL (exact — q has 4 digits, counts are integers), as is the
    * numerator `(rank − prevCum)·(hi − lo)`; only ONE double division (by
    * the bucket count) and one addition remain, a fixed shape both engines
    * evaluate identically. A pure-double rank was observed to land 1 ulp
    * apart across engines exactly on a round-6 half boundary.
    *
    * Precision contract: bucket bounds are carried at decimal scale 8 —
    * bounds with more than 8 fractional digits are rounded in the
    * interpolation width; totals must stay below 10^14 (rank is
    * decimal(18,4)). Both are far beyond any real le-bucket layout. */
  /** `histogram_quantile(q, buckets)` over an `le`-LABELED VECTOR — the
    * form the PromQL parser feeds: one row per (labels, le) carrying the
    * CUMULATIVE bucket count/rate in `value` (the Prometheus bucket data
    * model; `le` is a string, `"+Inf"` for the top bucket). Groups by
    * every non-le label column, interpolates linearly inside the first
    * bucket whose cumulative value reaches q·total, and clamps the +Inf
    * bucket to the highest finite bound — the same semantics as
    * [[histogramQuantile]], which buckets raw samples itself.
    *
    * Determinism contract (mirrors [[histogramQuantile]]): cumulative
    * values round-6 to DECIMAL, rank = q·total in DECIMAL, the
    * interpolation numerator in DECIMAL (width at scale 8), ONE double
    * division by the bucket's own count. Plan shape: two windows and a
    * filter, all partitioned by the label columns — no shuffle beyond the
    * grouping the child vector already has. */
  def histogramQuantileVector(buckets: DataFrame, q: Double): DataFrame = {
    val groupCols = buckets.columns
      .filterNot(c => c == "le" || c == "value" || c == "rank").toSeq
    val gcols = groupCols.map(col)
    val wOrd = Window.partitionBy(gcols: _*).orderBy(col("__le"))
    val wAll = Window.partitionBy(gcols: _*)
    val zeroDec = lit(0).cast("decimal(18,6)")
    val d = buckets
      .withColumn("__le",
        when(col("le") === "+Inf", lit(Double.PositiveInfinity))
          .otherwise(col("le").cast("double")))
      .withColumn("__cum", round(col("value"), 6).cast("decimal(18,6)"))
      .withColumn("__prev_cum", lag(col("__cum"), 1).over(wOrd))
      .withColumn("__lo", lag(col("__le"), 1).over(wOrd)) // null = first bucket, lower edge 0
      .withColumn("__total", max(col("__cum")).over(wAll)) // cumulative ⇒ max = +Inf bucket
      .withColumn("__rank",
        (lit(q).cast("decimal(6,4)") * col("__total")).cast("decimal(24,10)"))
    d.filter(col("__cum") >= col("__rank"))
      .withColumn("__rn", row_number().over(wOrd))
      .filter(col("__rn") === 1)
      .withColumn("value",
        when(col("__le") === lit(Double.PositiveInfinity), col("__lo"))
          .otherwise(coalesce(col("__lo"), lit(0.0)) +
            // rank-diff pinned at decimal(18,10): exact for totals < 10^8,
            // and keeps the product — (18,10) × (15,8) = decimal(34,18) —
            // inside precision 38 in BOTH engines (DuckDB mirrors this
            // cast), so neither silently rounds it.
            ((col("__rank") - coalesce(col("__prev_cum"), zeroDec)).cast("decimal(18,10)") *
              (col("__le") - coalesce(col("__lo"), lit(0.0))).cast("decimal(15,8)"))
              .cast("double") /
            (col("__cum") - coalesce(col("__prev_cum"), zeroDec)).cast("double")))
      .select(gcols :+ col("value"): _*)
  }

  def histogramQuantile(samples: DataFrame, groupKey: Seq[String],
                        valueCol: String, bounds: Seq[Double],
                        quantiles: Seq[Double]): DataFrame = {
    val gcols = groupKey.map(col)
    // bucket index: first bound >= value; bounds.size = +Inf bucket
    val idx = bounds.zipWithIndex.foldRight(lit(bounds.size)) {
      case ((b, i), els) => when(col(valueCol) <= b, i).otherwise(els)
    }
    val counts = samples.withColumn("__b", idx)
      .groupBy(gcols :+ col("__b"): _*).agg(count(lit(1)).as("__cnt"))
    val wCum = Window.partitionBy(gcols: _*).orderBy(col("__b"))
    val wAll = Window.partitionBy(gcols: _*)
    val cum = counts
      .withColumn("__cum", sum(col("__cnt")).over(wCum))
      .withColumn("__total", sum(col("__cnt")).over(wAll))
    val qDf = cum.sparkSession.createDataFrame(
      quantiles.map(Tuple1.apply)).toDF("q")
    // per (group, q): the first bucket whose cumulative count reaches rank
    val wPick = Window.partitionBy(gcols :+ col("q"): _*).orderBy(col("__b"))
    val lo = bounds.zipWithIndex.foldRight(lit(0.0)) {
      case ((b, i), els) => when(col("__b") === i + 1, b).otherwise(els)
    } // lower edge of bucket __b (bucket 0 starts at 0)
    val hi = bounds.zipWithIndex.foldRight(lit(bounds.last)) {
      case ((b, i), els) => when(col("__b") === i, b).otherwise(els)
    } // +Inf bucket clamps to highest finite bound
    cum.join(broadcast(qDf))
      // rank pinned at decimal(18,4): exact for totals < 10^14, and keeps
      // the product below — (18,4)-diff × (15,8)-width = decimal(34,12) —
      // inside precision 38, so Spark never silently rounds it. Width at
      // scale 8 represents real le-bounds (0.05, 0.25, …) exactly; a
      // narrower (10,1) cast was rounding sub-0.1 widths and skewing the
      // interpolation up to 2×. Precision contract (scaladoc'd): bounds
      // with > 8 fractional digits would be rounded here.
      .withColumn("__rank",
        (col("q").cast("decimal(6,4)") * col("__total")).cast("decimal(18,4)"))
      .filter(col("__cum") >= col("__rank"))
      .withColumn("__rn", row_number().over(wPick))
      .filter(col("__rn") === 1)
      .withColumn("quantile_value",
        when(col("__b") === bounds.size, lit(bounds.last))
          .otherwise(lo +
            ((col("__rank") - (col("__cum") - col("__cnt"))) *
              (hi - lo).cast("decimal(15,8)")).cast("double") / col("__cnt")))
      .select(gcols ++ Seq(col("q"), col("quantile_value")): _*)
  }
}
