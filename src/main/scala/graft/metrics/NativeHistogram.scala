package graft.metrics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Prometheus NATIVE histograms (sparse exponential-bucket histograms,
  * stable since Prometheus 3.x) as a first-class columnar type. The
  * reference's histogram face is the classic le-bucket kind
  * (`metrics/_metrics.py:71` exposes `Histogram`); native histograms are
  * the successor representation its Prometheus backend serves, so the
  * engine ships the full native pipeline: BUILD (samples → sparse
  * buckets), MERGE (the `sum()` aggregation over histograms), and the
  * ANALYZE battery (`histogram_count/sum/avg/stddev/stdvar/quantile/
  * fraction`).
  *
  * Representation: one row per (group key) holding
  * `(schema INT, count DOUBLE, sum DOUBLE, zero_count DOUBLE,
  *   pos ARRAY<STRUCT<idx INT, cnt DOUBLE>>, neg ...)` — the sparse
  * two-sided bucket layout. With schema s the bucket base is
  * b = 2^(2^-s); positive bucket i covers (b^(i-1), b^i], negative
  * bucket i covers [-b^i, -b^(i-1)), and values with |v| ≤ zeroThreshold
  * land in the zero bucket. `idx = ⌈2^s · log2(|v|)⌉` — computed with a
  * 9-dp pre-round so a libm last-ulp wobble at an exact power boundary
  * can never flip a bucket differently in two engines (the same
  * boundary-safety rule the trig battery uses).
  *
  * Scale notes: BUILD is two keyed partial-aggregations (per-bucket
  * count, then per-group assembly); bucket arrays are bounded by the
  * value range (≤ 2^s·log2(max/min) entries — ~64 for schema 2 over six
  * decades), so `collect_list` here is model-sized, not data-sized.
  * MERGE is explode → keyed re-count → assembly, shuffling only bucket
  * rows (|groups|·|buckets|, not samples). The ANALYZE functions are
  * pure higher-order-function column expressions over the struct — no
  * UDFs, no shuffles, whole-stage codegen throughout.
  */
object NativeHistogram {

  /** Exponential bucket index of a POSITIVE value at the given schema:
    * the smallest i with v ≤ (2^(2^-s))^i. The 9-dp pre-round keeps the
    * two engines' log2 agreeing at representable boundary values. */
  def bucketIdx(v: Column, schema: Int): Column =
    ceil(round(log2(v) * (1 << schema), 9)).cast("int")

  private def bucketStruct(idx: Column, cnt: Column) =
    struct(idx.as("idx"), cnt.as("cnt"))

  /** Stage 1 of the build: per-(group ∪ sign ∪ bucket) counts + value
    * sums. This is the ONE-aggregation shape a Structured Streaming query
    * can emit directly (chained aggregations are not allowed in a
    * streaming plan) — the streaming pre-aggregation runs this keyed by
    * an event-time window, and [[assemble]] compacts the committed bucket
    * rows into histograms on the batch side. */
  def bucketCounts(df: DataFrame, groupCols: Seq[Column], valueCol: String,
                   schema: Int, zeroThreshold: Double = 0.0): DataFrame = {
    val v = col(valueCol)
    df.withColumn("__sign",
        when(v > zeroThreshold, 1).when(v < -zeroThreshold, -1).otherwise(0))
      .withColumn("__idx",
        when(col("__sign") === 0, lit(null).cast("int"))
          .otherwise(bucketIdx(abs(v), schema)))
      .groupBy((groupCols :+ col("__sign") :+ col("__idx")): _*)
      .agg(count(lit(1)).cast("double").as("__cnt"), sum(v).as("__sum"))
  }

  /** Stage 2: one bounded assembly per group over stage-1 bucket rows
    * (collect_list drops the other-sign NULLs). */
  def assemble(perBucket: DataFrame, groupCols: Seq[String],
               schema: Int): DataFrame =
    perBucket.groupBy(groupCols.map(col): _*)
      .agg(
        max(lit(schema)).as("schema"),
        sum(col("__cnt")).as("count"),
        sum(col("__sum")).as("sum"),
        coalesce(sum(when(col("__sign") === 0, col("__cnt"))), lit(0.0)).as("zero_count"),
        sort_array(collect_list(when(col("__sign") === 1,
          bucketStruct(col("__idx"), col("__cnt"))))).as("pos"),
        sort_array(collect_list(when(col("__sign") === -1,
          bucketStruct(col("__idx"), col("__cnt"))))).as("neg"))

  /** Build one native histogram per group from raw samples. */
  def fromSamples(df: DataFrame, groupCols: Seq[String], valueCol: String,
                  schema: Int, zeroThreshold: Double = 0.0): DataFrame =
    assemble(bucketCounts(df, groupCols.map(col), valueCol, schema,
      zeroThreshold), groupCols, schema)

  /** OpenMetrics exemplar plumbing: at most ONE exemplar per bucket,
    * newest wins — the scrape-visible rule (an exposition carries the
    * bucket's current exemplar, and each scrape overwrites the last).
    * One keyed aggregation on the SAME (group, sign, bucket) key as
    * [[bucketCounts]] — `max_by` over the (ts, ord) tuple keeps the
    * whole reduction map-side partial; output is |groups|·|buckets|
    * rows (never sample-sized) of
    * `(group…, sign, idx, exemplar STRUCT<labels…, value, ts>)`.
    * `labelCols` are the exemplar's trace labels (OpenMetrics allows
    * any label set ≤ 128 UTF-8 chars; typically `trace_id`). */
  def exemplars(df: DataFrame, groupCols: Seq[Column], valueCol: String,
                schema: Int, labelCols: Seq[String], tsCol: String,
                ordCol: String, zeroThreshold: Double = 0.0): DataFrame = {
    val v = col(valueCol)
    df.withColumn("__sign",
        when(v > zeroThreshold, 1).when(v < -zeroThreshold, -1).otherwise(0))
      .withColumn("__idx",
        when(col("__sign") === 0, lit(null).cast("int"))
          .otherwise(bucketIdx(abs(v), schema)))
      .groupBy((groupCols :+ col("__sign") :+ col("__idx")): _*)
      .agg(max_by(
        struct((labelCols.map(col) :+ v.as("value") :+ col(tsCol).as("ts")): _*),
        struct(col(tsCol), col(ordCol))).as("exemplar"))
      .withColumnRenamed("__sign", "sign").withColumnRenamed("__idx", "idx")
  }

  /** The `sum()` aggregation over native histograms: counts/sums add,
    * buckets merge index-wise. Mixed schemas merge at the group's
    * COARSEST (minimum) schema — a bucket at schema s maps onto target
    * t ≤ s by idx' = ⌈idx / 2^(s−t)⌉, integer-exact (the upstream
    * downscale rule: 2^(s-t) fine buckets nest inside one coarse one).
    * Shuffles bucket rows only, keyed by the output group. */
  def merge(df: DataFrame, groupCols: Seq[String]): DataFrame = {
    val keys = groupCols.map(col)
    val scalars = df.groupBy(keys: _*)
      .agg(min(col("schema")).as("schema"), sum(col("count")).as("count"),
        sum(col("sum")).as("sum"), sum(col("zero_count")).as("zero_count"))
    val buckets = df
      .select(keys :+ col("schema").as("__s") :+ explode(concat(
        transform(col("pos"), b => struct(lit(1).as("sign"), b.getField("idx").as("idx"), b.getField("cnt").as("cnt"))),
        transform(col("neg"), b => struct(lit(-1).as("sign"), b.getField("idx").as("idx"), b.getField("cnt").as("cnt")))
      )).as("__b"): _*)
    val rescaled = buckets
      .withColumn("__t", min(col("__s")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(keys: _*)))
      // ceil-division by 2^(s−t): exact in double for these small ints
      .withColumn("__idx",
        ceil(col("__b.idx") / pow(lit(2.0), col("__s") - col("__t"))).cast("int"))
      .groupBy((keys :+ col("__b.sign").as("__sign") :+ col("__idx")): _*)
      .agg(sum(col("__b.cnt")).as("__cnt"))
      .groupBy(keys: _*)
      .agg(
        sort_array(collect_list(when(col("__sign") === 1,
          bucketStruct(col("__idx"), col("__cnt"))))).as("pos"),
        sort_array(collect_list(when(col("__sign") === -1,
          bucketStruct(col("__idx"), col("__cnt"))))).as("neg"))
    scalars.join(rescaled, groupCols, "left")
      .withColumn("pos", coalesce(col("pos"), array().cast("array<struct<idx:int,cnt:double>>")))
      .withColumn("neg", coalesce(col("neg"), array().cast("array<struct<idx:int,cnt:double>>")))
  }

  /** Bucket-wise difference a − b for sorted sparse arrays (the
    * native-histogram counter increase): each bucket of `a` minus the
    * matching-index bucket of `b` (absent = 0), zero-diff buckets
    * dropped. O(|a|·|b|) per row over model-sized arrays (≤ ~64) — a
    * pure column expression, no shuffle. Buckets present only in `b`
    * (a true counter can't lose observations) signal a reset; callers
    * guard with the reset rule below rather than emitting negatives. */
  private def bucketSub(a: Column, b: Column): Column =
    filter(
      transform(a, x => struct(
        x.getField("idx").as("idx"),
        (x.getField("cnt") - coalesce(
          try_element_at(filter(b, y => y.getField("idx") === x.getField("idx")), lit(1))
            .getField("cnt"), lit(0.0))).as("cnt"))),
      s => s.getField("cnt") > 0)

  /** True iff any bucket of `prev` has a higher count than the matching
    * bucket of `cur` (absent = 0) — the upstream per-bucket reset probe
    * (Prometheus FloatHistogram.DetectReset): a counter restart quickly
    * re-filled to a HIGHER total but a different shape still resets.
    * O(|prev|·|cur|) over model-sized arrays, pure column expression. */
  private def anyBucketDrop(cur: Column, prev: Column): Column =
    exists(prev, p => p.getField("cnt") > coalesce(
      try_element_at(filter(cur, c => c.getField("idx") === p.getField("idx")), lit(1))
        .getField("cnt"), lit(0.0)))

  /** `increase()` over a HISTOGRAM-VALUED counter series: per partition
    * key, each row's histogram minus its predecessor (ordered by
    * `orderCol`) — counts, sums, zero counts subtract scalar-wise and
    * buckets subtract index-wise. The Prometheus counter-reset rule
    * (upstream DetectReset): the counter restarted — and the current
    * histogram IS the increase — if the total count dropped, the zero
    * count dropped, or ANY individual bucket count dropped (a restart
    * can re-fill past the old total with a different shape; total-only
    * detection would emit negative buckets). The first row per key has no
    * predecessor and is dropped, as upstream does. Output keeps the
    * histogram shape (schema/count/sum/zero_count/pos/neg) plus
    * `dt_sec`, so the whole ANALYZE battery applies to the increase
    * directly; rate = each scalar / dt_sec, and quantiles are
    * SCALE-INVARIANT (dividing every bucket by dt moves no boundary), so
    * quantile-of-increase == quantile-of-rate. One window shuffle keyed
    * by the series — the same exchange shape as every grid operator. */
  def increase(df: DataFrame, partitionCols: Seq[String],
               orderCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(partitionCols.map(col): _*).orderBy(col(orderCol))
    def prev(c: String) = lag(col(c), 1).over(w)
    val lagged = df
      .withColumn("__pcount", prev("count")).withColumn("__psum", prev("sum"))
      .withColumn("__pzero", prev("zero_count"))
      .withColumn("__ppos", prev("pos")).withColumn("__pneg", prev("neg"))
      .withColumn("__pord", lag(col(orderCol), 1).over(w))
      .filter(col("__pcount").isNotNull)
    val reset = col("count") < col("__pcount") ||
      col("zero_count") < col("__pzero") ||
      anyBucketDrop(col("pos"), col("__ppos")) ||
      anyBucketDrop(col("neg"), col("__pneg"))
    lagged.select(
      (partitionCols.map(col) :+ col(orderCol)) ++ Seq(
        col("schema"),
        when(reset, col("count")).otherwise(col("count") - col("__pcount")).as("count"),
        when(reset, col("sum")).otherwise(col("sum") - col("__psum")).as("sum"),
        when(reset, col("zero_count"))
          .otherwise(col("zero_count") - col("__pzero")).as("zero_count"),
        when(reset, col("pos")).otherwise(bucketSub(col("pos"), col("__ppos"))).as("pos"),
        when(reset, col("neg")).otherwise(bucketSub(col("neg"), col("__pneg"))).as("neg"),
        (col(orderCol).cast("double") - col("__pord").cast("double")).as("dt_sec")): _*)
  }

  // ---------- analyze battery (pure column expressions) ----------

  def histogramCount: Column = col("count")
  def histogramSum: Column   = col("sum")
  def histogramAvg: Column   = col("sum") / col("count")

  /** Bucket bounds, rounded to 9 dp: libm `pow` is only 1-ulp accurate
    * and differs across engines, so every bound that feeds downstream
    * arithmetic is pinned to the 9-dp grid FIRST — after that the two
    * engines hold bit-identical doubles and all derived values (bucket
    * midpoints, interpolations) are reproducible, not merely close. */
  private def upperOf(idx: Column, schema: Column): Column =
    round(pow(lit(2.0), idx.cast("double") / pow(lit(2.0), schema.cast("double"))), 9)
  private def lowerOf(idx: Column, schema: Column): Column =
    round(pow(lit(2.0), (idx.cast("double") - 1) / pow(lit(2.0), schema.cast("double"))), 9)

  /** All buckets as (lo, hi, cnt) ordered by VALUE ascending: negative
    * buckets mirrored and reversed, then the zero bucket (degenerate
    * [0,0] when zeroThreshold=0; only present when populated), then
    * positive. This is the cumulative order quantile/fraction walk. */
  private def orderedBounds(schema: Column, zeroThreshold: Double = 0.0): Column = {
    val posB = transform(col("pos"), b => struct(
      lowerOf(b.getField("idx"), schema).as("lo"),
      upperOf(b.getField("idx"), schema).as("hi"),
      b.getField("cnt").as("cnt")))
    val negB = transform(reverse(col("neg")), b => struct(
      (-upperOf(b.getField("idx"), schema)).as("lo"),
      (-lowerOf(b.getField("idx"), schema)).as("hi"),
      b.getField("cnt").as("cnt")))
    val zeroB = when(col("zero_count") > 0, array(struct(
      lit(-zeroThreshold).as("lo"), lit(zeroThreshold).as("hi"),
      col("zero_count").as("cnt")))).otherwise(array().cast(
      "array<struct<lo:double,hi:double,cnt:double>>"))
    concat(negB, zeroB, posB)
  }

  /** `histogram_quantile(φ, h)`: walk the cumulative bucket order to the
    * first bucket reaching rank φ·count, interpolate linearly inside it
    * (upstream's native-histogram rule; the exponential bounds make the
    * interpolation exponential in index space). φ·count and the
    * cumulative counts are the same IEEE doubles in any engine, so the
    * bucket pick is deterministic; only the libm `pow` bounds need the
    * caller's 6-dp output rounding. */
  def histogramQuantile(phi: Double, schemaCol: Column = col("schema"),
                        zeroThreshold: Double = 0.0): Column = {
    val r = lit(phi) * col("count")
    val folded = aggregate(
      orderedBounds(schemaCol, zeroThreshold),
      struct(lit(0.0).as("cum"), lit(null).cast("double").as("res")),
      (acc, b) => {
        val hit = acc.getField("res").isNull && (acc.getField("cum") + b.getField("cnt") >= r)
        struct(
          (acc.getField("cum") + b.getField("cnt")).as("cum"),
          when(hit, b.getField("lo") + (b.getField("hi") - b.getField("lo"))
            * ((r - acc.getField("cum")) / b.getField("cnt")))
            .otherwise(acc.getField("res")).as("res"))
      },
      acc => acc.getField("res"))
    when(lit(phi) < 0, lit(Double.NegativeInfinity))
      .when(lit(phi) > 1, lit(Double.PositiveInfinity))
      .when(col("count") === 0, lit(Double.NaN))
      .otherwise(folded)
  }

  /** `histogram_fraction(lo, hi, h)`: the estimated fraction of
    * observations in [lo, hi] — per-bucket linear overlap, the zero
    * bucket counting fully when it sits inside the range. Per-bucket
    * contributions are 6-dp-rounded and summed in DECIMAL, so the total
    * is independent of fold order and the oracle's SUM reproduces it
    * exactly (the repo's decimal-sum discipline). */
  def histogramFraction(lo: Double, hi: Double, schemaCol: Column = col("schema"),
                        zeroThreshold: Double = 0.0): Column = {
    val part = aggregate(
      orderedBounds(schemaCol, zeroThreshold),
      lit(0).cast("decimal(27,6)"),
      (acc, b) => {
        val width = b.getField("hi") - b.getField("lo")
        val overlap = least(lit(hi), b.getField("hi")) - greatest(lit(lo), b.getField("lo"))
        val frac = when(width === 0,
            when(lit(lo) <= b.getField("lo") && b.getField("hi") <= lit(hi), lit(1.0))
              .otherwise(lit(0.0)))
          .otherwise(greatest(least(overlap / width, lit(1.0)), lit(0.0)))
        (acc + round(b.getField("cnt") * frac, 6).cast("decimal(27,6)")).cast("decimal(27,6)")
      },
      acc => acc.cast("double"))
    when(col("count") === 0, lit(Double.NaN)).otherwise(part / col("count"))
  }

  /** `histogram_stdvar(h)` / `histogram_stddev(h)`: variance of the
    * bucket-midpoint distribution around the histogram's TRUE mean
    * (sum/count) — each bucket contributes cnt·(mid−mean)², the zero
    * bucket at mid 0. Upstream estimates with the same bucket-midpoint
    * device; the arithmetic midpoint in linear space is this engine's
    * documented estimator choice. Contributions ride the same
    * 6-dp + decimal-sum route as histogramFraction. */
  def histogramStdvar(schemaCol: Column = col("schema"),
                      meanCol: Option[Column] = None): Column = {
    // callers chasing bit-exact cross-engine parity pass a mean derived
    // from a decimal-pinned sum (e.g. round(sum, 2)/count): the raw
    // sum's fold-order ulps would otherwise leak through (mid−mean)².
    val mean = meanCol.getOrElse(col("sum") / col("count"))
    val ss = aggregate(
      orderedBounds(schemaCol),
      lit(0).cast("decimal(27,6)"),
      (acc, b) => {
        val mid = (b.getField("lo") + b.getField("hi")) / 2
        (acc + round(b.getField("cnt") * (mid - mean) * (mid - mean), 6)
          .cast("decimal(27,6)")).cast("decimal(27,6)")
      },
      acc => acc.cast("double"))
    when(col("count") === 0, lit(Double.NaN)).otherwise(ss / col("count"))
  }

  def histogramStddev(schemaCol: Column = col("schema"),
                      meanCol: Option[Column] = None): Column =
    sqrt(histogramStdvar(schemaCol, meanCol))

  // ---------- NHCB: native histograms with custom buckets (3.x) --------

  /** Prometheus 3.x "custom buckets" schema marker (upstream
    * `histogram.CustomBucketsSchema = -53`): the histogram's buckets are
    * defined by an explicit sorted bound array instead of the exponential
    * formula. This is what `convert_classic_histograms_to_nhcb` scrapes
    * classic le-bucket families INTO — exactly the data shape of the
    * reference's `Histogram` metric (`metrics/_metrics.py:71`, the A5
    * path) — so the classic surface gains native-histogram storage,
    * merge, and quantiles without changing a single scrape target. */
  val CustomBucketSchema: Int = -53

  /** NHCB bucket layout: `custom_values` holds the FINITE classic `le`
    * bounds ascending; positive bucket idx i (0-based) covers
    * (custom_values(i-1), custom_values(i)], idx 0 covers
    * (-Inf, custom_values(0)], and idx = size(custom_values) is the
    * +Inf overflow bucket. `pos` stays the sparse (idx, cnt) array the
    * exponential family uses; `neg`/zero bucket are unused (classic
    * histograms are one-sided by construction). */

  /** DENSE classic cumulative buckets: one row per (group, le) for EVERY
    * declared bound (+Inf included), zero-count buckets present — the
    * scrape-exposition shape (a classic exposition always carries its
    * full bucket list). `MetricRegistry.histogram` emits only populated
    * buckets, which is fine for serving but NOT for NHCB conversion:
    * custom_values derived from populated-only rows would differ between
    * shards and poison the identical-layout merge rule. One keyed
    * aggregation (a conditional-sum per bound — cumulative counts are
    * `count(v <= bound)` directly), then an in-row unpivot; no window,
    * no per-sample explode. */
  def classicCumulativeDense(df: DataFrame, groupCols: Seq[String],
                             value: String,
                             buckets: Seq[Double]): DataFrame = {
    val all = buckets.sorted :+ Double.PositiveInfinity
    val aggs = all.zipWithIndex.map { case (b, i) =>
      sum(when(col(value) <= b, 1L).otherwise(0L)).cast("double").as(s"__c$i")
    }
    val g = df.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
    val pairs = all.zipWithIndex.map { case (b, i) =>
      struct(lit(b).as("le"), col(s"__c$i").as("cum"))
    }
    g.select(groupCols.map(col) :+ explode(array(pairs: _*)).as("__p"): _*)
      .select(groupCols.map(col) :+ col("__p.le").as("le") :+
        col("__p.cum").as("cum_count"): _*)
  }

  /** Convert CLASSIC cumulative le-bucket rows — one row per (group, le)
    * with le ascending and including the +Inf bucket, the exact output
    * shape of `MetricRegistry.histogram` — into one NHCB row per group:
    * `(group…, schema=-53, count, custom_values, pos)`. The upstream
    * scrape-time conversion (`convert_classic_histograms_to_nhcb`):
    * de-cumulate adjacent bounds, drop empty buckets (sparse), keep the
    * finite bounds as custom_values, total = the +Inf cumulative count.
    *
    * ONE keyed aggregation: the per-group bucket list is model-sized
    * (|bounds|+1 entries), so collect_list + in-array adjacent
    * differences beat a lag-window (same shuffle key, no second sort
    * pass); everything after the agg is pure column math in codegen. */
  def fromClassicCumulative(df: DataFrame, groupCols: Seq[String],
                            leCol: String = "le",
                            cumCol: String = "cum_count"): DataFrame = {
    val g = df.groupBy(groupCols.map(col): _*)
      .agg(sort_array(collect_list(struct(
        col(leCol).cast("double").as("le"),
        col(cumCol).cast("double").as("cum")))).as("__b"))
    val decum = transform(col("__b"), (b, i) => struct(
      i.as("idx"),
      b.getField("le").as("le"),
      (b.getField("cum") - when(i === 0, lit(0.0))
        .otherwise(element_at(col("__b"), i).getField("cum"))).as("cnt")))
    g.select(
      (groupCols.map(col) :+
        lit(CustomBucketSchema).as("schema") :+
        element_at(col("__b"), size(col("__b"))).getField("cum").as("count") :+
        filter(transform(col("__b"), b => b.getField("le")),
          le => !isnan(le) && le =!= Double.PositiveInfinity)
          .as("custom_values") :+
        transform(filter(decum, b => b.getField("cnt") > 0), b =>
          struct(b.getField("idx").cast("int").as("idx"),
            b.getField("cnt").as("cnt"))).as("pos")): _*)
  }

  /** `sum()` over NHCB histograms. Upstream merges custom-bucket
    * histograms only when their bound arrays are IDENTICAL (mismatched
    * layouts cannot be rescaled like exponential schemas can) — a mixed
    * group fails LOUDLY here rather than emitting a silently wrong
    * layout. Shuffles bucket rows only, keyed by the output group. */
  def mergeCustom(df: DataFrame, groupCols: Seq[String]): DataFrame = {
    val keys = groupCols.map(col)
    val scalars = df.groupBy(keys: _*)
      .agg(collect_set(col("custom_values")).as("__cvs"),
        sum(col("count")).as("count"))
      .withColumn("custom_values",
        when(size(col("__cvs")) > 1, raise_error(concat(lit(
          "NHCB merge: mismatched custom bucket layouts in group "),
          to_json(struct(keys: _*)))))
          .otherwise(element_at(col("__cvs"), 1)))
      .drop("__cvs")
    val buckets = df
      .select(keys :+ explode(col("pos")).as("__b"): _*)
      .groupBy((keys :+ col("__b.idx").as("__idx")): _*)
      .agg(sum(col("__b.cnt")).as("__cnt"))
      .groupBy(keys: _*)
      .agg(sort_array(collect_list(
        struct(col("__idx").as("idx"), col("__cnt").as("cnt")))).as("pos"))
    scalars.join(buckets, groupCols, "left")
      .withColumn("schema", lit(CustomBucketSchema))
      .withColumn("pos", coalesce(col("pos"),
        array().cast("array<struct<idx:int,cnt:double>>")))
  }

  /** Schema-dispatching `histogram_quantile(φ)`: exponential-schema rows
    * interpolate exponentially, custom-bucket (schema −53) rows use the
    * classic rules — the 3.x behavior when one selector touches both
    * kinds. Requires the frame to carry the UNION column set
    * (pos/neg/zero_count/custom_values); [[fromClassicCumulative]]
    * emits NHCB rows and a caller binding a mixed frame pads the other
    * side with empty/zero columns. */
  def histogramQuantileAuto(phi: Double): Column =
    when(col("schema") === CustomBucketSchema, nhcbQuantile(phi))
      .otherwise(histogramQuantile(phi))

  /** `histogram_quantile(φ)` over an NHCB row — upstream's CLASSIC
    * interpolation rules (promql `bucketQuantile`), which NHCB inherits:
    * linear interpolation inside the hit bucket; a hit in the first
    * bucket interpolates from lower bound 0 when its upper bound is
    * positive and returns the upper bound itself otherwise; a hit in
    * the +Inf overflow bucket returns the highest finite bound. All
    * arithmetic is on exact bound literals and integer-valued counts,
    * so both engines derive bit-identical doubles. */
  def nhcbQuantile(phi: Double): Column = {
    val cv = col("custom_values")
    val nFinite = size(cv)
    val r = lit(phi) * col("count")
    val folded = aggregate(
      col("pos"),
      struct(lit(0.0).as("cum"), lit(null).cast("double").as("res")),
      (acc, b) => {
        val hit = acc.getField("res").isNull &&
          (acc.getField("cum") + b.getField("cnt") >= r)
        val isInf = b.getField("idx") >= nFinite
        val upper = when(isInf, lit(Double.PositiveInfinity))
          .otherwise(element_at(cv, b.getField("idx") + 1))
        val lower = when(b.getField("idx") === 0, lit(0.0))
          .otherwise(element_at(cv, b.getField("idx")))
        val v = when(isInf, element_at(cv, nFinite))
          .when(b.getField("idx") === 0 && upper <= 0, upper)
          .otherwise(lower + (upper - lower) *
            ((r - acc.getField("cum")) / b.getField("cnt")))
        struct(
          (acc.getField("cum") + b.getField("cnt")).as("cum"),
          when(hit, v).otherwise(acc.getField("res")).as("res"))
      },
      acc => acc.getField("res"))
    when(lit(phi) < 0, lit(Double.NegativeInfinity))
      .when(lit(phi) > 1, lit(Double.PositiveInfinity))
      .when(col("count") === 0 || nFinite === 0, lit(Double.NaN))
      .otherwise(folded)
  }
}
