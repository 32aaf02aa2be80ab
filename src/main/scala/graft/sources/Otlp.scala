package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** OTLP/JSON metrics ingestion — the Prometheus 3.x OTLP receiver's
  * translation (`otlp_write_handler`), over the OpenTelemetry JSON
  * encoding (uint64s as strings, `resourceMetrics[].scopeMetrics[]
  * .metrics[]` with `gauge`/`sum` datapoint families).
  *
  * Everything is column math on one `from_json` + three `explode`s —
  * map-side at scan speed, zero UDFs, so a 100 TB OTLP export lake
  * parses inside whole-stage codegen and lands as ordinary keyed
  * samples. Translation rules (upstream prometheus/otlptranslator):
  * metric-name dots become underscores (the UnderscoreEscapingWithSuffixes
  * strategy's charset rule), `service.name` resource attribute becomes
  * the `job` label, datapoint attributes become labels, monotonic sums
  * are counters (kind `sum`), gauges are gauges; `asDouble`/`asInt`
  * datapoints both land as doubles.
  */
object Otlp {

  private val attrType = ArrayType(StructType(Seq(
    StructField("key", StringType),
    StructField("value", StructType(Seq(
      StructField("stringValue", StringType)))))))

  private val dpType = ArrayType(StructType(Seq(
    StructField("startTimeUnixNano", StringType),
    StructField("timeUnixNano", StringType),
    StructField("asDouble", DoubleType),
    StructField("asInt", StringType),
    StructField("attributes", attrType))))

  val schema: DataType = StructType(Seq(
    StructField("resourceMetrics", ArrayType(StructType(Seq(
      StructField("resource", StructType(Seq(
        StructField("attributes", attrType)))),
      StructField("scopeMetrics", ArrayType(StructType(Seq(
        StructField("metrics", ArrayType(StructType(Seq(
          StructField("name", StringType),
          StructField("gauge", StructType(Seq(
            StructField("dataPoints", dpType)))),
          StructField("sum", StructType(Seq(
            StructField("aggregationTemporality", IntegerType),
            StructField("isMonotonic", BooleanType),
            StructField("dataPoints", dpType))))))))))))))))))

  private def attrMap(attrs: Column): Column =
    map_from_entries(transform(attrs,
      a => struct(a.getField("key"), a.getField("value").getField("stringValue"))))

  /** Parse a frame holding one OTLP/JSON export document per row in
    * `jsonCol` into samples: `metric` (normalized name), `kind`
    * (`sum`/`gauge`), `job` (service.name), `attrs` (datapoint
    * attributes as a map), `ts` (timestamp), `value` (double). */
  def parse(df: DataFrame, jsonCol: String = "json"): DataFrame = {
    val parsed = df.select(from_json(col(jsonCol), schema).as("d"))
      .select(explode(col("d.resourceMetrics")).as("rm"))
      .select(
        attrMap(col("rm.resource.attributes")).getItem("service.name").as("job"),
        explode(col("rm.scopeMetrics")).as("sm"))
      .select(col("job"), explode(col("sm.metrics")).as("m"))
    val dps = parsed.select(
      col("job"),
      // the upstream charset rule: '.' (any invalid char) → '_'
      regexp_replace(col("m.name"), "[^a-zA-Z0-9_:]", "_").as("metric"),
      when(col("m.sum").isNotNull, lit("sum")).otherwise(lit("gauge")).as("kind"),
      coalesce(col("m.sum.isMonotonic"), lit(false)).as("monotonic"),
      // CUMULATIVE(2) is the default; DELTA(1) marks points for the
      // deltaToCumulative conversion (upstream's otlp-deltatocumulative)
      coalesce(col("m.sum.aggregationTemporality"), lit(2)).as("temporality"),
      explode(coalesce(col("m.sum.dataPoints"), col("m.gauge.dataPoints")))
        .as("dp"))
    dps.select(
      col("metric"), col("kind"), col("monotonic"), col("job"),
      col("temporality"),
      attrMap(col("dp.attributes")).as("attrs"),
      // Integral `div`, never `/`: Column `/` is DOUBLE division, and
      // 2024-era nanosecond epochs exceed 2^53, so a double hop silently
      // rounds ~1.5% of µs values to N-1 (e.g. µs ≡ 16 mod 64).
      timestamp_micros(expr("cast(dp.timeUnixNano as long) div 1000"))
        .as("ts"),
      // nullable: most exporters omit it; deltaToCumulative treats a
      // CHANGE in start_ts as a collector restart (accumulation reset)
      timestamp_micros(expr("cast(dp.startTimeUnixNano as long) div 1000"))
        .as("start_ts"),
      coalesce(col("dp.asDouble"), col("dp.asInt").cast("double")).as("value"))
  }

  // ---- exponential histograms (OTLP → Prometheus native histograms) ----

  private val expDpType = ArrayType(StructType(Seq(
    StructField("timeUnixNano", StringType),
    StructField("scale", IntegerType),
    StructField("zeroCount", StringType),
    StructField("count", StringType),
    StructField("sum", DoubleType),
    StructField("positive", StructType(Seq(
      StructField("offset", IntegerType),
      StructField("bucketCounts", ArrayType(StringType))))))))

  val expSchema: DataType = StructType(Seq(
    StructField("resourceMetrics", ArrayType(StructType(Seq(
      StructField("resource", StructType(Seq(
        StructField("attributes", attrType)))),
      StructField("scopeMetrics", ArrayType(StructType(Seq(
        StructField("metrics", ArrayType(StructType(Seq(
          StructField("name", StringType),
          StructField("exponentialHistogram", StructType(Seq(
            StructField("aggregationTemporality", IntegerType),
            StructField("dataPoints", expDpType))))))))))))))))))

  /** Render native-histogram rows (`schema`/`count`/`sum`/`zero_count`/
    * `pos`, the [[graft.metrics.NativeHistogram]] frame) into OTLP/JSON
    * exponentialHistogram export documents — scale = schema, dense
    * `bucketCounts` from `offset` with zero-filled gaps, uint64s as
    * strings per the OTLP JSON encoding. OTLP bucket i covers
    * (base^(offset+i), base^(offset+i+1)], one LOWER than the Prometheus
    * index convention, so offset = min(promIdx) − 1. */
  def renderExpHistogram(hist: DataFrame, docKey: Column, metricCol: Column,
                         tsCol: Column, temporality: Int = 2): DataFrame = {
    val idxs = transform(col("pos"), b => b.getField("idx"))
    val m = map_from_entries(col("pos"))
    val dense = transform(
      sequence(array_min(idxs), array_max(idxs)),
      i => coalesce(element_at(m, i), lit(0.0)).cast("long").cast("string"))
    val dp = struct(
      (unix_micros(tsCol) * 1000L).cast("string").as("timeUnixNano"),
      col("schema").cast("int").as("scale"),
      col("zero_count").cast("long").cast("string").as("zeroCount"),
      col("count").cast("long").cast("string").as("count"),
      col("sum").as("sum"),
      struct((array_min(idxs) - 1).as("offset"),
        dense.as("bucketCounts")).as("positive"))
    hist.groupBy(docKey.as("__doc"), metricCol.as("__metric"))
      .agg(collect_list(dp).as("dataPoints"))
      .groupBy(col("__doc"))
      .agg(collect_list(struct(col("__metric").as("name"),
        struct(lit(temporality).as("aggregationTemporality"),
          col("dataPoints")).as("exponentialHistogram"))).as("metrics"))
      .select(col("__doc"), to_json(struct(array(struct(
        struct(array(struct(lit("service.name").as("key"),
          struct(col("__doc").cast("string").as("stringValue")).as("value")))
          .as("attributes")).as("resource"),
        array(struct(col("metrics"))).as("scopeMetrics")))
        .as("resourceMetrics"))).as("json"))
  }

  /** Parse OTLP/JSON exponentialHistogram documents back into the
    * native-histogram frame shape: one row per datapoint with `job`,
    * normalized `metric`, `ts`, `schema`, `count`, `sum`, `zero_count`,
    * and ascending sparse `pos` (zero-count buckets dropped; OTLP index
    * + 1 = Prometheus index). Pure column math — no explode is needed
    * for the bucket array at all. */
  def parseExpHistogram(df: DataFrame, jsonCol: String = "json"): DataFrame = {
    val parsed = df.select(from_json(col(jsonCol), expSchema).as("d"))
      .select(explode(col("d.resourceMetrics")).as("rm"))
      .select(
        attrMap(col("rm.resource.attributes")).getItem("service.name").as("job"),
        explode(col("rm.scopeMetrics")).as("sm"))
      .select(col("job"), explode(col("sm.metrics")).as("m"))
      .select(col("job"),
        regexp_replace(col("m.name"), "[^a-zA-Z0-9_:]", "_").as("metric"),
        // DELTA(1) marks points for bucket-wise cumulative conversion
        // (the deltatocumulative processor covers histograms too)
        coalesce(col("m.exponentialHistogram.aggregationTemporality"),
          lit(2)).as("temporality"),
        explode(col("m.exponentialHistogram.dataPoints")).as("dp"))
    parsed.select(
      col("job"), col("metric"), col("temporality"),
      timestamp_micros(expr("cast(dp.timeUnixNano as long) div 1000")).as("ts"),
      col("dp.scale").as("schema"),
      col("dp.count").cast("double").as("count"),
      col("dp.sum").as("sum"),
      col("dp.zeroCount").cast("double").as("zero_count"),
      filter(
        transform(col("dp.positive.bucketCounts"),
          (c, i) => struct(
            (col("dp.positive.offset") + i + 1).cast("int").as("idx"),
            c.cast("double").as("cnt"))),
        b => b.getField("cnt") > 0).as("pos"),
      array().cast("array<struct<idx:int,cnt:double>>").as("neg"))
  }

  // ---- classic histograms (OTLP explicitBounds → Prometheus le-buckets) ----

  private val histDpType = ArrayType(StructType(Seq(
    StructField("timeUnixNano", StringType),
    StructField("count", StringType),
    StructField("sum", DoubleType),
    StructField("explicitBounds", ArrayType(DoubleType)),
    StructField("bucketCounts", ArrayType(StringType)))))

  val histSchema: DataType = StructType(Seq(
    StructField("resourceMetrics", ArrayType(StructType(Seq(
      StructField("resource", StructType(Seq(
        StructField("attributes", attrType)))),
      StructField("scopeMetrics", ArrayType(StructType(Seq(
        StructField("metrics", ArrayType(StructType(Seq(
          StructField("name", StringType),
          StructField("histogram", StructType(Seq(
            StructField("aggregationTemporality", IntegerType),
            StructField("dataPoints", histDpType))))))))))))))))))

  /** Render classic-histogram datapoint rows (`bounds` array<double>,
    * `bucket_counts` array<long> NON-cumulative of length bounds+1 —
    * the OTLP bucket convention — plus `count`/`sum`) into OTLP/JSON
    * `histogram` export documents, uint64s as strings. */
  def renderHistogram(dp: DataFrame, docKey: Column, metricCol: Column,
                      tsCol: Column): DataFrame = {
    val point = struct(
      (unix_micros(tsCol) * 1000L).cast("string").as("timeUnixNano"),
      col("count").cast("long").cast("string").as("count"),
      col("sum").as("sum"),
      col("bounds").as("explicitBounds"),
      transform(col("bucket_counts"), c => c.cast("string"))
        .as("bucketCounts"))
    dp.groupBy(docKey.as("__doc"), metricCol.as("__metric"))
      .agg(collect_list(point).as("dataPoints"))
      .groupBy(col("__doc"))
      .agg(collect_list(struct(col("__metric").as("name"),
        struct(lit(2).as("aggregationTemporality"),
          col("dataPoints")).as("histogram"))).as("metrics"))
      .select(col("__doc"), to_json(struct(array(struct(
        struct(array(struct(lit("service.name").as("key"),
          struct(col("__doc").cast("string").as("stringValue")).as("value")))
          .as("attributes")).as("resource"),
        array(struct(col("metrics"))).as("scopeMetrics")))
        .as("resourceMetrics"))).as("json"))
  }

  /** Parse OTLP/JSON classic `histogram` documents into Prometheus
    * le-bucket datapoints: one row per datapoint with `job`, normalized
    * `metric`, `ts`, `count`, `sum`, and `buckets` — CUMULATIVE
    * `{le, cum}` structs (the OTLP→Prometheus conversion the collector's
    * prometheus exporter runs: OTLP counts are per-interval, le buckets
    * are cumulative, and the `+Inf` bucket is the total count). The
    * cumulative fold is in-array column math (aggregate over a slice) —
    * no explode until the caller wants bucket rows. */
  def parseHistogram(df: DataFrame, jsonCol: String = "json"): DataFrame = {
    val parsed = df.select(from_json(col(jsonCol), histSchema).as("d"))
      .select(explode(col("d.resourceMetrics")).as("rm"))
      .select(
        attrMap(col("rm.resource.attributes")).getItem("service.name").as("job"),
        explode(col("rm.scopeMetrics")).as("sm"))
      .select(col("job"), explode(col("sm.metrics")).as("m"))
      .select(col("job"),
        regexp_replace(col("m.name"), "[^a-zA-Z0-9_:]", "_").as("metric"),
        explode(col("m.histogram.dataPoints")).as("dp"))
    val counts = transform(col("dp.bucketCounts"), c => c.cast("long"))
    val nb = size(col("dp.explicitBounds"))
    val buckets = transform(sequence(lit(0), nb),
      i => struct(
        when(i < nb, element_at(col("dp.explicitBounds"), i + 1)
          .cast("string")).otherwise("+Inf").as("le"),
        when(i < nb, aggregate(slice(counts, lit(1), i + 1),
          lit(0L), (acc, c) => acc + c))
          .otherwise(col("dp.count").cast("long")).as("cum")))
    parsed.select(
      col("job"), col("metric"),
      timestamp_micros(expr("cast(dp.timeUnixNano as long) div 1000")).as("ts"),
      col("dp.count").cast("long").as("count"),
      col("dp.sum").as("sum"),
      buckets.as("buckets"))
  }

  /** Render a sample frame INTO OTLP/JSON export documents — the inverse
    * used by the round-trip oracle (and a handy test-data generator).
    * One document per `docKey` group; within it, one metric entry per
    * `metricCol` value carrying that group's datapoints as a monotonic
    * cumulative sum. Names keep their dots here — parse() normalizes. */
  def render(df: DataFrame, docKey: Column, metricCol: Column, tsCol: Column,
             valueCol: Column, attrCols: Seq[(String, Column)],
             temporality: Int = 2,
             startTsCol: Option[Column] = None): DataFrame = {
    val dp = struct(
      startTsCol.map(c => (unix_micros(c) * 1000L).cast("string"))
        .getOrElse(lit(null).cast("string")).as("startTimeUnixNano"),
      (unix_micros(tsCol) * 1000L).cast("string").as("timeUnixNano"),
      valueCol.cast("double").as("asDouble"),
      array(attrCols.map { case (k, c) =>
        struct(lit(k).as("key"),
          struct(c.cast("string").as("stringValue")).as("value"))
      }: _*).as("attributes"))
    df.groupBy(docKey.as("__doc"), metricCol.as("__metric"))
      .agg(collect_list(dp).as("dataPoints"))
      .groupBy(col("__doc"))
      .agg(collect_list(struct(col("__metric").as("name"),
        struct(lit(temporality).as("aggregationTemporality"),
          lit(true).as("isMonotonic"),
          col("dataPoints")).as("sum"))).as("metrics"))
      .select(col("__doc"), to_json(struct(array(struct(
        struct(array(struct(lit("service.name").as("key"),
          struct(col("__doc").cast("string").as("stringValue")).as("value")))
          .as("attributes")).as("resource"),
        array(struct(col("metrics"))).as("scopeMetrics")))
        .as("resourceMetrics"))).as("json"))
  }

  /** DELTA → CUMULATIVE conversion (the upstream
    * `otlp-deltatocumulative` feature, Prometheus 3.2+): monotonic-sum
    * datapoints with aggregationTemporality = DELTA(1) become a
    * per-series running total — a keyed DECIMAL prefix sum of 6-dp
    * deltas (exact, association-free), the canonical Spark shape for
    * the conversion. Cumulative and gauge rows pass through unchanged.
    *
    * Restart detection (upstream deltatocumulative semantics): the
    * processor tracks a series' LAST KNOWN start timestamp; when a
    * point's non-null `start_ts` differs from it, the producing
    * collector restarted and the running total resets to zero at the
    * new segment. Implemented as `last(start_ts, ignoreNulls)` over the
    * strictly-preceding frame — NOT `lag(1)`, so a mixed wire where some
    * points omit startTimeUnixNano still resets when the next non-null
    * start differs from the last known one (a lag-only compare would
    * silently keep accumulating across the restart). All windows share
    * one partitioning, so the whole conversion costs a single hash
    * shuffle on the series key regardless of scale. Points with a null
    * `start_ts` (exporter omitted it) never trigger a reset themselves.
    *
    * `orderCols` breaks ties between equal-`ts` points (other engine
    * windows order by (tsCol, orderCol)); default keeps ts-only order
    * for wires whose points are unique per series-timestamp. */
  def deltaToCumulative(samples: DataFrame, seriesKey: Seq[Column],
                        orderCols: Seq[Column] = Nil): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ord = col("ts") +: orderCols
    val wSeq = Window.partitionBy(seriesKey: _*).orderBy(ord: _*)
    val wRun = wSeq.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val isDelta = col("kind") === "sum" && col("temporality") === 1
    // full per-series prefix sum of the delta points (non-delta rows
    // contribute null, which sum() skips)
    val dec = when(isDelta, round(col("value"), 6).cast("decimal(18,6)"))
    val hasStart = samples.columns.contains("start_ts")
    // the stream's last KNOWN start: last non-null start_ts over strictly
    // preceding rows (same partition+order as wSeq — no extra shuffle)
    val wPrev = wSeq.rowsBetween(Window.unboundedPreceding, -1)
    val restart =
      if (!hasStart) lit(false)
      else {
        val lastKnown = last(col("start_ts"), ignoreNulls = true).over(wPrev)
        col("start_ts").isNotNull && lastKnown.isNotNull &&
          col("start_ts") =!= lastKnown
      }
    // every window here shares ONE (partitionBy seriesKey, orderBy ord)
    // spec, so the whole conversion — restarts included — costs a single
    // hash shuffle + sort regardless of scale: cumulative = full prefix
    // sum minus the prefix recorded at the most recent restart boundary
    // (`last(..., ignoreNulls)` carries it forward within the partition).
    samples
      .withColumn("__ps", sum(dec).over(wRun))
      .withColumn("__base",
        last(when(restart, coalesce(lag(col("__ps"), 1).over(wSeq),
            lit(0).cast("decimal(18,6)"))), ignoreNulls = true).over(wRun))
      .withColumn("value",
        when(isDelta,
          (col("__ps") - coalesce(col("__base"), lit(0))).cast("double"))
          .otherwise(col("value")))
      .withColumn("temporality",
        when(isDelta, lit(2)).otherwise(col("temporality")))
      .drop("__ps", "__base")
  }
}
