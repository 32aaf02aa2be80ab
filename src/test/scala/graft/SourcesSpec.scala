package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Source formats beyond parquet (E2 CSV/JSON) and the file-based
  * streaming source (E3) — round-trip fidelity on the events table. */
class SourcesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ev = Tables.events(spark, TestSpark.SF)
    .select($"event_id", $"user_id", $"event_type", $"value")

  test("E2: CSV round-trip with header + explicit schema") {
    val dir = java.nio.file.Files.createTempDirectory("csv_src").toString + "/out"
    ev.write.option("header", "true").csv(dir)
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("event_type", StringType), StructField("value", DoubleType)))
    val back = spark.read.option("header", "true").schema(schema).csv(dir)
    assert(back.count() == ev.count())
    assert(back.agg(sum($"value".cast("decimal(18,2)"))).collect()(0).getDecimal(0) ==
      ev.agg(sum($"value".cast("decimal(18,2)"))).collect()(0).getDecimal(0))
  }

  test("E2: JSON round-trip") {
    val dir = java.nio.file.Files.createTempDirectory("json_src").toString + "/out"
    ev.write.json(dir)
    val back = spark.read.json(dir)
    assert(back.count() == ev.count())
    assert(back.select(countDistinct($"event_type")).collect()(0).getLong(0) == 5)
  }

  test("partitioned layout: day filter prunes partitions at the scan (SCALE.md)") {
    val dir = java.nio.file.Files.createTempDirectory("part_layout").toString + "/events"
    Tables.events(spark, TestSpark.SF)
      .withColumn("day", date_format($"ts", "yyyy-MM-dd"))
      .write.partitionBy("day").parquet(dir)
    val q = spark.read.parquet(dir).filter($"day" === "2024-01-05")
    val scan = q.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters") && scan.contains("2024-01-05"), scan.take(400))
    val full = spark.read.parquet(dir)
    assert(q.count() == full.filter(date_format($"ts", "yyyy-MM-dd") === "2024-01-05").count())
  }

  test("E3: file-based streaming source (readStream over parquet dir)") {
    // Stage the raw events file into a stream-source directory; ts arrives
    // as int64 nanos (the raw parquet type) and is rescaled in-stream.
    val dir = java.nio.file.Files.createTempDirectory("stream_src").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"${TestSpark.SF}/events.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val stream = spark.readStream.schema(schema).parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .withWatermark("ts", "1 hour")
      .groupBy(window($"ts", "6 hours"), $"event_type")
      .agg(count(lit(1)).as("n"))
    val q = stream.writeStream.outputMode("complete")
      .format("memory").queryName("file_src_sink").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("file_src_sink").agg(sum($"n")).collect()(0).getLong(0)
    assert(got == 1000L)
  }

  test("OTLP/JSON: gauge + asInt datapoints, name charset, malformed drop") {
    import graft.sources.Otlp
    val doc =
      """{"resourceMetrics":[{"resource":{"attributes":[
        |{"key":"service.name","value":{"stringValue":"svc-1"}}]},
        |"scopeMetrics":[{"metrics":[
        |{"name":"jvm.memory.used","gauge":{"dataPoints":[
        |  {"timeUnixNano":"1704067200000000000","asInt":"42",
        |   "attributes":[{"key":"pool","value":{"stringValue":"heap"}}]}]}},
        |{"name":"http.server.requests","sum":{"aggregationTemporality":2,
        |  "isMonotonic":true,"dataPoints":[
        |  {"timeUnixNano":"1704067260000000000","asDouble":7.5,
        |   "attributes":[]}]}}]}]}]}""".stripMargin.replace("\n", "")
    val df = Otlp.parse(Seq(doc, """{"not":"otlp"""").toDF("json"))
    val rows = df.collect()
    assert(rows.length == 2) // the malformed document contributes nothing
    val byName = rows.map(r => r.getAs[String]("metric") -> r).toMap
    val g = byName("jvm_memory_used")
    assert(g.getAs[String]("kind") == "gauge" && !g.getAs[Boolean]("monotonic"))
    assert(g.getAs[Double]("value") == 42.0) // asInt lands as double
    assert(g.getAs[Map[String, String]]("attrs") == Map("pool" -> "heap"))
    assert(g.getAs[String]("job") == "svc-1")
    assert(g.getAs[java.sql.Timestamp]("ts").toString == "2024-01-01 00:00:00.0")
    val c = byName("http_server_requests")
    assert(c.getAs[String]("kind") == "sum" && c.getAs[Boolean]("monotonic"))
    assert(c.getAs[Double]("value") == 7.5)
  }

  test("Influx line protocol: multi-field, i-suffix, tags, malformed") {
    import graft.sources.InfluxLine
    val lines = Seq(
      "weather,location=us,sensor=a temperature=82.5,humidity=71i 1704067200000000000",
      "cpu usage=0.93",                    // no tags, no timestamp
      "disk,host=h1 used=\"lots\"",        // string field → null value
      "   not a line at all",              // malformed → dropped
      "mem,host=h1 free=12.0,cached=3.5 1704067260000000000")
    val df = InfluxLine.parse(lines.toDF("line"))
    val rows = df.collect()
    assert(rows.length == 6) // 2 + 1 + 1 + 0 + 2 field-rows
    val byMetric = rows.map(r => r.getAs[String]("metric") -> r).toMap
    val t = byMetric("weather_temperature")
    assert(t.getAs[Double]("value") == 82.5 &&
      t.getAs[Map[String, String]]("tags") ==
        Map("location" -> "us", "sensor" -> "a"))
    assert(t.getAs[java.sql.Timestamp]("ts").toString == "2024-01-01 00:00:00.0")
    assert(byMetric("weather_humidity").getAs[Double]("value") == 71.0)
    val c = byMetric("cpu_usage")
    assert(c.getAs[Double]("value") == 0.93 && c.isNullAt(c.fieldIndex("ts")) &&
      c.getAs[Map[String, String]]("tags").isEmpty)
    assert(byMetric("disk_used").isNullAt(rows(0).fieldIndex("value")))
    assert(byMetric("mem_cached").getAs[Double]("value") == 3.5)
  }

  test("OTLP/JSON: render → parse is the identity on samples") {
    import graft.sources.Otlp
    val sub = ev.filter($"event_id" <= 200)
      .withColumn("ts", lit("2024-01-01 00:00:00").cast("timestamp"))
    val docs = Otlp.render(sub, col("user_id"),
      concat(lit("m."), col("event_type")), col("ts"),
      col("value"), Seq("eid" -> col("event_id")))
    val back = Otlp.parse(docs)
    assert(back.count() == sub.count())
    assert(back.agg(sum(round(col("value"), 6).cast("decimal(18,6)")))
      .collect()(0).getDecimal(0) ==
      sub.agg(sum(round($"value", 6).cast("decimal(18,6)")))
        .collect()(0).getDecimal(0))
  }

  test("remote-write: parse extracts __name__/labels; render → parse identity") {
    import graft.sources.RemoteWrite
    val doc =
      """{"timeseries":[
        |  {"labels":[{"name":"__name__","value":"http_requests_total"},
        |             {"name":"job","value":"api"}],
        |   "samples":[{"value":1.0,"timestamp":1704067200000},
        |              {"value":2.5,"timestamp":1704067260000}]},
        |  {"labels":[{"name":"__name__","value":"up"},
        |             {"name":"job","value":"api"}],
        |   "samples":[{"value":1.0,"timestamp":1704067200000}]}
        |]}""".stripMargin
    val out = RemoteWrite.parse(Seq(doc).toDF("json")).collect()
    assert(out.length == 3)
    val reqs = out.filter(_.getString(0) == "http_requests_total")
    assert(reqs.length == 2)
    // __name__ moved to the metric column, NOT left in the label map
    assert(reqs.head.getMap[String, String](1).toMap == Map("job" -> "api"))
    assert(reqs.map(_.getDouble(3)).sorted.toSeq == Seq(1.0, 2.5))
    assert(reqs.map(_.getTimestamp(2).getTime).min == 1704067200000L)

    val sub = ev.filter($"event_id" <= 200)
      .withColumn("ts", lit("2024-01-01 00:00:00").cast("timestamp"))
    val docs = RemoteWrite.render(sub, col("user_id"),
      concat(lit("m_"), col("event_type")), col("ts"),
      col("value"), Seq("eid" -> col("event_id")))
    val back = RemoteWrite.parse(docs)
    assert(back.count() == sub.count())
    assert(back.agg(sum(round(col("value"), 6).cast("decimal(18,6)")))
      .collect()(0).getDecimal(0) ==
      sub.agg(sum(round($"value", 6).cast("decimal(18,6)")))
        .collect()(0).getDecimal(0))
  }

  test("remote-write 2.0: interned symbols round-trip; table deduped, empty-first") {
    import graft.sources.RemoteWrite
    val sub = ev.filter($"event_id" <= 50)
      .withColumn("ts", lit("2024-01-01 00:00:00").cast("timestamp"))
      .withColumn("trace", concat(lit("tr"), $"event_id"))
    val docs = RemoteWrite.renderV2(sub, col("user_id"),
      concat(lit("m_"), col("event_type")), col("ts"), col("value"),
      Seq("user" -> col("user_id")), "trace" -> col("trace"))
    // the spec's symbol-table invariants, checked on the wire itself
    val sym = spark.read.json(docs.select(col("json")).as[String])
      .selectExpr("symbols").as[Seq[String]].collect()
    sym.foreach { t =>
      assert(t.head == "", "first symbol must be the empty string")
      assert(t.distinct.length == t.length, "symbol table must be deduped")
      assert(t.contains("__name__"))
    }
    val parsed = RemoteWrite.parseV2(docs)
    val samples = parsed.filter(!col("is_exemplar"))
    assert(samples.count() == sub.count())
    // refs resolved: every metric name and label survives the interning
    assert(samples.select("metric").distinct().collect().map(_.getString(0))
      .forall(_.startsWith("m_")))
    assert(samples.filter(col("labels")("user").isNull).count() == 0)
    // one exemplar per (doc, series), trace label resolved
    val exn = parsed.filter(col("is_exemplar"))
    assert(exn.count() ==
      sub.select($"user_id", $"event_type").distinct().count())
    assert(exn.filter(col("ex_labels")("trace").isNull).count() == 0)
  }

  test("RW2.0 span/delta codec: gapped spans and negative start round-trip") {
    import graft.sources.RemoteWrite
    import org.apache.spark.sql.Row
    // buckets at idx [-2, -1, 3, 4, 9]: three spans (first offset
    // NEGATIVE, then gaps 4 and 5), counts delta-coded across all spans
    // schema 0 (base 2): 0.2→idx −2, 0.3/0.4→−1, 5/6→3, 9/9.5→4, 400→9
    val values = Seq(0.2, 0.3, 0.4, 5.0, 6.0, 9.0, 9.5, 400.0)
    val hist = graft.metrics.NativeHistogram.fromSamples(
      values.toDF("value").withColumn("g", lit("m")), Seq("g"), "value", 0)
      .withColumn("sts", lit("2024-01-01 00:00:00").cast("timestamp"))
    val before = hist.select("schema", "count", "sum", "zero_count", "pos", "neg")
      .collect().head
    val back = RemoteWrite.parseV2Hist(RemoteWrite.renderV2Hist(
      hist, lit(1), lit("m"), col("sts")))
    val after = back.select("schema", "count", "sum", "zero_count", "pos", "neg")
      .collect().head
    assert(after == before, s"wire round-trip changed the histogram:\n$before\n$after")
    // the wire really did span-compress: 5 buckets, 3 spans
    val doc = RemoteWrite.renderV2Hist(hist, lit(1), lit("m"), col("sts"))
      .select("json").as[String].collect().head
    assert(doc.contains("\"positiveSpans\":[{"))
    val spans = "\"offset\":".r.findAllIn(doc).length
    assert(spans == 3, s"expected 3 positive spans, got $spans in $doc")
    assert(before.getAs[scala.collection.Seq[Row]]("pos").map(_.getInt(0))
      == Seq(-2, -1, 3, 4, 9))
  }

  test("deltaToCumulative: restart detected across null-start gaps " +
    "(last-known-start semantics, not lag-1)") {
    import graft.sources.Otlp
    // one series, four delta points: start A, then a point that OMITS
    // startTimeUnixNano, then start B (collector restarted), then B again.
    // upstream deltatocumulative tracks the LAST KNOWN start — the third
    // point must reset even though its immediate predecessor's start is
    // null. A lag(1)-only compare silently keeps accumulating.
    val a = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val b = java.sql.Timestamp.valueOf("2024-01-02 00:00:00")
    val rows = Seq(
      (java.sql.Timestamp.valueOf("2024-01-02 01:00:00"), Some(a), 10.0),
      (java.sql.Timestamp.valueOf("2024-01-02 02:00:00"), None: Option[java.sql.Timestamp], 5.0),
      (java.sql.Timestamp.valueOf("2024-01-02 03:00:00"), Some(b), 7.0),
      (java.sql.Timestamp.valueOf("2024-01-02 04:00:00"), Some(b), 2.0))
    val df = rows.toDF("ts", "start_ts", "value")
      .withColumn("kind", lit("sum")).withColumn("temporality", lit(1))
      .withColumn("metric", lit("m"))
    val out = Otlp.deltaToCumulative(df, Seq(col("metric")))
      .orderBy("ts").select("value").as[Double].collect().toSeq
    // pre-restart prefix 10, 15; restart at point 3 → 7, 9
    assert(out == Seq(10.0, 15.0, 7.0, 9.0), out)
    // and a same-start wire never resets (nulls interleaved or not)
    val same = rows.map { case (ts, s, v) => (ts, s.map(_ => a), v) }
      .toDF("ts", "start_ts", "value")
      .withColumn("kind", lit("sum")).withColumn("temporality", lit(1))
      .withColumn("metric", lit("m"))
    val out2 = Otlp.deltaToCumulative(same, Seq(col("metric")))
      .orderBy("ts").select("value").as[Double].collect().toSeq
    assert(out2 == Seq(10.0, 15.0, 22.0, 24.0), out2)
  }
}
