package graft.metrics

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Native-histogram pipeline on hand-computable fixtures: schema-0 bucket
  * math (base 2 — idx i covers (2^(i-1), 2^i]), the two-sided layout with
  * the zero bucket, merge-equals-direct-build, and the mixed-schema
  * downscale rule idx' = ⌈idx / 2^(s−t)⌉. */
class NativeHistogramSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  private def buildOne(values: Seq[Double], schema: Int) =
    NativeHistogram.fromSamples(
      values.toDF("value").withColumn("g", lit("a")), Seq("g"), "value", schema)

  test("schema-0 build: powers of two land on bucket upper bounds") {
    // 1→idx 0 ((0.5,1]), 2→1, 4→2, 8→3
    val h = buildOne(Seq(1.0, 2.0, 4.0, 8.0), 0).collect().head
    assert(h.getAs[Double]("count") == 4.0)
    assert(h.getAs[Double]("sum") == 15.0)
    assert(h.getAs[Double]("zero_count") == 0.0)
    assert(h.getAs[scala.collection.Seq[Row]]("pos").map(b => (b.getInt(0), b.getDouble(1)))
      == Seq((0, 1.0), (1, 1.0), (2, 1.0), (3, 1.0)))
    assert(h.getAs[scala.collection.Seq[Row]]("neg").isEmpty)
  }

  test("two-sided layout: negatives mirror, zeros hit the zero bucket") {
    val h = buildOne(Seq(-4.0, 0.0, 2.0), 0).collect().head
    assert(h.getAs[Double]("zero_count") == 1.0)
    assert(h.getAs[scala.collection.Seq[Row]]("pos").map(_.getInt(0)) == Seq(1))
    assert(h.getAs[scala.collection.Seq[Row]]("neg").map(_.getInt(0)) == Seq(2)) // |-4| ∈ (2,4]
  }

  test("quantile / fraction / stdvar on the schema-0 fixture") {
    val out = buildOne(Seq(1.0, 2.0, 4.0, 8.0), 0).select(
      NativeHistogram.histogramQuantile(0.5).as("p50"),
      NativeHistogram.histogramFraction(1.0, 4.0).as("fr"),
      NativeHistogram.histogramStdvar().as("sv")).collect().head
    // rank 2 lands at the top of bucket (1,2] → exactly 2
    assert(out.getDouble(0) == 2.0)
    // buckets (1,2] and (2,4] fully inside, (0.5,1] and (4,8] contribute 0
    assert(out.getDouble(1) == 0.5)
    // mids 0.75/1.5/3/6 around mean 3.75 → ss 19.6875 → /4
    assert(math.abs(out.getDouble(2) - 4.921875) < 1e-9)
  }

  test("zero bucket participates in the cumulative walk at value 0") {
    val out = buildOne(Seq(-4.0, 0.0, 2.0), 0)
      .select(NativeHistogram.histogramQuantile(0.5)).collect().head
    assert(out.getDouble(0) == 0.0) // rank 1.5 falls in the [0,0] bucket
  }

  test("merge over shards equals the direct build") {
    val df = Seq((1, 1.0), (1, 2.0), (2, 4.0), (2, 8.0), (2, -3.0), (1, 0.0))
      .toDF("shard", "value").withColumn("g", lit("a"))
    val direct = NativeHistogram.fromSamples(df, Seq("g"), "value", 2)
    val merged = NativeHistogram.merge(
      NativeHistogram.fromSamples(df, Seq("g", "shard"), "value", 2), Seq("g"))
    val cols = Seq("schema", "count", "sum", "zero_count", "pos", "neg")
    assert(merged.select("g", cols: _*).collect().toSeq
      == direct.select("g", cols: _*).collect().toSeq)
  }

  test("mixed-schema merge downscales to the coarsest: idx' = ceil(idx/2^(s-t))") {
    val fine = buildOne(Seq(3.0), 2)   // idx = ceil(4·log2 3) = 7
    val coarse = buildOne(Seq(1.5), 0) // idx = 1 ((1,2])
    val m = NativeHistogram.merge(fine.unionByName(coarse), Seq("g")).collect().head
    assert(m.getAs[Int]("schema") == 0)
    // 7 → ceil(7/4) = 2 (3 ∈ (2,4]); 1.5 stays in bucket 1
    assert(m.getAs[scala.collection.Seq[Row]]("pos").map(b => (b.getInt(0), b.getDouble(1)))
      == Seq((1, 1.0), (2, 1.0)))
  }

  test("stage split: bucketCounts on an expression key + assemble = fromSamples") {
    // the s141 streaming shape — stage 1 keyed by a computed (window-like)
    // column, stage 2 assembling the committed partials
    val df = Seq((0, 1.0), (1, 2.0), (5, 4.0), (6, -3.0), (7, 0.0), (9, 8.0))
      .toDF("h", "value")
    val viaStages = NativeHistogram.assemble(
      NativeHistogram.bucketCounts(df,
        Seq((col("h") / 4).cast("int").as("bucket4")), "value", 2),
      Seq("bucket4"), 2)
    val direct = NativeHistogram.fromSamples(
      df.withColumn("bucket4", (col("h") / 4).cast("int")),
      Seq("bucket4"), "value", 2)
    val cols = Seq("bucket4", "schema", "count", "sum", "zero_count", "pos", "neg")
    assert(viaStages.select(cols.map(col): _*).orderBy("bucket4").collect().toSeq
      == direct.select(cols.map(col): _*).orderBy("bucket4").collect().toSeq)
  }

  test("increase: cumulative-histogram diff equals the slice histogram") {
    // cumulative builds at t=1 ({1,2}) and t=2 ({1,2} ∪ {4,8,-2,0}) —
    // the increase must equal fromSamples over the slice alone
    val all = Seq(1.0, 2.0, 4.0, 8.0, -2.0, 0.0)
    val cum = NativeHistogram.fromSamples(
      Seq(1, 2).toDF("t").crossJoin(all.toDF("value"))
        .filter(col("t") === 2 || col("value").isin(1.0, 2.0))
        .withColumn("g", lit("a")),
      Seq("g", "t"), "value", 0)
    val inc = NativeHistogram.increase(cum, Seq("g"), "t").collect().head
    val slice = NativeHistogram.fromSamples(
      Seq(4.0, 8.0, -2.0, 0.0).toDF("value").withColumn("g", lit("a")),
      Seq("g"), "value", 0).collect().head
    for (c <- Seq("count", "sum", "zero_count"))
      assert(inc.getAs[Double](c) == slice.getAs[Double](c), c)
    for (c <- Seq("pos", "neg"))
      assert(inc.getAs[scala.collection.Seq[Row]](c) == slice.getAs[scala.collection.Seq[Row]](c), c)
    assert(inc.getAs[Double]("dt_sec") == 1.0)
  }

  test("increase: a count drop is a reset — the current histogram IS the increase") {
    val h1 = NativeHistogram.fromSamples(
      Seq(1.0, 2.0, 4.0).toDF("value").withColumn("g", lit("a")).withColumn("t", lit(1)),
      Seq("g", "t"), "value", 0)
    val h2 = NativeHistogram.fromSamples(
      Seq(8.0).toDF("value").withColumn("g", lit("a")).withColumn("t", lit(2)),
      Seq("g", "t"), "value", 0)
    val inc = NativeHistogram.increase(h1.unionByName(h2), Seq("g"), "t").collect().head
    assert(inc.getAs[Double]("count") == 1.0)   // restarted counter: h2 alone
    assert(inc.getAs[Double]("sum") == 8.0)
    assert(inc.getAs[scala.collection.Seq[Row]]("pos").map(_.getInt(0)) == Seq(3))
  }

  test("increase: a BUCKET drop with a higher total is still a reset (upstream DetectReset)") {
    // t=1 holds {1,1,2}: bucket idx0 (≤1) cnt=2, idx1 (≤2) cnt=1, total 3.
    // t=2 holds {2,2,4,8}: idx0 ABSENT (dropped 2→0), total 4 > 3 — a
    // restart that re-filled past the old total with a different shape.
    // Total-only detection would subtract and emit a negative idx0; the
    // per-bucket rule must declare a reset: the increase IS h2.
    val h1 = NativeHistogram.fromSamples(
      Seq(1.0, 1.0, 2.0).toDF("value").withColumn("g", lit("a")).withColumn("t", lit(1)),
      Seq("g", "t"), "value", 0)
    val h2 = NativeHistogram.fromSamples(
      Seq(2.0, 2.0, 4.0, 8.0).toDF("value").withColumn("g", lit("a")).withColumn("t", lit(2)),
      Seq("g", "t"), "value", 0)
    val inc = NativeHistogram.increase(h1.unionByName(h2), Seq("g"), "t").collect().head
    assert(inc.getAs[Double]("count") == 4.0) // h2 alone, not h2 − h1
    assert(inc.getAs[Double]("sum") == 16.0)
    assert(inc.getAs[scala.collection.Seq[Row]]("pos").map(r => (r.getInt(0), r.getDouble(1)))
      == Seq((1, 2.0), (2, 1.0), (3, 1.0)))
  }

  test("increase: a zero-count drop alone is a reset") {
    val h1 = NativeHistogram.fromSamples(
      Seq(0.0, 0.0, 1.0).toDF("value").withColumn("g", lit("a")).withColumn("t", lit(1)),
      Seq("g", "t"), "value", 0)
    val h2 = NativeHistogram.fromSamples(
      Seq(0.0, 1.0, 2.0, 4.0).toDF("value").withColumn("g", lit("a")).withColumn("t", lit(2)),
      Seq("g", "t"), "value", 0)
    val inc = NativeHistogram.increase(h1.unionByName(h2), Seq("g"), "t").collect().head
    assert(inc.getAs[Double]("zero_count") == 1.0) // h2 alone (2→1 dropped)
    assert(inc.getAs[Double]("count") == 4.0)
  }

  test("PromQL surface: histogram_* functions parse, print, and evaluate") {
    import PromQlParser._
    // parse + canonical print
    assert(parse("histogram_count(m)") ==
      HistFn("count", Selector(Some("m"), Nil)))
    assert(parse("histogram_fraction(-1, 100, m)") ==
      HistFn("fraction", Selector(Some("m"), Nil), Some(-1.0), Some(100.0)))
    assert(parse("histogram_avg(rate(m[5m]))") ==
      HistFn("avg", RangeFn("rate", Selector(Some("m"), Nil), 300L)))
    assert(PromQlFormat.format("histogram_fraction(-1, 100, rate(m[5m]))") ==
      "histogram_fraction(-1, 100, rate(m[5m]))")

    // two cumulative scrapes of one series: t1 = {1,2}, t2 = {1,2,4,8}
    val cum = NativeHistogram.fromSamples(
      Seq((1, 1.0), (1, 2.0), (2, 1.0), (2, 2.0), (2, 4.0), (2, 8.0))
        .toDF("t", "value")
        .withColumn("ts", timestamp_seconds(
          unix_timestamp(to_timestamp(lit("2024-01-01 00:00:00"))) + col("t"))),
      Seq("ts"), "value", 0).withColumn("m", lit("m"))
    val scalars = Seq(("m", 1.0)).toDF("m", "value")
      .withColumn("ts", to_timestamp(lit("2024-01-01 00:00:02")))
    val src = PromSource(scalars, "m", Seq("m"), "ts", "ts", "value",
      hist = Some(HistBinding(cum, "m", Seq("m"), "ts", "ts")))
    def v(q: String): Double =
      eval(src, q, "2024-01-01 00:00:02").collect().head.getAs[Double]("value")
    assert(v("histogram_count(m)") == 4.0)         // latest cumulative
    assert(v("histogram_sum(m)") == 15.0)
    assert(v("histogram_avg(m)") == 3.75)
    assert(v("histogram_quantile(0.5, m)") == 2.0) // native-routed
    // counter path: the [2s] window holds both scrapes (the strict lower
    // bound would drop t1 from [1s]); increase over (t1, t2] = {4,8}
    assert(v("histogram_count(increase(m[2s]))") == 2.0)
    assert(v("histogram_sum(increase(m[2s]))") == 12.0)
    assert(v("histogram_count(rate(m[2s]))") == 1.0)  // 2 / the 2s window
    // quantile of rate == quantile of increase (scale invariance):
    // {4,8} at schema 0 → rank 1.8 inside bucket (4,8]
    assert(v("histogram_quantile(0.9, rate(m[2s]))") ==
      v("histogram_quantile(0.9, increase(m[2s]))"))

    // without a hist binding the battery fails loudly
    val bare = src.copy(hist = None)
    intercept[IllegalArgumentException](eval(bare, "histogram_count(m)", "2024-01-01 00:00:02"))

    // grid evaluation (round 10): per-step newest histogram — the step
    // AT t1 sees the first scrape, t2 the second; step 0 (no histogram
    // in lookback yet) is absent
    def grid(q: String): Map[Long, Double] =
      evalRange(src, q, "2024-01-01 00:00:00", "2024-01-01 00:00:02", 1L)
        .collect()
        .map(r => (r.getAs[java.sql.Timestamp]("step_ts").getTime / 1000) % 60 ->
          r.getAs[Double]("value")).toMap
    assert(grid("histogram_count(m)") == Map(1L -> 2.0, 2L -> 4.0))
    assert(grid("histogram_sum(m)") == Map(1L -> 3.0, 2L -> 15.0))
    assert(grid("histogram_quantile(0.5, m)") == Map(1L -> 1.0, 2L -> 2.0))
    // counter form on the grid: only the step whose [2s] window holds
    // BOTH scrapes carries an increase
    assert(grid("histogram_count(increase(m[2s]))") == Map(2L -> 2.0))
    assert(grid("histogram_count(rate(m[2s]))") == Map(2L -> 1.0))
  }

  test("empty histogram: quantile and fraction are NaN, out-of-range phi pins") {
    val out = buildOne(Seq(0.0), 0).select(
      // count is 1 (the zero obs) — use phi pins; a truly empty group
      // can't exist post-groupBy, so NaN is exercised via count=0 filter
      NativeHistogram.histogramQuantile(-0.1).as("lo"),
      NativeHistogram.histogramQuantile(1.1).as("hi")).collect().head
    assert(out.getDouble(0).isNegInfinity && out.getDouble(1).isPosInfinity)
  }

  // ---------- NHCB conversion battery (custom buckets, 3.x) ----------

  private val nhcbBounds = Seq(1.0, 5.0, 10.0)

  private def nhcbOf(rows: Seq[(String, Double)]) = {
    val df = rows.toDF("g", "value")
    NativeHistogram.fromClassicCumulative(
      NativeHistogram.classicCumulativeDense(df, Seq("g"), "value", nhcbBounds),
      Seq("g"))
  }

  test("NHCB conversion: dense classic cumulative → sparse custom buckets") {
    // values 0.5, 3, 3, 20 → buckets: (−inf,1]=1, (1,5]=2, (5,10]=0, (10,+inf)=1
    val h = nhcbOf(Seq("a" -> 0.5, "a" -> 3.0, "a" -> 3.0, "a" -> 20.0))
      .collect().head
    assert(h.getAs[Int]("schema") == NativeHistogram.CustomBucketSchema)
    assert(h.getAs[Double]("count") == 4.0)
    assert(h.getAs[scala.collection.Seq[Double]]("custom_values") == nhcbBounds)
    // empty (5,10] bucket dropped; +Inf bucket is idx = |custom_values| = 3
    assert(h.getAs[scala.collection.Seq[Row]]("pos")
      .map(b => (b.getInt(0), b.getDouble(1))) == Seq((0, 1.0), (1, 2.0), (3, 1.0)))
  }

  test("NHCB merge over shards ≡ direct conversion of the union") {
    val rows = (1 to 40).map(i => (s"s${i % 4}", (i % 13).toDouble + 0.5))
    val df = rows.toDF("shard", "value").withColumn("g", lit("m"))
    val sharded = NativeHistogram.fromClassicCumulative(
      NativeHistogram.classicCumulativeDense(
        df, Seq("g", "shard"), "value", nhcbBounds), Seq("g", "shard"))
    val merged = NativeHistogram.mergeCustom(sharded, Seq("g")).collect().head
    val direct = NativeHistogram.fromClassicCumulative(
      NativeHistogram.classicCumulativeDense(df, Seq("g"), "value", nhcbBounds),
      Seq("g")).collect().head
    assert(merged.getAs[Double]("count") == direct.getAs[Double]("count"))
    assert(merged.getAs[scala.collection.Seq[Double]]("custom_values")
      == direct.getAs[scala.collection.Seq[Double]]("custom_values"))
    assert(merged.getAs[scala.collection.Seq[Row]]("pos")
      == direct.getAs[scala.collection.Seq[Row]]("pos"))
  }

  test("NHCB merge with mismatched bucket layouts fails loudly") {
    val a = NativeHistogram.fromClassicCumulative(
      NativeHistogram.classicCumulativeDense(
        Seq(("m", 2.0)).toDF("g", "value"), Seq("g"), "value", Seq(1.0, 5.0)),
      Seq("g"))
    val b = NativeHistogram.fromClassicCumulative(
      NativeHistogram.classicCumulativeDense(
        Seq(("m", 2.0)).toDF("g", "value"), Seq("g"), "value", Seq(1.0, 9.0)),
      Seq("g"))
    val e = intercept[Exception] {
      NativeHistogram.mergeCustom(a.unionByName(b), Seq("g")).collect()
    }
    assert(e.getMessage.contains("mismatched custom bucket layouts") ||
      String.valueOf(e.getCause).contains("mismatched custom bucket layouts"))
  }

  test("NHCB quantile: classic interpolation rules on a hand fixture") {
    // buckets (−inf,1]=2, (1,5]=2, (5,10]=0, +Inf=1; n=5
    val h = nhcbOf(Seq("a" -> 0.2, "a" -> 0.8, "a" -> 2.0, "a" -> 4.0,
      "a" -> 42.0))
    val out = h.select(
      NativeHistogram.nhcbQuantile(0.2).as("q20"),  // first bucket: lower=0
      NativeHistogram.nhcbQuantile(0.6).as("q60"),  // second: interp 1..5
      NativeHistogram.nhcbQuantile(0.95).as("q95")  // +Inf bucket → 10.0
    ).collect().head
    // q20: rank 1 in bucket (0,1], cnt 2 → 0 + 1*(1/2) = 0.5
    assert(out.getDouble(0) == 0.5)
    // q60: rank 3, prevcum 2, bucket (1,5] cnt 2 → 1 + 4*(1/2) = 3.0
    assert(out.getDouble(1) == 3.0)
    // q95: rank 4.75 > cum of last finite (4) → highest finite bound
    assert(out.getDouble(2) == 10.0)
  }
}
