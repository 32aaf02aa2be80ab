package graft.metrics

import graft.TestSpark
import graft.functions.{DoubleFromBits, VectorFunctions, XorChunk}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** XOR chunk codec: roundtrip on adversarial fixtures, and byte-length
  * equality against the independently-committed Gorilla bit-cost model
  * (two implementations, one answer). */
class XorChunkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def bits(d: Double): Long = java.lang.Double.doubleToRawLongBits(d)

  private def roundtrip(samples: Array[(Long, Long)]): Unit = {
    val dec = XorChunk.decode(XorChunk.encode(samples))
    assert(dec.toSeq == samples.toSeq)
  }

  test("roundtrip: empty, single, constant, and adversarial chunks") {
    roundtrip(Array.empty)
    roundtrip(Array((1700000000123L, bits(42.5))))
    roundtrip(Array.tabulate(120)(i => (1700000000000L + i * 15000L, bits(7.0))))
    // dod bucket edges: 0, ±8191/8192, ±65535/65536, ±524287/524288, huge
    val ts = Array(0L, 10L, 20L, 30L + 8192L, 40L + 8192L - 8191L)
    val vs = ts.map(t => bits(t.toDouble))
    roundtrip(ts.zip(vs))
    val jumps = Array(0L, 1000L, 2000L + 65536L, 3000L + 65536L - 65535L,
      4000L + 65536L + 524288L, 5000L + 65536L + 524288L + 10000000L)
    roundtrip(jumps.zip(jumps.map(t => bits(t * 1.5))))
    // value-side: sign flips (lz=0), tiny denormals (tz spread), NaN bits,
    // exact repeats, full 64-significant-bit XORs
    val vals = Array(1.5, -1.5, 1.5, Double.MinPositiveValue, 0.0, -0.0,
      Double.NaN, Double.MaxValue, 1.0e-300, 1.0e300, 3.14159, 3.14159)
    roundtrip(vals.zipWithIndex.map { case (v, i) => (i * 1000L, bits(v)) })
    // negative timestamps (pre-epoch) through the zigzag varints
    roundtrip(Array((-5000L, bits(1.0)), (-4000L, bits(2.0)), (-2999L, bits(3.0))))
  }

  test("encoded length equals the Gorilla cost model on real data") {
    val ev = graft.Tables.events(spark, TestSpark.SF)
      .select(col("event_type"),
        expr("unix_micros(ts) div 1000").as("t_ms"),
        col("event_id"),
        round(col("value")).as("v"))
    val model = Gorilla.encodeStats(ev, Seq("event_type"), "t_ms", "event_id", "v")
      .select(col("event_type"), col("chunk"),
        expr("(16 + ts_bits + val_bits + 7) div 8").as("expect_bytes"))
    val chunked = ev
      .withColumn("b", VectorFunctions.doubleBits(col("v").cast("double")))
      .withColumn("seq", expr(
        "row_number() over (partition by event_type order by t_ms, event_id) - 1"))
      .withColumn("chunk", expr("seq div 120"))
      .groupBy("event_type", "chunk")
      .agg(sort_array(collect_list(struct(col("t_ms").as("t"),
        col("event_id").as("o"), col("b")))).as("arr"))
      .withColumn("samples", expr("transform(arr, x -> struct(x.t as t, x.b as b))"))
      .withColumn("enc", XorChunk.encodeCol(col("samples")))
      .withColumn("dec", XorChunk.decodeCol(col("enc")))
      .withColumn("actual_bytes", length(col("enc")).cast("long"))
      .withColumn("rt_ok", col("dec") === col("samples"))
    val joined = chunked.join(model, Seq("event_type", "chunk")).cache()
    val n = joined.count()
    assert(n > 0)
    assert(joined.filter(!col("rt_ok")).count() == 0, "roundtrip mismatch")
    assert(joined.filter(col("actual_bytes") =!= col("expect_bytes")).count() == 0,
      "codec bytes diverge from the cost model")
    joined.unpersist()
  }

  test("DoubleFromBits inverts DoubleBits including NaN payloads") {
    val df = Seq(1.5, -0.0, Double.NaN, Double.MaxValue, 1e-320).toDF("v")
      .withColumn("b", VectorFunctions.doubleBits(col("v")))
      .withColumn("v2", DoubleFromBits(col("b")))
      .withColumn("b2", VectorFunctions.doubleBits(col("v2")))
    assert(df.filter(col("b") =!= col("b2")).count() == 0)
  }
}
