package graft.metrics

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the Gorilla/XOR bit accounting against hand-computed encodings
  * of tiny series (xor.go semantics: zigzag varint t₀/Δ₁, dod buckets,
  * 1-bit zero XOR, window reuse `10`+meaningful, new window
  * `11`+5+6+meaningful). */
class GorillaSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  test("DoubleBits is the raw IEEE-754 bit pattern") {
    val r = Seq(8.0, 9.0, 0.0, -2.0).toDF("v")
      .select(graft.functions.VectorFunctions.doubleBits(col("v")).as("b"))
      .collect().map(_.getLong(0))
    assert(r(0) == java.lang.Double.doubleToRawLongBits(8.0))
    assert(r(1) == 0x4022000000000000L)
    assert(r(2) == 0L)
    assert(r(3) == java.lang.Double.doubleToRawLongBits(-2.0))
  }

  test("encodeStats matches a hand-encoded chunk (zero-xor + new window)") {
    // ts 0/60s/120s/180s (1m grid), values 8,8,9,9:
    //   ts: uvarint(0)=8b, uvarint(2*60000)=24b, dod=0 → 1b, 1b  = 34
    //   v:  64 + 1 (xor=0) + 14 (8^9: 13+1 sigbit) + 1 (xor=0)   = 80
    val df = Seq((0L, 1L, 8.0), (60000L, 2L, 8.0), (120000L, 3L, 9.0),
      (180000L, 4L, 9.0)).toDF("t_ms", "oid", "v").withColumn("m", lit("s"))
    val r = Gorilla.encodeStats(df, Seq("m"), "t_ms", "oid", "v").collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("n_samples") == 4L)
    assert(row.getAs[Long]("ts_bits") == 34L)
    assert(row.getAs[Long]("val_bits") == 80L)
    assert(row.getAs[Long]("n_xor_zero") == 2L)
    assert(row.getAs[Long]("n_new_window") == 1L)
    assert(row.getAs[Long]("n_window_reuse") == 0L)
  }

  test("window reuse fires when the new XOR fits the previous window") {
    // values 5,6,7: 5^6 = 0x000C… (lz 12, tz 50, sig 2 → 15 bits, new
    // window); 6^7 = 2^50 (lz 13 ≥ 12, tz 50 ≥ 50 → reuse, 2+2 bits)
    val df = Seq((0L, 1L, 5.0), (60000L, 2L, 6.0), (120000L, 3L, 7.0))
      .toDF("t_ms", "oid", "v").withColumn("m", lit("s"))
    val row = Gorilla.encodeStats(df, Seq("m"), "t_ms", "oid", "v")
      .collect().head
    assert(row.getAs[Long]("val_bits") == 64L + 15L + 4L)
    assert(row.getAs[Long]("n_new_window") == 1L)
    assert(row.getAs[Long]("n_window_reuse") == 1L)
  }

  test("chunks cut at chunkSize and restart the codec state") {
    // 5 samples, chunkSize 3 → chunks of 3 and 2; each restarts with a
    // full 64-bit value and a varint t₀
    val df = (0 until 5).map(i => (i * 60000L, i.toLong, 4.0))
      .toDF("t_ms", "oid", "v").withColumn("m", lit("s"))
    val r = Gorilla.encodeStats(df, Seq("m"), "t_ms", "oid", "v", chunkSize = 3)
      .orderBy("chunk").collect()
    assert(r.length == 2)
    assert(r(0).getAs[Long]("n_samples") == 3L)
    assert(r(1).getAs[Long]("n_samples") == 2L)
    // constant value: every non-first sample costs 1 bit
    assert(r(0).getAs[Long]("val_bits") == 64L + 2L)
    assert(r(1).getAs[Long]("val_bits") == 64L + 1L)
  }
}
