package graft.metrics

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the tombstone predicate compiler: matcher ops (=, !=, =~ with
  * full anchoring), closed-open ms intervals, OR across tombstones, and
  * the clean() physical rewrite equaling the masked read. */
class TombstonesSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark
  import spark.implicits._
  import Tombstones.Tombstone

  private def df = Seq(
    ("cpu", "a", "2024-01-01 10:00:00.000", 1.0),
    ("cpu", "b", "2024-01-01 10:00:00.000", 2.0),
    ("mem", "a", "2024-01-02 10:00:00.000", 3.0),
    ("mem", "ab", "2024-01-03 10:00:00.000", 4.0))
    .toDF("metric", "inst", "tss", "value")
    .withColumn("ts", col("tss").cast("timestamp")).drop("tss")

  private def ms(s: String): Long =
    java.time.Instant.parse(s).toEpochMilli

  test("equality matcher masks only inside the closed-open interval") {
    val t = Seq(Tombstone(Seq(("metric", "=", "cpu")),
      ms("2024-01-01T00:00:00Z"), ms("2024-01-02T00:00:00Z")))
    val kept = Tombstones.mask(df, t, "ts").select("metric", "inst")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(kept == Set(("mem", "a"), ("mem", "ab")))
  }

  test("regex matcher is fully anchored; != composes") {
    // =~ "a" must NOT match inst "ab"
    val t = Seq(Tombstone(Seq(("inst", "=~", "a"), ("metric", "!=", "cpu")),
      Long.MinValue / 4, Long.MaxValue / 4))
    val kept = Tombstones.mask(df, t, "ts")
      .select("metric", "inst").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    // only (mem, a) deleted: anchored regex spares "ab", != spares cpu
    assert(kept == Set(("cpu", "a"), ("cpu", "b"), ("mem", "ab")))
  }

  test("tombstones OR together; clean() rewrite equals the masked read") {
    val ts = Seq(
      Tombstone(Seq(("metric", "=", "cpu")),
        Long.MinValue / 4, Long.MaxValue / 4),
      Tombstone(Seq(("inst", "=", "ab")),
        Long.MinValue / 4, Long.MaxValue / 4))
    val masked = Tombstones.mask(df, ts, "ts")
    assert(masked.count() == 1L) // only (mem, a) survives
    val base = java.nio.file.Files.createTempDirectory("graft_tomb").toString
    val out = java.nio.file.Files.createTempDirectory("graft_tomb_out").toString
    df.withColumn("block_day", date_format(col("ts"), "yyyy-MM-dd"))
      .write.mode("overwrite").partitionBy("block_day").parquet(base)
    val (kept, dropped) = Tombstones.clean(spark, base, out, ts)
    assert(kept == 1L && dropped == 3L)
    assert(spark.read.parquet(out).select("metric").collect()
      .map(_.getString(0)).toSeq == Seq("mem"))
  }

  test("unsupported matcher op raises") {
    intercept[IllegalArgumentException] {
      Tombstones.deletedPredicate(
        Seq(Tombstone(Seq(("m", "!~", "x")), 0L, 1L)), lit(0L))
    }
  }
}
