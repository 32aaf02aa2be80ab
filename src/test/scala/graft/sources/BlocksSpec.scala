package graft.sources

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Backfill block store: day layout on disk, plan-time partition
  * pruning, and read-back fidelity. */
class BlocksSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("backfill writes day dirs; day read prunes partitions at plan time") {
    val ev = Tables.events(spark, TestSpark.SF)
      .filter(col("ts") >= lit("2024-01-11").cast("timestamp") &&
        col("ts") < lit("2024-01-14").cast("timestamp"))
      .select(col("event_id"), col("ts"), col("event_type"), col("value"))
    val dir = java.nio.file.Files.createTempDirectory("blocks_spec").toString
    Blocks.backfill(ev, dir)
    val days = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("block_day=")).map(_.getName).sorted
    assert(days.toSeq == Seq("block_day=2024-01-11", "block_day=2024-01-12",
      "block_day=2024-01-13"))
    val one = Blocks.read(spark, dir, "2024-01-12", "2024-01-12")
    assert(one.count() == ev.filter(
      col("ts") >= lit("2024-01-12").cast("timestamp") &&
        col("ts") < lit("2024-01-13").cast("timestamp")).count())
    val plan = one.queryExecution.executedPlan.toString
    val pf = plan.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(pf.contains("block_day"), s"day bound not a partition filter:\n$pf")
    // the day predicate must NOT degrade into a row-level data filter
    assert(!plan.contains("PushedFilters: [IsNotNull(block_day)"),
      "block_day leaked into data filters")
  }
}
