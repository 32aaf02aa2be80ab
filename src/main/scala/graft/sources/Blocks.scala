package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Backfill blocks — the `promtool tsdb create-blocks-from openmetrics`
  * contract, Spark-native: a parsed sample frame is written as
  * TIME-PARTITIONED parquet (one `block_day=` directory per UTC day, the
  * analogue of a 2h-aligned TSDB block at warehouse grain), and reads
  * carry a day-range predicate that Spark resolves at PLAN time into
  * partition pruning — a query over one day of a 100 TB backfill lists
  * one directory and never opens the rest (the `PartitionFilters` face,
  * pinned in SourcesSpec/BlocksSpec).
  */
object Blocks {

  /** Write samples as a day-partitioned block store. Repartitions by the
    * partition column first so each day writes from its own tasks (no
    * small-file explosion: tasks × days files otherwise). */
  def backfill(samples: DataFrame, dir: String, tsCol: String = "ts"): Unit = {
    samples
      .withColumn("block_day", date_format(col(tsCol), "yyyy-MM-dd"))
      .repartition(col("block_day"))
      .write.mode("overwrite").partitionBy("block_day").parquet(dir)
  }

  /** Read a day range [fromDay, toDay] (inclusive, `yyyy-MM-dd`); the
    * filter lands in PartitionFilters, not a data scan. */
  def read(spark: SparkSession, dir: String, fromDay: String,
           toDay: String): DataFrame =
    spark.read.parquet(dir)
      .filter(col("block_day") >= fromDay && col("block_day") <= toDay)
}
