package graft.metrics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TSDB tombstones — Prometheus's deferred-deletion contract
  * (`/api/v1/admin/tsdb/delete_series` + `clean_tombstones`; see
  * prometheus/tsdb/tombstones): a delete request records label matchers
  * plus a [mint, maxt] interval; reads MASK tombstoned samples until a
  * compaction/clean pass physically rewrites the blocks.
  *
  * Spark-first shape: a tombstone set compiles to ONE boolean Column —
  * an OR of per-tombstone (matchers AND interval) conjunctions — so the
  * masked read is a plain `filter(!deleted)` that Catalyst folds into
  * the scan (equality matchers and ts bounds reach PushedFilters when
  * they sit on stored columns). `clean` is the same predicate applied as
  * a physical rewrite of the day-partitioned block store: at 100 TB only
  * partitions that can contain a tombstoned interval rewrite; the rest
  * move untouched (here: rewritten by partition pruning on block_day).
  */
object Tombstones {

  /** One delete request: equality/regex matchers over label columns and
    * a closed-open [mintMs, maxtMs) epoch-ms interval. */
  final case class Tombstone(matchers: Seq[(String, String, String)],
                             mintMs: Long, maxtMs: Long)

  /** Compile the tombstone set to a "this sample is deleted" predicate.
    * `tsMs` is the sample timestamp in epoch-ms; matcher ops are `=`,
    * `!=`, and `=~` (full-anchor regex, the PromQL contract). */
  def deletedPredicate(ts: Seq[Tombstone], tsMs: Column): Column =
    ts.foldLeft(lit(false)) { (acc, t) =>
      val m = t.matchers.foldLeft(lit(true)) { case (a, (label, op, v)) =>
        op match {
          case "="  => a && col(label).cast("string") === v
          case "=~" => a && (PromQlParser.literalAlternatives(v) match {
            // same IN-list fast path as the selector compiler — a
            // deletion mask rides the scan too
            case Some(alts) => col(label).cast("string").isin(alts: _*)
            case None => col(label).cast("string").rlike("^(?:" + v + ")$")
          })
          case "!=" => a && col(label).cast("string") =!= v
          case other => throw new IllegalArgumentException(
            s"unsupported tombstone matcher op: $other")
        }
      }
      acc || (m && tsMs >= t.mintMs && tsMs < t.maxtMs)
    }

  /** Masked read: drop samples covered by any tombstone. */
  def mask(samples: DataFrame, ts: Seq[Tombstone], tsCol: String): DataFrame =
    samples.filter(
      !deletedPredicate(ts, expr(s"unix_micros($tsCol) div 1000")))

  /** Physical rewrite (`clean_tombstones`): apply the mask to a
    * day-partitioned block store and write the surviving samples to
    * `outDir` with the same layout. Returns (kept, dropped) counts. */
  def clean(spark: SparkSession, blocksDir: String, outDir: String,
            ts: Seq[Tombstone], tsCol: String = "ts"): (Long, Long) = {
    val in = spark.read.parquet(blocksDir)
    val total = in.count()
    val kept = mask(in, ts, tsCol)
    kept.repartition(col("block_day"))
      .write.mode("overwrite").partitionBy("block_day").parquet(outDir)
    val k = spark.read.parquet(outDir).count()
    (k, total - k)
  }
}
