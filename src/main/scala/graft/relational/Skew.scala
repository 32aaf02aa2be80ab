package graft.relational

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Skew and co-location utilities (SURVEY §7.3 risk 7 / SCALE.md).
  *
  * AQE's skew-join split handles most runtime skew; explicit salting is the
  * escape hatch when one join key dominates so heavily that even split
  * partitions exceed executor memory (the "celebrity key" shape). Bucketing
  * co-locates repeat fact⋈fact joins so the shuffle happens once at write
  * time instead of per query.
  */
object Skew {

  /** Salted equi-join for a skewed fact⋈dim join: fact rows fan out over
    * `saltBuckets` deterministic salts (derived from `saltSource`, any
    * column unique-ish per row); the dim side replicates `saltBuckets`
    * times. Result is row-identical to the direct join, but the heavy key's
    * rows spread across `saltBuckets` reducers.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 saltSource: Column, saltBuckets: Int): DataFrame = {
    val salted = fact.withColumn("__salt", pmod(hash(saltSource), lit(saltBuckets)))
    val replicated = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Salted rolling window for a MONSTER series (SCALE.md "key salting +
    * window re-merge"): a per-series rows-frame window normally shuffles
    * the whole series into ONE task — unsplittable even by AQE. This form
    * slices each series by an event-time expression (`sliceCol`, e.g.
    * `date_trunc("week", ts)`) so every window shuffle is keyed by
    * (series, slice), then replays each slice's last `w−1` rows into the
    * NEXT slice as overlap so frames that straddle the boundary still see
    * their predecessors. Overlap rows complete other rows' frames but emit
    * no output themselves; rows with fewer than `w` predecessors overall
    * (series head) drop out — exactly the direct window's `size == w`
    * filter — so the output is ROW-IDENTICAL to the unsalted window.
    *
    * Precondition: every non-first slice's PREVIOUS slice holds ≥ w−1 rows
    * (pick a slice width ≫ w × sampling interval); otherwise a boundary
    * frame would be incomplete and dropped where the direct form keeps it.
    *
    * Emits `win_arr` (the ordered w-frame) for surviving rows. */
  def slicedRollingWindows(df: DataFrame, keys: Seq[String], ts: String,
                           tiebreak: String, value: String, w: Int,
                           sliceCol: Column, sliceStep: String): DataFrame = {
    val sliced = df.withColumn("__slice", sliceCol)
    val kcols = keys.map(col)
    val wTail = Window.partitionBy(kcols :+ col("__slice"): _*)
      .orderBy(col(ts).desc, col(tiebreak).desc)
    val overlap = sliced.withColumn("__rn", row_number().over(wTail))
      .filter(col("__rn") <= w - 1).drop("__rn")
      .withColumn("__slice", col("__slice") + expr(s"INTERVAL $sliceStep"))
      .withColumn("__ovl", lit(true))
    val unioned = sliced.withColumn("__ovl", lit(false)).unionByName(overlap)
    val wFrame = Window.partitionBy(kcols :+ col("__slice"): _*)
      .orderBy(col(ts), col(tiebreak)).rowsBetween(-(w - 1), Window.currentRow)
    unioned.withColumn("win_arr", collect_list(col(value)).over(wFrame))
      .filter(!col("__ovl") && size(col("win_arr")) === w)
      .drop("__ovl")
  }

  /** Write both sides bucketed on the join key: repeated joins then read
    * pre-shuffled data (no Exchange on the bucketed key). Spark bucketing
    * requires saveAsTable; `database.table` naming left to the caller. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)
}
