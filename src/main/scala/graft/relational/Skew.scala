package graft.relational

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

  /** Write both sides bucketed on the join key: repeated joins then read
    * pre-shuffled data (no Exchange on the bucketed key). Spark bucketing
    * requires saveAsTable; `database.table` naming left to the caller. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)
}
