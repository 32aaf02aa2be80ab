package graft

import org.apache.spark.sql.SparkSession

/** Dev-loop timing harness: time individual declared queries by name at the
  * bench scale factor, twice each (cold + warm), mirroring Bench's session
  * config. Usage: `sbt "runMain graft.TimeQ q71_langid q72_ann_ivf"`. */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    try spark.read.parquet(s"$sfDir/region.parquet").count()
    catch { case _: Throwable => () }
    args.foreach { name =>
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val n = SparkEntry.queries(name)(spark, sfDir).count()
        CacheBag.drain()
        println(f"[timeq] $name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
      }
    }
    spark.stop()
  }
}
