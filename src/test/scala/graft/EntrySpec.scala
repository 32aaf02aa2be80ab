package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract smoke: entry returns rows; every declared query runs and
  * every oracle key has a matching query (t1/t2 shape checks). */
class EntrySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("entry returns >0 rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a declared query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("approx_count_distinct within rsd bounds of exact (E18)") {
    import org.apache.spark.sql.functions._
    val li = Tables.lineitem(spark, TestSpark.SF)
    val r = li.agg(
      approx_count_distinct(col("l_partkey"), 0.02).as("approx"),
      countDistinct(col("l_partkey")).as("exact")).collect()(0)
    val (approx, exact) = (r.getLong(0).toDouble, r.getLong(1).toDouble)
    assert(math.abs(approx - exact) / exact < 0.1, s"approx=$approx exact=$exact")
  }

  test("all batch queries run and return schema'd results on sf0.001") {
    val failures = SparkEntry.queries.toSeq
      .filterNot(_._1.startsWith("s")) // streaming smoked in StreamSpec
      .flatMap { case (name, fn) =>
        try {
          val df = fn(spark, TestSpark.SF)
          assert(df.schema.fields.nonEmpty)
          df.count(); None
        } catch { case e: Throwable => Some(s"$name: ${e.getMessage.take(120)}") }
      }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("eventsRange ts bounds reach the parquet scan as PushedFilters (P14)") {
    val df = Tables.eventsRange(spark, TestSpark.SF, "2024-01-10", "2024-01-20")
    assert(df.count() > 0)
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters") &&
           scan.contains("GreaterThanOrEqual(ts") && scan.contains("LessThan(ts"),
      s"ts range not pushed down:\n${scan.take(2500)}")
  }
}
