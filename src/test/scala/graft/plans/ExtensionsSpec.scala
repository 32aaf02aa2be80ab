package graft.plans

import graft.GraftExtensions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SparkSessionExtensions surface (E51 stretch): the date_trunc-equality →
  * range rewrite must (a) preserve results exactly, (b) reach the parquet
  * scan as pushed filters, (c) leave misaligned/non-UTC-unsafe shapes
  * alone semantically. */
class ExtensionsSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  private lazy val path = {
    val p = "/tmp/graft_ext_trunc.parquet"
    spark.range(0, 96)
      .selectExpr("id", "timestampadd(HOUR, CAST(id AS INT), TIMESTAMP '2024-01-10 00:00:00') AS ts")
      .write.mode("overwrite").parquet(p)
    p
  }

  test("date_trunc = literal rewrites to a parquet-pushable range with equal results") {
    GraftExtensions.install(spark)
    val df = spark.read.parquet(path)
    val viaTrunc = df.filter(date_trunc("day", $"ts") === lit("2024-01-11").cast("timestamp"))
    val viaRange = df.filter($"ts" >= lit("2024-01-11").cast("timestamp") &&
      $"ts" < lit("2024-01-12").cast("timestamp"))
    assert(viaTrunc.count() === 24)
    assert(viaTrunc.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      viaRange.select("id").collect().map(_.getLong(0)).sorted.toSeq)
    val physical = viaTrunc.queryExecution.executedPlan.toString
    assert(physical.contains("GreaterThanOrEqual(ts") && physical.contains("LessThan(ts"),
      s"expected pushed ts range in:\n$physical")
  }

  test("misaligned literal folds to an empty range, not a wrong one") {
    GraftExtensions.install(spark)
    val df = spark.read.parquet(path)
    val misaligned = df.filter(
      date_trunc("day", $"ts") === lit("2024-01-11 07:30:00").cast("timestamp"))
    assert(misaligned.count() === 0)
  }

  test("vec_* SQL functions resolve via the extension registration") {
    GraftExtensions.install(spark)
    val r = spark.sql(
      "SELECT vec_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c, " +
        "vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d, " +
        "vec_norm(array(3.0D, 4.0D)) AS n").collect()(0)
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(r.getDouble(1) - 11.0) < 1e-12)
    assert(math.abs(r.getDouble(2) - 5.0) < 1e-12)
  }
}
