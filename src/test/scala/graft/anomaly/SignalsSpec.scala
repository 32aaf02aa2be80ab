package graft.anomaly

import graft.TestSpark
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Seasonal-baseline + CUSUM semantics (q177/q178's scalatest face). */
class SignalsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("CUSUM prefix-sum identity equals the recursive definition") {
    // S_i = max(0, S_{i-1} + d_i)  vs  S_i = C_i - min(0, min_{j<=i} C_j)
    val devs = Seq(1.0, -3.0, 2.0, 2.0, -1.0, 4.0, -10.0, 3.0)
    val recursive = devs.scanLeft(0.0)((s, d) => math.max(0.0, s + d)).tail
    val df = devs.zipWithIndex.map { case (d, i) => (i, d) }.toDF("i", "d")
    val w = Window.orderBy(col("i"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val got = df
      .withColumn("c", sum(col("d").cast("decimal(18,6)")).over(w))
      .withColumn("minc", least(min(col("c")).over(w),
        lit(0).cast("decimal(18,6)")))
      .withColumn("s", (col("c") - col("minc")).cast("double"))
      .orderBy(col("i")).select(col("s")).collect().map(_.getDouble(0)).toSeq
    assert(got == recursive)
  }

  test("seasonal profile z-scores flag the injected outlier hour") {
    // 14 training days with cnt=10 ± alternating 1 at hod 0; test day has
    // a 30-count spike → |z| huge; a 10-count hour → |z| small
    val rows =
      (1 to 14).map(day => (f"2024-01-$day%02d 00:00:00",
        if (day % 2 == 0) 11 else 9)) ++
        Seq(("2024-01-15 00:00:00", 30))
    val df = rows.toDF("hs", "cnt")
      .select(to_timestamp(col("hs")).as("h"), col("cnt"))
    val train = df.filter(col("h") < lit("2024-01-15").cast("timestamp"))
      .agg(count(lit(1)).as("n"), sum(col("cnt")).as("s"),
        sum(col("cnt") * col("cnt")).as("ss"))
      .withColumn("mu", col("s").cast("double") / col("n"))
      .withColumn("sigma", sqrt(col("ss").cast("double") / col("n") -
        (col("s").cast("double") / col("n")) * (col("s").cast("double") / col("n"))))
      .head()
    val (mu, sigma) = (train.getAs[Double]("mu"), train.getAs[Double]("sigma"))
    assert(mu == 10.0 && sigma == 1.0)
    assert(math.abs((30 - mu) / sigma) == 20.0)
  }
}
