package graft.anomaly

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scaler invariants (SURVEY §5.2 item 3). */
class ScalersSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  private def ev = graft.Tables.events(spark, graft.TestSpark.SF)

  test("minmax output within [0,1]; min 0 and max 1 attained per key") {
    val fit = Scalers.minMaxFit(ev, Seq("event_type"), "value")
    val stats = Scalers.minMaxApply(ev, fit, Seq("event_type"), "value")
      .groupBy($"event_type")
      .agg(min($"scaled").as("mn"), max($"scaled").as("mx")).collect()
    stats.foreach { r =>
      assert(r.getAs[Double]("mn") == 0.0 && r.getAs[Double]("mx") == 1.0)
    }
  }

  test("minmax degenerate range maps to 0.0") {
    val df = Seq(("k", 5.0), ("k", 5.0)).toDF("g", "v")
    val fit = Scalers.minMaxFit(df, Seq("g"), "v")
    val out = Scalers.minMaxApply(df, fit, Seq("g"), "v").select($"scaled").collect()
    assert(out.forall(_.getDouble(0) == 0.0))
  }

  test("zscore clipped to [-3, 3]") {
    val fit = Scalers.zScoreFit(ev, Seq("event_type"), "value")
    val out = Scalers.zScoreApply(ev, fit, Seq("event_type"), "value")
      .agg(min($"zscore"), max($"zscore")).collect()(0)
    assert(out.getDouble(0) >= -3.0 && out.getDouble(1) <= 3.0)
  }

  test("scrub maps NaN/Inf to 0.0, keeps finite and null") {
    val df = Seq(Some(Double.NaN), Some(Double.PositiveInfinity),
      Some(Double.NegativeInfinity), Some(2.5), None).toDF("v")
    val out = df.select(Scalers.scrub($"v").as("s")).collect()
    assert(out(0).getDouble(0) == 0.0 && out(1).getDouble(0) == 0.0 &&
      out(2).getDouble(0) == 0.0 && out(3).getDouble(0) == 2.5 && out(4).isNullAt(0))
  }

  test("Pipeline.score: full windows only, scores bounded, config filter applied") {
    val out = Pipeline.score(ev, PipelineConfig(metricFilter = Seq("error", "click")))
    assert(out.select($"event_type").distinct().collect()
      .map(_.getString(0)).toSet == Set("error", "click"))
    assert(out.filter($"roll_cnt" =!= 12).count() == 0)
    val mm = out.agg(min($"score"), max($"score")).collect()(0)
    assert(mm.getDouble(0) >= 0.0 && mm.getDouble(1) <= 10.0)
  }

  test("tanhNorm bounded [0,10] (saturating) and non-decreasing") {
    val df = Seq(0.0, 0.1, 0.5, 1.0, 2.0, 10.0, 100.0).toDF("x")
    val out = df.select(AnomalyOps.tanhNorm($"x").as("t")).collect().map(_.getDouble(0))
    assert(out.forall(t => t >= 0.0 && t <= 10.0))
    assert(out.sliding(2).forall { case Array(a, b) => a <= b })
    assert(out(1) > out(0) && out(4) > out(3)) // strictly increasing pre-saturation
  }
}
