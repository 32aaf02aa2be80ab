package graft.anomaly

import org.scalacheck.{Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** One-pass threshold-fit Aggregator (E49): numeric parity with the naive
  * two-pass formulas plus merge associativity (the property that makes
  * map-side partial aggregation correct at scale). */
class ThresholdSpec extends AnyFunSuite {

  private def naive(xs: Seq[Double]): (Double, Double) = {
    val m = xs.sum / xs.size
    val v = xs.map(x => (x - m) * (x - m)).sum / (xs.size - 1)
    (m, math.sqrt(v))
  }

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  test("buffer add matches naive mean/std") {
    check(Prop.forAll(org.scalacheck.Gen.nonEmptyListOf(org.scalacheck.Gen.choose(-1e3, 1e3))) { xs =>
      val b = xs.foldLeft(StdDevBuf(0, 0, 0))(_.add(_))
      val (m, s) = naive(xs)
      math.abs(b.mean - m) < 1e-8 &&
        (xs.size < 2 || math.abs(b.stddevSamp.get - s) < 1e-6)
    })
  }

  test("merge of split buffers equals sequential buffer") {
    check(Prop.forAll(
      org.scalacheck.Gen.nonEmptyListOf(org.scalacheck.Gen.choose(-1e3, 1e3)),
      org.scalacheck.Gen.nonEmptyListOf(org.scalacheck.Gen.choose(-1e3, 1e3))) { (a, b) =>
      val seq = (a ++ b).foldLeft(StdDevBuf(0, 0, 0))(_.add(_))
      val merged = a.foldLeft(StdDevBuf(0, 0, 0))(_.add(_))
        .merge(b.foldLeft(StdDevBuf(0, 0, 0))(_.add(_)))
      merged.n == seq.n &&
        math.abs(merged.mean - seq.mean) < 1e-8 &&
        math.abs(merged.m2 - seq.m2) < 1e-4
    })
  }

  test("threshold = mean + k*std, score clipped to [0, limit]") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val df = Seq(1.0, 2.0, 3.0, 4.0, 100.0).toDF("v").withColumn("k", org.apache.spark.sql.functions.lit("a"))
    val fit = Threshold.fit(df, Seq("k"), "v", 3.0).collect()(0)
    val (m, s) = naive(Seq(1.0, 2.0, 3.0, 4.0, 100.0))
    assert(math.abs(fit.getAs[Double]("threshold") - (m + 3 * s)) < 1e-6)
    val scored = df.select(Threshold.score($"v" * 100, org.apache.spark.sql.functions.lit(fit.getAs[Double]("threshold"))).as("s"))
      .collect().map(_.getDouble(0))
    assert(scored.forall(x => x >= 0.0 && x <= 10.0))
  }

  test("singleton group fits NULL std/threshold, and fallback takes static path") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    // key "solo" has n=1 → stddev_samp undefined → std/threshold NULL
    // (not NaN: NaN is non-null and would win the coalesce against the
    // static limit, poisoning every downstream score for that key).
    val df = Seq(("solo", 5.0), ("pair", 1.0), ("pair", 3.0)).toDF("k", "v")
    val fit = Threshold.fit(df, Seq("k"), "v", 3.0)
    val solo = fit.filter($"k" === "solo").collect()(0)
    assert(solo.isNullAt(solo.fieldIndex("std")) && solo.isNullAt(solo.fieldIndex("threshold")))
    val scored = graft.registry.ModelRegistry.scoreWithFallback(
      df, fit.select($"k", $"threshold"), Seq("k"), "v", 10.0)
    val bySrc = scored.collect().map(r => r.getAs[String]("k") -> r.getAs[String]("model_source")).toMap
    assert(bySrc("solo") == "static" && bySrc("pair") == "fitted")
    assert(!scored.collect().exists(r => r.getAs[Double]("score").isNaN))
  }

  test("builtin fit matches the typed-Aggregator fit (schema and values)") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.5), ("b", 7.0), ("b", 9.0), ("solo", 4.0))
      .toDF("k", "v")
    val agg = Threshold.fit(df, Seq("k"), "v", 3.0).orderBy($"k").collect()
    val blt = Threshold.fitBuiltin(df, Seq("k"), "v", 3.0).orderBy($"k").collect()
    assert(agg.map(_.schema.fieldNames.toSeq).toSeq == blt.map(_.schema.fieldNames.toSeq).toSeq)
    agg.zip(blt).foreach { case (x, y) =>
      // columns: k, mean, std, n, threshold
      assert(x.getString(0) == y.getString(0) && x.getLong(3) == y.getLong(3))
      Seq(1, 2, 4).foreach { i =>
        assert(x.isNullAt(i) == y.isNullAt(i))
        if (!x.isNullAt(i)) assert(math.abs(x.getDouble(i) - y.getDouble(i)) < 1e-9)
      }
    }
  }

  test("NaN threshold in an external registry row routes to static path") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val facts = Seq(("a", 5.0)).toDF("k", "v")
    val models = Seq(("a", Double.NaN)).toDF("k", "threshold")
    val scored = graft.registry.ModelRegistry.scoreWithFallback(facts, models, Seq("k"), "v", 10.0)
    val row = scored.collect()(0)
    assert(row.getAs[String]("model_source") == "static")
    assert(math.abs(row.getAs[Double]("score") - 0.5) < 1e-6)
  }
}
