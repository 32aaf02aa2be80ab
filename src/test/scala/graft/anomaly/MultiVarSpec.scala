package graft.anomaly

import graft.stream.StreamOps
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** Multivariate co-windowing (the reference's 2-D [w × n_features] window
  * payload): batch semantics pinned on a hand-built frame, streaming ≡
  * batch parity over the test events, and the multivariate PCA contract
  * (a planted cross-feature anomaly out-scores every clean window). */
class MultiVarSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  private def ts(h: Int, m: Int = 0) =
    java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")

  test("coWindowMat: last-per-step, carry-forward, warm-up exclusion, row/feature order") {
    val ev = Seq(
      (1L, ts(10), 1L, "a", 1.0),  // b unseen yet → warm-up, no row
      (2L, ts(11), 1L, "b", 2.0),  // step 11:00 …
      (3L, ts(11, 30), 1L, "b", 5.0), // … last-per-step wins → b = 5
      (4L, ts(13), 1L, "a", 3.0),  // b carries forward (5)
      (5L, ts(10), 2L, "a", 9.0))  // user 2 never sees b → nothing
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = MultiVar.coWindowMat(ev, "user_id", "ts", "event_id",
        "event_type", "value", Seq("a", "b"), w = 2)
      .select($"user_id", $"end_ts", $"mat").collect()
    assert(out.length == 1) // only user 1's second complete step fills w=2
    val r = out.head
    assert(r.getLong(0) == 1L && r.getTimestamp(1) == ts(13))
    val mat = r.getAs[scala.collection.Seq[scala.collection.Seq[Double]]](2)
      .map(_.toList).toList
    // oldest row first; each row in (a, b) feature order
    assert(mat == List(List(1.0, 5.0), List(3.0, 5.0)))
  }

  test("coWindowStream ≡ coWindowMat on the test events (3-chunk replay, per-user flush)") {
    val features = Seq("click", "view", "purchase")
    val streamed = StreamOps.replayEvents(spark, graft.TestSpark.SF,
        "t_multivar", 3, flushPerUser = true)(
        ds => StreamOps.coWindowStream(ds, features, 4).toDF(),
        OutputMode.Append)
      .select($"user_id", $"end_ts", flatten($"mat").as("flat"))
    val batch = MultiVar.coWindowMat(
        graft.Tables.events(spark, graft.TestSpark.SF),
        "user_id", "ts", "event_id", "event_type", "value", features, 4)
      .select($"user_id", $"end_ts", flatten($"mat").as("flat"))
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
    assert(batch.count() > 0) // parity of empties would prove nothing
  }

  test("multivariate PCA: planted cross-feature anomaly out-scores clean windows") {
    // clean windows live on the b = 2a line in every row — rank-1 after
    // centering, so k=1 reconstructs them (near-)exactly; the planted
    // window breaks the correlation in its second row only, which no
    // univariate per-feature view can separate this cleanly
    val clean = (1 to 20).map { i =>
      val x = i.toDouble
      ("all", Seq(Seq(x, 2 * x), Seq(x + 1, 2 * (x + 1))), false)
    }
    val planted = Seq(("all", Seq(Seq(10.0, 20.0), Seq(11.0, 2.0)), true))
    val wins = (clean ++ planted).toDF("mkey", "mat", "is_planted")
    val models = MultiVar.fitMat(wins, "mkey", "mat", w = 2, nFeatures = 2, k = 1)
    val scored = MultiVar.reconstructionError(wins, models, "mkey", "mat")
      .select($"is_planted", $"recon_err").collect()
    val plantedErr = scored.filter(_.getBoolean(0)).map(_.getDouble(1)).head
    val maxClean = scored.filterNot(_.getBoolean(0)).map(_.getDouble(1)).max
    assert(plantedErr > 10 * maxClean,
      s"planted $plantedErr vs max clean $maxClean")
  }
}
