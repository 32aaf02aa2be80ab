package graft.metrics

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Extended range selectors (`anchored`/`smoothed`, Prometheus 3.5
  * experimental): the canonical constant-rate example — a counter
  * increasing by exactly 6 per minute, window boundaries BETWEEN samples
  * — must yield rate EXACTLY 0.1 in both modes (the feature's design
  * goal: no extrapolation guesswork), plus the reset and missing-anchor
  * edges. */
class ExtendedRangeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fixture(rows: Seq[(Long, Double)]) =
    rows.zipWithIndex.map { case ((tSec, v), i) =>
      ("s1", new java.sql.Timestamp(tSec * 1000L), i.toLong, v)
    }.toDF("series", "ts", "event_id", "v")

  private def run(rows: Seq[(Long, Double)], startSec: Long, endSec: Long,
                  mode: String, isCounter: Boolean = true,
                  isRate: Boolean = true): Option[Double] = {
    val out = PromQl.extendedRange(fixture(rows), Seq("series"), "ts",
        "event_id", "v", startSec * 1000000L, endSec * 1000000L,
        mode, isCounter, isRate)
      .collect()
    out.headOption.map(_.getAs[Double]("value"))
  }

  test("constant-rate counter: both modes give exactly 0.1, no extrapolation") {
    // samples at 0/60/120/180s, +6 each: boundaries 30..90 straddle samples
    val rows = Seq(0L -> 0.0, 60L -> 6.0, 120L -> 12.0, 180L -> 18.0)
    assert(run(rows, 30, 90, "anchored").contains(0.1))
    assert(run(rows, 30, 90, "smoothed").contains(0.1))
    // increase over the 60s window is exactly 6
    assert(run(rows, 30, 90, "anchored", isRate = false).contains(6.0))
    assert(run(rows, 30, 90, "smoothed", isRate = false).contains(6.0))
  }

  test("anchored holds the last sample at/before each boundary") {
    // boundary exactly ON a sample: anchored takes it (<=, not <)
    val rows = Seq(0L -> 0.0, 60L -> 6.0, 120L -> 12.0)
    assert(run(rows, 60, 120, "anchored", isRate = false).contains(6.0))
    // no left anchor (first sample inside): falls back to first in-window
    val noPre = Seq(40L -> 4.0, 60L -> 6.0, 120L -> 12.0)
    assert(run(noPre, 30, 120, "anchored", isRate = false).contains(8.0))
  }

  test("smoothed interpolates on the reset-adjusted scale through a reset") {
    // reset between 60 and 120 (6 -> 2): adj chain 0, 6, 8, 14
    val rows = Seq(0L -> 0.0, 60L -> 6.0, 120L -> 2.0, 180L -> 8.0)
    // vStart at 30 = interp(0,6) = 3; vEnd at 90 = interp(adj 6, adj 8) = 7
    assert(run(rows, 30, 90, "smoothed", isRate = false).contains(4.0))
    // anchored: vStart = adj(0) = 0, vEnd = adj(60) = 6
    assert(run(rows, 30, 90, "anchored", isRate = false).contains(6.0))
  }

  test("smoothed right edge without a post sample uses the last in-window value") {
    val rows = Seq(0L -> 0.0, 60L -> 6.0, 90L -> 9.0)
    // vStart = interp at 30 = 3; vEnd = last in-window (9) — no extrapolation
    assert(run(rows, 30, 120, "smoothed", isRate = false).contains(6.0))
  }

  test("gauge delta interpolates raw values (no reset chain)") {
    val rows = Seq(0L -> 10.0, 60L -> 4.0, 120L -> 8.0)
    // raw interp: vStart at 30 = 7; vEnd at 90 = 6 -> delta -1
    assert(run(rows, 30, 90, "smoothed", isCounter = false,
      isRate = false).contains(-1.0))
  }

  test("empty window or single-sample fetch yields no row") {
    assert(run(Seq(0L -> 1.0, 200L -> 2.0), 30, 90, "anchored").isEmpty)
    assert(run(Seq(40L -> 1.0), 30, 90, "anchored").isEmpty)
  }
}
