package graft.queries

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The q65 scale guard (round-13 verdict's one flagged shape): within-label
  * near-dup pairing must never go quadratic on a hot label. Pins BOTH
  * halves of [[ExtraQueries.boundedLabelPairs]]:
  *   - small buckets: exactly the all-pairs set (q65's oracle semantics);
  *   - buckets over the cap: sorted-neighborhood fan-out ≤ n·w, LINEAR in
  *     the bucket — plus the recall property the trade-off buys (rows
  *     adjacent in projection order do pair).
  */
class NearDupGuardSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Synthetic embeddings: `n` rows under one label, dim-4 float vectors
    * whose direction varies smoothly with id (so projection order is
    * meaningful). */
  private def synth(label: Int, n: Int, idBase: Long) = {
    (0 until n).map { i =>
      val t = i.toDouble / n
      (label, idBase + i, Array(1.0f, t.toFloat, (t * t).toFloat, 0.5f))
    }.toDF("label", "vec_id", "embedding")
  }

  test("small buckets: exact all-pairs, id1 < id2, nothing dropped") {
    val e = synth(1, 10, 0) unionByName synth(2, 7, 100)
    val pairs = ExtraQueries.boundedLabelPairs(e, cap = 1024, w = 8)
      .select($"label", $"id1", $"id2").collect()
    assert(pairs.length == 10 * 9 / 2 + 7 * 6 / 2)
    assert(pairs.forall(r => r.getLong(1) < r.getLong(2)))
    // the exact set, not just the count
    val got = pairs.map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    val want = (for { a <- 0 until 10; b <- a + 1 until 10 } yield (1, a.toLong, b.toLong)).toSet ++
      (for { a <- 0 until 7; b <- a + 1 until 7 } yield (2, 100L + a, 100L + b)).toSet
    assert(got == want)
  }

  test("hot bucket: fan-out is n*w-bounded, never quadratic") {
    val n = 2000; val cap = 1024; val w = 64
    val e = synth(9, n, 0)
    val cnt = ExtraQueries.boundedLabelPairs(e, cap, w).count()
    // sorted-neighborhood exact count: each of the first n-w rows pairs
    // with w successors; the tail pairs with fewer
    val expected = (0 until n).map(i => math.min(w, n - 1 - i)).sum.toLong
    assert(cnt == expected)
    assert(cnt < n.toLong * (n - 1) / 2 / 10, "must be far below all-pairs")
    assert(cnt <= n.toLong * w)
  }

  test("hot bucket: projection-adjacent rows do pair (the recall half)") {
    val n = 1200; val w = 16
    val e = synth(3, n, 0)
    val pairs = ExtraQueries.boundedLabelPairs(e, cap = 1024, w = w)
      .select($"id1", $"id2").as[(Long, Long)].collect().toSet
    // vectors here are monotone in id along the projection direction, so
    // id-adjacent rows are projection-adjacent: every (i, i+1) must pair
    assert((0 until n - 1).forall(i => pairs.contains((i.toLong, i.toLong + 1))))
    // and id1 < id2 is preserved on the windowed path too
    assert(pairs.forall { case (a, b) => a < b })
  }

  test("mixed frame: exact and guarded paths compose per label") {
    val e = synth(1, 20, 0) unionByName synth(2, 1500, 10000)
    val byLabel = ExtraQueries.boundedLabelPairs(e, cap = 1024, w = 32)
      .groupBy($"label").agg(count(lit(1)).as("n")).as[(Int, Long)]
      .collect().toMap
    assert(byLabel(1) == 20L * 19 / 2) // exact path
    assert(byLabel(2) == (0 until 1500).map(i => math.min(32, 1499 - i)).sum.toLong)
  }
}
