package graft.metrics

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins ha_tracker election semantics on hand-built arrival sequences:
  * first-sender election, rejection inside the failover window, failover
  * after silence, and the MID-RUN failover split (only the suffix of a
  * challenger run past last_seen+timeout is accepted) that the
  * run-compression must get right. Failover timeout = 30 s. */
class HaTrackerSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  /** rows: (replica, tSec, ord); one cluster "c". Returns
    * (elected_final, n_elections, n_accepted, n_rejected, sum_accepted). */
  private def run(rows: Seq[(String, Long, Long)]): (String, Long, Long, Long, Double) = {
    val df = rows.map { case (r, t, o) => ("c", r, t * 1000000L, t, o, o.toDouble) }
      .toDF("cluster", "replica", "t_us", "t", "ord", "v")
    val out = HaTracker.dedupStats(df, "cluster", "replica", "t_us", "t",
      "ord", "v", failoverSec = 30L).collect()
    assert(out.length == 1)
    val r = out.head
    (r.getAs[String]("elected_final"), r.getAs[Long]("n_elections"),
      r.getAs[Long]("n_accepted"), r.getAs[Long]("n_rejected"),
      r.getAs[Double]("sum_accepted"))
  }

  test("first sender is elected; challengers inside the window are rejected") {
    val (el, ne, na, nr, sum) = run(Seq(
      ("r1", 0L, 1L), ("r2", 10L, 2L), ("r1", 20L, 3L), ("r2", 25L, 4L)))
    assert(el == "r1" && ne == 1L && na == 2L && nr == 2L)
    assert(sum == 4.0) // ords 1 + 3
  }

  test("failover after elected silence; election count increments") {
    val (el, ne, na, nr, _) = run(Seq(
      ("r1", 0L, 1L), ("r2", 40L, 2L), ("r2", 50L, 3L), ("r1", 60L, 4L)))
    // r1 elected at 0; r2 at 40 is 40s past r1's last seen -> elected;
    // r1 at 60 is only 10s past r2's last seen (50) -> rejected
    assert(el == "r2" && ne == 2L && na == 3L && nr == 1L)
  }

  test("mid-run failover accepts only the suffix past last_seen+timeout") {
    val (el, ne, na, nr, sum) = run(Seq(
      ("r1", 0L, 1L),
      ("r2", 20L, 2L), ("r2", 29L, 3L), ("r2", 31L, 4L), ("r2", 35L, 5L)))
    // r2's run: t=20,29 within 30s of r1@0 -> rejected; t=31 crosses ->
    // elected from there; t=35 accepted as elected
    assert(el == "r2" && ne == 2L && na == 3L && nr == 2L)
    assert(sum == 1.0 + 4.0 + 5.0)
  }

  test("elected replica's own samples always refresh last-seen") {
    val (el, ne, na, nr, _) = run(Seq(
      ("r1", 0L, 1L), ("r1", 25L, 2L), ("r1", 50L, 3L),
      ("r2", 60L, 4L), // only 10s past r1@50 -> rejected
      ("r2", 81L, 5L))) // 31s past r1@50 -> failover
    assert(el == "r2" && ne == 2L && na == 4L && nr == 1L)
  }
}
