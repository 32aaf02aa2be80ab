package graft.anomaly

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Nonlinear-P6 semantics (q268/s269 carry the hash-green oracle; this
  * spec pins the claim the oracle can't express): the saturating
  * autoencoder catches the anomaly class PCA's off-subspace error is
  * PROVABLY blind to — an outlier far ALONG the learned axis.
  */
class AeSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  // Fixture geometry (dim 12): normal windows sit in two clusters on the
  // all-ones axis around m = 10: x_c = 10 + c·1 with c ∈ ±[0.9, 1.1].
  // The planted anomaly is x = 10 + 5·1 — exactly ON that axis, just far
  // out. PCA (k=1) learns the all-ones axis and reconstructs the anomaly
  // PERFECTLY (residual ~0): invisible. The AE's hidden units saturate at
  // |a| ≥ 1.5, so its decoder can only reproduce the manifold edge (±~1
  // in standardized units) — the anomaly reconstructs to the edge and
  // scores ~(5−1)²·12 ≈ 190.
  private val dim = 12
  private val cs = Seq(0.9, 0.95, 1.0, 1.05, 1.1)
  private lazy val normals: Seq[Seq[Double]] =
    cs.flatMap(c => Seq(Seq.fill(dim)(10.0 + c), Seq.fill(dim)(10.0 - c)))
  private lazy val anomaly: Seq[Double] = Seq.fill(dim)(15.0)
  private lazy val train = normals.map(("cpu", _)).toDF("event_type", "win_arr")

  test("phi: odd, saturating cubic soft clip, exact endpoints") {
    val xs = Seq(-3.0, -1.5, -1.0, -0.5, 0.0, 0.5, 1.0, 1.5, 3.0)
    val got = xs.toDF("x").select(Ae.phi(col("x"))).as[Double].collect().toSeq
    assert(got(1) == -1.0 && got(7) == 1.0 && got(4) == 0.0) // φ(±1.5), φ(0)
    assert(got.head == -1.0 && got.last == 1.0)              // clamped
    // odd symmetry and monotonicity
    assert(got.zip(got.reverse).forall { case (a, b) => a == -b })
    assert(got.sliding(2).forall { case Seq(a, b) => a <= b })
    // interior value exact: φ(1) = 1 − 4/27
    assert(math.abs(got(6) - (1.0 - 4.0 / 27.0)) < 1e-15)
  }

  test("fit: one model per key; sigma=0 keys dropped; gains finite") {
    val degenerate = Seq.fill(8)(("flat", Seq.fill(dim)(7.0)))
      .toDF("event_type", "win_arr")
    val model = Ae.fit(train.union(degenerate), Seq("event_type"), "win_arr", dim)
    val rows = model.collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("cpu")) // flat dropped
    val gain = rows.head.getAs[scala.collection.Seq[scala.collection.Seq[Double]]]("gain")
    assert(gain.length == Ae.K && gain.forall(_.length == dim))
    assert(gain.flatten.forall(g => !g.isNaN && !g.isInfinite))
  }

  test("planted ON-AXIS anomaly: huge AE error, zero PCA error") {
    val score = (normals :+ anomaly).zipWithIndex
      .map { case (v, i) => (i.toLong, "cpu", v) }
      .toDF("id", "event_type", "win_arr")
    val aeModel = Ae.fit(train, Seq("event_type"), "win_arr", dim)
    val aeScored = Ae.score(score, aeModel, Seq("event_type"), "win_arr", dim)
      .select($"id", $"recon_err").as[(Long, Double)].collect()
    val pcaModel = Pca.fit(train, "event_type", "win_arr", dim, k = 1)
    val pcaScored = Pca.reconstructionError(score, pcaModel, "event_type", "win_arr")
      .select($"id", $"recon_err").as[(Long, Double)].collect()
    val anomId = normals.length.toLong
    val aeAnom = aeScored.find(_._1 == anomId).get._2
    val aeNormMax = aeScored.filter(_._1 != anomId).map(_._2).max
    val pcaAnom = pcaScored.find(_._1 == anomId).get._2
    // AE separates by >100×: saturation bounds the reconstruction range
    assert(aeAnom > 50.0, s"AE anomaly err $aeAnom too small")
    assert(aeAnom > 100 * math.max(aeNormMax, 1e-9),
      s"no AE separation: $aeAnom vs max normal $aeNormMax")
    // PCA is BLIND: the anomaly lies exactly on the principal axis, so
    // its off-subspace residual is numerically zero
    assert(pcaAnom < 1e-12, s"PCA unexpectedly saw the on-axis anomaly: $pcaAnom")
  }

  test("streaming face scores identically to batch (same model, same rows)") {
    // the s269 parity claim at unit grain: score() over the same window
    // frame is deterministic — run twice, bit-identical
    val aeModel = Ae.fit(train, Seq("event_type"), "win_arr", dim)
    val once = Ae.score(train, aeModel, Seq("event_type"), "win_arr", dim)
      .select("recon_err").as[Double].collect().toSeq.sorted
    val twice = Ae.score(train, aeModel, Seq("event_type"), "win_arr", dim)
      .select("recon_err").as[Double].collect().toSeq.sorted
    assert(once == twice)
    assert(once.forall(e => e >= 0 && !e.isNaN))
  }
}
