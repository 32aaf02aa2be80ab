package graft.anomaly

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Trained-P6 semantics (q98 is declared rows-only, so this spec IS its
  * correctness contract): per-key PCA fit + reconstruction-error scoring,
  * including the case the rolling-mean proxy provably cannot see.
  */
class PcaSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  // Fixture geometry (dim 4): normal windows live on the 1-D subspace
  // spanned by u = (1, -1, 1, -1) around mean m = (10, 10, 10, 10):
  //   v_c = m + c·u,  c ∈ [-3, 3]
  // u is ZERO-SUM, so every normal window's per-window mean is exactly 10
  // regardless of c. The planted anomaly adds d = (3, 3, -3, -3):
  // also zero-sum (same window mean → invisible to the mean proxy) and
  // d ⊥ u (u·d = 0 → maximally off the learned subspace).
  private val u = Seq(1.0, -1.0, 1.0, -1.0)
  private val m = Seq(10.0, 10.0, 10.0, 10.0)
  private val d = Seq(3.0, 3.0, -3.0, -3.0)
  private def normal(c: Double): Seq[Double] =
    m.indices.map(i => m(i) + c * u(i))
  private val anomaly: Seq[Double] = m.indices.map(i => m(i) + d(i))

  private lazy val normals = (0 until 50).map(i => ("cpu", normal(-3.0 + i * 6.0 / 49)))
  private lazy val train = normals.toDF("event_type", "win_arr")

  test("fit: one model per key, k orthonormal principal axes of length dim") {
    val model = Pca.fit(train, "event_type", "win_arr", dim = 4, k = 2)
    val rows = model.collect()
    assert(rows.length == 1)
    val pcs = rows.head.getAs[scala.collection.Seq[scala.collection.Seq[Double]]]("pcs")
    assert(pcs.length == 2 && pcs.forall(_.length == 4))
    pcs.foreach { p =>
      val norm = math.sqrt(p.map(x => x * x).sum)
      assert(math.abs(norm - 1.0) < 1e-9, s"axis not unit-norm: $norm")
    }
    // the top axis must recover u (up to sign)
    val top = pcs.head
    val cos = top.zip(u).map { case (a, b) => a * b }.sum /
      math.sqrt(u.map(x => x * x).sum)
    assert(math.abs(math.abs(cos) - 1.0) < 1e-6, s"top axis missed u: $cos")
  }

  test("planted off-subspace anomaly out-scores all normals; mean proxy is blind to it") {
    val score = (normals :+ (("cpu", anomaly))).zipWithIndex
      .map { case ((k, v), i) => (i.toLong, k, v) }
      .toDF("id", "event_type", "win_arr")
    val model = Pca.fit(train, "event_type", "win_arr", dim = 4, k = 1)
    val scored = Pca.reconstructionError(score, model, "event_type", "win_arr")
      .select($"id", $"recon_err",
        // the rolling-mean proxy: |element − window mean| summed — the
        // engine's baseline P6 (AnomalyOps.reconstructionError vs mean)
        aggregate($"win_arr", lit(0.0), (s, x) => s + x)./(lit(4.0)).as("win_mean"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val (anomRows, normRows) = scored.partition(_._1 == 50L)
    val anomErr = anomRows.head._2
    val maxNormErr = normRows.map(_._2).max
    // PCA separates: ‖d‖² = 36 vs ~0 residual for on-subspace vectors
    assert(anomErr > 30.0, s"anomaly err $anomErr too small")
    assert(anomErr > 100 * math.max(maxNormErr, 1e-9),
      s"no separation: anomaly $anomErr vs max normal $maxNormErr")
    // the mean proxy sees NOTHING: every window (incl. the anomaly) has
    // the identical window mean, so |value − mean|-style scores can't
    // rank the anomaly above the c=±3 normals.
    val means = scored.map(_._3)
    assert(means.forall(mn => math.abs(mn - 10.0) < 1e-9))
  }

  test("model registry round-trip: save/load parquet preserves scoring") {
    val model = Pca.fit(train, "event_type", "win_arr", dim = 4, k = 1)
    val dir = java.nio.file.Files.createTempDirectory("pca-reg").toString
    graft.registry.ModelRegistry.save(
      model.withColumn("trained_at", lit("2024-01-01").cast("timestamp")), dir)
    val loaded = graft.registry.ModelRegistry.load(spark, dir)
    val resolved = graft.registry.ModelRegistry.latestAsOf(
      loaded, Seq("event_type"), lit("2024-06-01").cast("timestamp"))
    val df = Seq(("cpu", anomaly)).toDF("event_type", "win_arr")
    val direct = Pca.reconstructionError(df, model, "event_type", "win_arr")
      .select("recon_err").head().getDouble(0)
    val viaReg = Pca.reconstructionError(df, resolved, "event_type", "win_arr")
      .select("recon_err").head().getDouble(0)
    assert(math.abs(direct - viaReg) < 1e-12)
  }
}
