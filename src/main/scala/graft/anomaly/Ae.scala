package graft.anomaly

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** True P6: a nonlinear AUTOENCODER scored per key — the reference's
  * inference vertex ran a real AE per composite key
  * (`reference/CHANGELOG.md:139` inference, `:309` trainers); [[Pca]] is
  * its linear stand-in. This is the nonlinear face, built so the WHOLE
  * computation — training included — is exactly reproducible in a SQL
  * oracle (the q177/q178 decimal-routing discipline):
  *
  *  - **Fixed topology** dim-12 → 4 → 12: the encoder is a deterministic
  *    Haar-like bank (mean / trend / high-freq / mid-freq rows, entries
  *    ±0.25), NOT data-fitted — the "fixed random projection + trained
  *    readout" scheme (an extreme-learning-machine / reservoir
  *    autoencoder). What IS trained per key, in closed form, is the
  *    standardization (μ, σ), the hidden-unit statistics (h̄_j, var h_j),
  *    and the per-(coordinate, unit) decoder gains v_ij = cov(z_i, h_j)
  *    / var(h_j) — a bounded deterministic routine, no iteration.
  *  - **Exact nonlinearity**: φ(t) = t·(1 − (4/27)·t²) on |t| ≤ 1.5,
  *    clamped to ±1 outside — the classic cubic soft clipper (saturating,
  *    odd, tanh-shaped; φ(±1.5) = ±1 with φ′(±1.5) = 0). Unlike tanh it
  *    uses only IEEE ·/− (correctly rounded, bit-identical in Spark and
  *    DuckDB), so the oracle needs no transcendental-identity splices.
  *  - **Decimal-routed training sums**: every cross-row moment (Σh_j,
  *    Σh_j², Σz_i·h_j, Σz_i) is a 6-dp-rounded DECIMAL sum — exact and
  *    addition-order-proof, so a 1000-executor shuffle and DuckDB's
  *    single thread produce the same model bit for bit. Per-row folds
  *    (the 12-element dot products) are fixed-order double math, the
  *    s60/q41 list_sum precedent.
  *
  * Why this catches what PCA cannot: PCA's reconstruction error measures
  * only OFF-subspace distance — a point far along a principal axis is
  * invisible. The AE's hidden units SATURATE (|h| ≤ 1), so its
  * reconstruction range is bounded: an on-axis outlier reconstructs to
  * the edge of the learned manifold and scores huge (pinned in AeSpec's
  * planted-anomaly test, the PcaSpec pattern).
  *
  * Scale shape (the [[Pca]] three-stage discipline): stage A and B are
  * each ONE grouped aggregation on the model key (map-side partials, one
  * shuffle; output n_keys × ~70 decimals — driver-free, the model stays
  * a DataFrame); stage C broadcasts the tiny model frame back and scores
  * map-side at fact grain. At 100 TB the two aggs are the whole job.
  */
object Ae {

  /** Hidden width — fixed topology (dim-12 → 4 → 12). */
  val K = 4

  /** The fixed Haar-like encoder bank W1[j][i], j < K, i < dim:
    * mean, trend (first half vs second), alternating, quarters. */
  def bank(dim: Int): Seq[Seq[Double]] = Seq(
    Seq.fill(dim)(0.25),
    (0 until dim).map(i => if (i < dim / 2) 0.25 else -0.25),
    (0 until dim).map(i => if (i % 2 == 0) 0.25 else -0.25),
    (0 until dim).map(i => if ((i / (dim / 4)) % 2 == 0) 0.25 else -0.25))

  /** Cubic soft clip φ(t): t ≤ −1.5 → −1, t ≥ 1.5 → 1, else
    * t − (4/27)t³. Only IEEE ·,−,compare — exact cross-engine. */
  def phi(t: Column): Column =
    when(t <= lit(-1.5), lit(-1.0))
      .when(t >= lit(1.5), lit(1.0))
      .otherwise(t - (lit(4.0) / lit(27.0)) * t * t * t)

  /** The same φ as DuckDB SQL over expression `t` (evaluated once via a
    * LATERAL-free repeat — callers should bind `t` to a column name). */
  def phiSql(t: String): String =
    s"(CASE WHEN ($t) <= -1.5 THEN -1.0 WHEN ($t) >= 1.5 THEN 1.0 " +
      s"ELSE ($t) - (4.0/27.0) * ($t) * ($t) * ($t) END)"

  private def dec6(c: Column): Column = round(c, 6).cast("decimal(18,6)")

  /** Pre-activation a_j = W1[j]·z as a fixed-order fold over the
    * standardized window array (left fold i=1..dim — the same
    * association SQL's left-assoc `+` chain produces). */
  private def preact(zArr: Column, w: Seq[Double]): Column = {
    val wLit = array(w.map(lit): _*)
    aggregate(zip_with(zArr, wLit, (z, c) => z * c), lit(0.0), (s, v) => s + v)
  }

  /** Standardized window: z_i = (x_i − μ)/σ. */
  private def zArr(vec: Column, mu: Column, sigma: Column): Column =
    transform(vec, x => (x - mu) / sigma)

  /** FIT — two grouped aggregations on `keyCols`, no driver round-trip.
    * Returns one row per key: n, mu, sigma, zbar (array dim), hbar /
    * varh (array K), gain (array K of array dim). Keys whose value
    * distribution is constant (σ = 0) are dropped (nothing to encode —
    * the q177 σ>0 discipline). */
  def fit(windows: DataFrame, keyCols: Seq[String], vecCol: String,
          dim: Int): DataFrame = {
    require(dim % 4 == 0, s"fixed topology needs dim % 4 == 0, got $dim")
    val keys = keyCols.map(col)
    val w1 = bank(dim)
    // stage A: scalar standardization moments over all window elements
    val rowSum = aggregate(col(vecCol), lit(0.0), (s, v) => s + v)
    val rowSq = aggregate(col(vecCol), lit(0.0), (s, v) => s + v * v)
    val statsA = windows.groupBy(keys: _*)
      .agg(count(lit(1)).as("n"),
        sum(dec6(rowSum)).as("sv"), sum(dec6(rowSq)).as("svv"))
      .withColumn("mu", col("sv").cast("double") / (col("n") * dim))
      .withColumn("sigma",
        sqrt(col("svv").cast("double") / (col("n") * dim) -
          col("mu") * col("mu")))
      .filter(col("sigma") > 0)
      .select(keys :+ col("mu") :+ col("sigma"): _*)
    // stage B: hidden activations per row, decimal moments per key
    val withH = windows
      .join(broadcast(statsA), keyCols)
      .withColumn("__z", zArr(col(vecCol), col("mu"), col("sigma")))
    val hCols = (0 until K).map(j => phi(preact(col("__z"), w1(j))))
    val momentAggs: Seq[Column] =
      (0 until K).map(j => sum(dec6(hCols(j))).as(s"sh_$j")) ++
        (0 until K).map(j => sum(dec6(hCols(j) * hCols(j))).as(s"shh_$j")) ++
        (0 until dim).map(i =>
          sum(dec6(element_at(col("__z"), i + 1))).as(s"sz_$i")) ++
        (for { i <- 0 until dim; j <- 0 until K } yield
          sum(dec6(element_at(col("__z"), i + 1) * hCols(j)))
            .as(s"szh_${i}_$j"))
    val m = withH.groupBy((keys :+ col("mu") :+ col("sigma")): _*)
      .agg(count(lit(1)).as("n"), momentAggs: _*)
    // closed-form readout: hbar, varh, zbar, gains — all fixed-order
    // double math over the exact decimal moments
    val nD = col("n").cast("double")
    val hbar = (0 until K).map(j => col(s"sh_$j").cast("double") / nD)
    val varh = (0 until K).map(j =>
      col(s"shh_$j").cast("double") / nD - hbar(j) * hbar(j))
    val zbar = (0 until dim).map(i => col(s"sz_$i").cast("double") / nD)
    val gain = (0 until K).map { j =>
      array((0 until dim).map { i =>
        val cov = col(s"szh_${i}_$j").cast("double") / nD - zbar(i) * hbar(j)
        when(varh(j) > lit(1e-12), cov / varh(j)).otherwise(lit(0.0))
      }: _*)
    }
    m.select(keys ++ Seq(col("n"), col("mu"), col("sigma"),
      array(zbar: _*).as("zbar"), array(hbar: _*).as("hbar"),
      array(varh: _*).as("varh"), array(gain: _*).as("gain")): _*)
  }

  /** Reconstruction error ‖z − ẑ‖² where ẑ_i = z̄_i + Σ_j v_ij·(h_j − h̄_j)
    * — per-row fixed-order double math over (window, broadcast model). */
  def reconErrExpr(vec: Column, mu: Column, sigma: Column, zbar: Column,
                   hbar: Column, gain: Column, dim: Int): Column = {
    val w1 = bank(dim)
    val z = zArr(vec, mu, sigma)
    val h = (0 until K).map(j => phi(preact(z, w1(j))))
    // ẑ_i, then Σ_i (z_i − ẑ_i)² as a left-assoc chain (i = 1..dim)
    val terms = (0 until dim).map { i =>
      val zi = element_at(z, i + 1)
      val zhat = (0 until K).foldLeft(element_at(zbar, i + 1)) { (acc, j) =>
        acc + element_at(element_at(gain, j + 1), i + 1) *
          (h(j) - element_at(hbar, j + 1))
      }
      (zi - zhat) * (zi - zhat)
    }
    terms.reduceLeft(_ + _)
  }

  /** SCORE — broadcast the model frame, reconstruct map-side at fact
    * grain (no shuffle beyond whatever produced `windows`). Inner join:
    * σ=0 keys have no model and are dropped, matching [[fit]]. */
  def score(windows: DataFrame, models: DataFrame, keyCols: Seq[String],
            vecCol: String, dim: Int): DataFrame =
    windows
      .join(broadcast(models), keyCols)
      .withColumn("recon_err", reconErrExpr(col(vecCol), col("mu"),
        col("sigma"), col("zbar"), col("hbar"), col("gain"), dim))
}
