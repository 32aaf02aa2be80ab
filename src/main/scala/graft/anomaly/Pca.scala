package graft.anomaly

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Row}

/** Trained P6: per-key PCA reconstruction error — the natural stand-in for
  * the reference's per-key autoencoder models (`reference/CHANGELOG.md:139`
  * trains an AE per composite key; a linear AE with tied weights IS PCA).
  *
  * Scale shape, in three stages:
  *  1. FIT (distributed): per-key second-moment statistics — n, Σx_i,
  *     Σx_i·x_j — via ONE grouped aggregation (map-side partials, one
  *     shuffle on the model key), each sum DECIMAL-ROUTED (9-dp
  *     round-then-sum) so accumulation order cannot move a digit. At
  *     100 TB this aggregation is the whole job; its output is
  *     `n_keys × (dim + dim²/2)` decimals.
  *  2. EIGEN (driver): the per-key covariance matrices are tiny (dim ≈ 12
  *     → 78 upper-triangle entries). Since round 14 the eigensolver is a
  *     DETERMINISTIC deflated power iteration ([[powerPcs]]) instead of
  *     breeze `eigSym`: a FIXED number of steps whose every cross-term
  *     sum is an exact 1e-9-unit integer and whose remaining operations
  *     are single IEEE ops on identical inputs — so the trained model
  *     (means AND principal axes) is bit-reproducible in a DuckDB
  *     oracle, and the q98/q131 rows are hash-green rather than
  *     rows-only. The model is driver-sized by construction, like the
  *     IVF centroid fold.
  *  3. SCORE (distributed, map-side): models broadcast back as a tiny
  *     frame; reconstruction error `‖xc − P·Pᵀ·xc‖²` is a projection over
  *     array columns (strict left-fold order — the oracle replays it
  *     with list_reduce) — no shuffle at fact grain beyond the window
  *     assembly that produced the vectors.
  */
object Pca {

  /** Power-iteration step count: fixed (NOT convergence-tested) so both
    * engines run the identical op sequence; 60 steps on a dim≈12 PSD
    * matrix converges far past float precision unless eigenvalues tie,
    * in which case both engines land on the same in-subspace vector. */
  val PowerSteps = 60

  private def toD(units: Long): Double =
    new java.math.BigDecimal(units).movePointLeft(9).doubleValue()

  /** Deterministic deflated power iteration on a symmetric PSD matrix:
    * top-`k` eigenvectors, eigenvalue-descending. Every matrix-vector
    * cross-term is rounded to 9 dp (HALF_UP on the exact binary value —
    * the VecD2Units rule) and summed as an exact integer in 1e-9 units;
    * normalization divides by the max-|w| first (keeping the squared
    * terms unit-scale, so the units never overflow a long), then by the
    * norm — max, divide, sqrt are all order-free IEEE ops. Deflation is
    * the fixed-order chain `c - λ·vᵢ·vⱼ`. A zero iterate (constant
    * windows) keeps the init vector with λ = 0.
    *
    * Init is the normalized ramp (1, 2, …, dim): a symmetric init like
    * all-ones sits EXACTLY orthogonal to any sign-alternating
    * eigenvector and the iteration can never leave its hyperplane (the
    * PcaSpec fixture is precisely that geometry); the ramp has no such
    * symmetry. Any FIXED init is still orthogonal to SOME adversarial
    * subspace — that is the price of a deterministic, oracle-replayable
    * solver, and it is documented rather than hidden behind RNG. */
  def powerPcs(cov0: Array[Array[Double]], dim: Int, k: Int,
               steps: Int): Seq[Seq[Double]] = {
    import graft.functions.VecD2Units.signedUnits
    val cov = cov0.map(_.clone())
    val initNorm = // Σi² is an exact integer (dim·(dim+1)·(2dim+1)/6)
      math.sqrt((1 to dim).map(i => i.toLong * i).sum.toDouble)
    (0 until k).map { _ =>
      var v = Array.tabulate(dim)(i => (i + 1).toDouble / initNorm)
      var lam = 0.0
      var t = 0
      while (t < steps) {
        val w = Array.tabulate(dim) { i =>
          var u = 0L
          var j = 0
          while (j < dim) { u += signedUnits(cov(i)(j) * v(j)); j += 1 }
          toD(u)
        }
        var m = 0.0
        w.foreach(x => if (math.abs(x) > m) m = math.abs(x))
        if (m == 0.0) { lam = 0.0; t = steps } // converged to the null space
        else {
          val u = w.map(_ / m)
          var n2u = 0L
          u.foreach(x => n2u += signedUnits(x * x))
          val nn = math.sqrt(toD(n2u))
          lam = m * nn
          v = u.map(_ / nn)
          t += 1
        }
      }
      var i = 0
      while (i < dim) {
        var j = 0
        while (j < dim) { cov(i)(j) = cov(i)(j) - lam * v(i) * v(j); j += 1 }
        i += 1
      }
      v.toSeq
    }
  }

  /** One fitted model per key: (keyCol, n, mean: array, pcs: array of the
    * top-`k` principal axes, each array(dim), eigenvalue-descending). */
  def fit(windows: DataFrame, keyCol: String, vecCol: String,
          dim: Int, k: Int): DataFrame = {
    require(k <= dim, s"k=$k must be <= dim=$dim")
    // Bind each element to a plain double column and PERSIST that narrow
    // frame for the one aggregation pass: the dim(dim+3)/2 decimal
    // aggregates otherwise inline the element extraction into the partial
    // agg and re-evaluate the upstream plan per expression — measured 7.8 s
    // vs 1.1 s on q131's window/pivot input (the cache is rows × dim
    // doubles, freed before fit returns).
    val bound = windows.select(col(keyCol) +:
      (0 until dim).map(i =>
        element_at(col(vecCol), i + 1).as(s"__x_$i")): _*)
      .persist()
    val xi = (0 until dim).map(i => col(s"__x_$i"))
    def d9(c: org.apache.spark.sql.Column) =
      sum(round(c, 9).cast("decimal(38,9)"))
    val aggs =
      (0 until dim).map(i => d9(xi(i)).as(s"s_$i")) ++
        (for { i <- 0 until dim; j <- i until dim }
          yield d9(xi(i) * xi(j)).as(s"q_${i}_$j"))
    val stats =
      try bound.groupBy(col(keyCol))
        .agg(count(lit(1)).as("n"), aggs: _*)
        .collect() // n_keys rows of dim + dim(dim+1)/2 decimals — driver-sized
      finally bound.unpersist(blocking = false)
    val models: Seq[(String, Long, Seq[Double], Seq[Seq[Double]])] =
      stats.toIndexedSeq.map { r: Row =>
        val key = r.get(0).toString
        val n = r.getLong(1)
        def dec(idx: Int): Double = r.getDecimal(idx).doubleValue()
        val mean = (0 until dim).map(i => dec(2 + i) / n)
        val cov = Array.ofDim[Double](dim, dim)
        var idx = 2 + dim
        for (i <- 0 until dim; j <- i until dim) {
          val c = dec(idx) / n - mean(i) * mean(j)
          cov(i)(j) = c; cov(j)(i) = c
          idx += 1
        }
        (key, n, mean, powerPcs(cov, dim, k, PowerSteps).map(_.toSeq))
      }
    val spark = windows.sparkSession
    import spark.implicits._
    models.toDF(keyCol, "n", "mean", "pcs")
  }

  /** `‖xc − Σ_j (pc_j·xc)·pc_j‖²` as one array expression over (vector,
    * model mean, model pcs) columns — map-side at fact grain, shared by
    * the batch scorer below and the streaming face
    * ([[graft.stream.StreamOps.streamPcaScore]]). */
  def reconErrExpr(vec: org.apache.spark.sql.Column, mean: org.apache.spark.sql.Column,
                   pcs: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val xc = zip_with(vec, mean, (x, m) => x - m)
    val projs = transform(pcs, p =>
      aggregate(zip_with(p, xc, (a, b) => a * b), lit(0.0), (s, v) => s + v))
    val recon = aggregate(
      zip_with(projs, pcs, (c, p) => transform(p, v => c * v)),
      array_repeat(lit(0.0), size(vec)),
      (acc, a) => zip_with(acc, a, (x, y) => x + y))
    aggregate(zip_with(xc, recon, (x, r) => (x - r) * (x - r)),
      lit(0.0), (s, v) => s + v)
  }

  /** Reconstruction error per window vector: broadcast-join the model on
    * `keyCol`, then [[reconErrExpr]] — map-side at fact grain. */
  def reconstructionError(windows: DataFrame, models: DataFrame,
                          keyCol: String, vecCol: String): DataFrame =
    windows.join(broadcast(models.select(col(keyCol), col("mean"), col("pcs"))), keyCol)
      .withColumn("recon_err", reconErrExpr(col(vecCol), col("mean"), col("pcs")))
}
