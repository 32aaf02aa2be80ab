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
  *     shuffle on the model key). At 100 TB this aggregation is the whole
  *     job; its output is `n_keys × (dim + dim²/2)` doubles.
  *  2. EIGEN (driver): the per-key covariance matrices are tiny (dim ≈ 12
  *     → 78 upper-triangle entries), so the symmetric eigendecomposition
  *     runs on the driver via breeze's `eigSym` — the same route MLlib's
  *     `RowMatrix.computePrincipalComponents` takes after ITS distributed
  *     Gramian; like the IVF centroid fold, the model is driver-sized by
  *     construction.
  *  3. SCORE (distributed, map-side): models broadcast back as a tiny
  *     frame; reconstruction error `‖xc − P·Pᵀ·xc‖²` is a projection over
  *     array columns — no shuffle at fact grain beyond the window
  *     assembly that produced the vectors.
  *
  * Cross-engine note: eigenvectors are FP-iteration outputs and not
  * reproducible in a SQL oracle, so queries over this path are declared
  * rows-only (like q52/q72) with semantics pinned in PcaSpec — including
  * that a planted off-subspace anomaly out-scores everything the
  * rolling-mean proxy can see.
  */
object Pca {

  /** One fitted model per key: (keyCol, n, mean: array, pcs: array of the
    * top-`k` principal axes, each array(dim), eigenvalue-descending). */
  def fit(windows: DataFrame, keyCol: String, vecCol: String,
          dim: Int, k: Int): DataFrame = {
    require(k <= dim, s"k=$k must be <= dim=$dim")
    val xi = (0 until dim).map(i => element_at(col(vecCol), i + 1))
    val aggs =
      (0 until dim).map(i => sum(xi(i)).as(s"s_$i")) ++
        (for { i <- 0 until dim; j <- i until dim }
          yield sum(xi(i) * xi(j)).as(s"q_${i}_$j"))
    val stats = windows.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"), aggs: _*)
      .collect() // n_keys rows of dim + dim(dim+1)/2 doubles — driver-sized
    val models: Seq[(String, Long, Seq[Double], Seq[Seq[Double]])] =
      stats.toIndexedSeq.map { r: Row =>
        val key = r.get(0).toString
        val n = r.getLong(1)
        val s = (0 until dim).map(i => r.getDouble(2 + i))
        val mean = s.map(_ / n)
        val cov = breeze.linalg.DenseMatrix.zeros[Double](dim, dim)
        var idx = 2 + dim
        for (i <- 0 until dim; j <- i until dim) {
          val c = r.getDouble(idx) / n - mean(i) * mean(j)
          cov(i, j) = c; cov(j, i) = c
          idx += 1
        }
        val es = breeze.linalg.eigSym(cov) // eigenvalues ascending
        val order = es.eigenvalues.toArray.zipWithIndex
          .sortBy(-_._1).take(k).map(_._2).toSeq
        val pcs = order.map(c => (0 until dim).map(i => es.eigenvectors(i, c)))
        (key, n, mean, pcs)
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
