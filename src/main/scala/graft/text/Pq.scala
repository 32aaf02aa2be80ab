package graft.text

import graft.functions.VectorFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (Jégou et al. 2011, the faiss `PQm` index family)
  * — the codebook cousin of the scalar quantizer (N-R72): each vector is
  * split into `m` subvectors, each subspace learns a tiny codebook of
  * `k` centroids, and a vector compresses to `m` small codes
  * (m · log2 k bits, e.g. 64-dim float32 → 4 bytes at m=4, k=16 — 64×).
  *
  * Training is ONE deterministic Lloyd iteration from the first-k-by-id
  * init (the q72 determinism discipline — no RNG): assignment is a
  * MAP-SIDE fold over the k-element literal centroid array inside the
  * row projection (the Ivf.assign shape — the corpus never shuffles for
  * argmin, no crossJoin inflation), and the update step recomputes each
  * centroid as the decimal-routed element-wise mean of its assigned
  * subvectors (round-then-DECIMAL-sum, so accumulation order cannot
  * move a digit — centroids are bit-stable across runs and partition
  * counts). Distances use ||a||² + ||b||² − 2·a·b over the codegen'd
  * native vector expressions.
  *
  * At 100 TB: codebooks are model-sized (m·k·subDim floats) and live on
  * the driver exactly like the Ivf/SQ8 models; encode touches each
  * corpus row once, map-side; the (sub, cid, pos) update aggregation
  * shuffles |corpus|·m·subDim value rows ONCE per iteration, keyed —
  * the standard distributed-kmeans shape.
  *
  * HASH-GREEN since round 14: every distance is an EXACT integer in 1e-9
  * units (`VecD2Units` — Σ round((aᵢ−bᵢ)², 9 dp), association-free), so
  * assignment argmins, reconstruction errors, and ADC totals are
  * bit-reproducible in a DuckDB twin — the same conversion that
  * de-fused q52/q72/q157. `sq_err`/`adc_dist` columns are LONGs in
  * those units.
  */
object Pq {

  /** (sub, centroid_id, cv) codebooks after one Lloyd step. */
  def train(emb: DataFrame, m: Int, k: Int): DataFrame = {
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val subD = dim / m
    val subs = subFrame(emb, m, subD)
    // deterministic init: the k smallest vec_ids' subvectors
    val firstK = emb.select(col("vec_id")).orderBy(col("vec_id")).limit(k)
      .collect().map(_.getLong(0)).zipWithIndex.toMap
    val init = subs.filter(col("vec_id").isin(firstK.keys.toSeq: _*))
      .collect()
      .map(r => (r.getInt(1), firstK(r.getLong(0)).toLong,
        r.getSeq[Float](2)))
    val assigned = assignSubs(subs, init, m)
    // update: decimal-routed element-wise mean per (sub, cid, pos)
    assigned
      .select(col("sub"), col("cid"), posexplode(col("sv")).as(Seq("pos", "v")))
      .groupBy(col("sub"), col("cid"), col("pos"))
      .agg((sum(round(col("v").cast("double"), 6).cast("decimal(28,6)"))
        .cast("double") / count(lit(1))).as("mv"))
      .groupBy(col("sub"), col("cid"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("mv")))),
        x => x.getField("mv").cast("float")).as("cv"))
      .withColumnRenamed("cid", "centroid_id")
  }

  /** Encode: `m` codes per vector (+ the summed squared reconstruction
    * error of the chosen centroids, in exact integer 1e-9 units). */
  def encode(emb: DataFrame, codebooks: DataFrame, m: Int): DataFrame = {
    val cents = codebooks.collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Float](2)))
    val dim = cents.head._3.length * m
    val assigned = assignSubs(subFrame(emb, m, dim / m), cents, m)
    assigned.groupBy(col("vec_id"))
      .agg(
        transform(array_sort(collect_list(struct(col("sub"), col("cid")))),
          x => x.getField("cid")).as("codes"),
        sum(col("d2")).as("sq_err"))
  }

  /** ADC search (asymmetric distance computation — the reason PQ exists):
    * approximate L2² from a QUERY vector to every ENCODED vector as the
    * sum over subspaces of d²(query_sub, centroid[code]). The per-sub
    * distances form an m×k LOOKUP TABLE computed once per query on the
    * driver (m·k float ops), then each encoded row costs m array-index
    * lookups — no float math per corpus row at all. That is the 100 TB
    * contract: the corpus is 4-byte codes, the scan is additions over a
    * broadcast-literal table. Table entries are exact integer 1e-9 units
    * (per-term 9-dp HALF_UP, the VecD2Units rule replayed on the
    * driver), so totals and the (dist, vec_id) top-n order are
    * bit-reproducible. */
  def adcSearch(encoded: DataFrame, codebooks: DataFrame,
                query: Seq[Float], m: Int, topN: Int): DataFrame = {
    val cents = codebooks.collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Float](2)))
    val subD = cents.head._3.length
    require(query.length == subD * m, "query dim mismatch")
    def l2units(a: Seq[Float], b: Seq[Float]): Long =
      a.zip(b).map { case (x, y) =>
        val d = x.toDouble - y.toDouble
        graft.functions.VecD2Units.units(d * d)
      }.sum
    // lut(sub): centroid_id → d²-units(query_sub, centroid). Keyed by ID,
    // not array position: a centroid left empty by the Lloyd step makes
    // IDs non-contiguous, and a positional table would then read the
    // wrong centroid's distance for every code above the gap.
    val lut: Map[Int, Map[Long, Long]] = cents.groupBy(_._1).map {
      case (sub, cs) =>
        val q = query.slice(sub * subD, (sub + 1) * subD)
        sub -> cs.map(c => c._2 -> l2units(q, c._3)).toMap
    }
    val tables = array((0 until m).map(sub =>
      typedlit(lut(sub))): _*)
    val dist = aggregate(
      zip_with(col("codes"), sequence(lit(0), lit(m - 1)),
        (code, sub) => element_at(element_at(tables, sub + 1),
          code.cast("long"))),
      lit(0L), (acc, d) => acc + d)
    encoded.withColumn("adc_dist", dist)
      // A code absent from the codebook yields a null distance, which an
      // ascending sort would rank FIRST — drop it rather than pollute top-N.
      .filter(col("adc_dist").isNotNull)
      .orderBy(col("adc_dist"), col("vec_id"))
      .limit(topN)
  }

  /** Subvector rows: (vec_id, sub, sv). */
  private def subFrame(emb: DataFrame, m: Int, subD: Int): DataFrame =
    emb.select(col("vec_id"), explode(array((0 until m).map(i =>
      struct(lit(i).as("sub"),
        slice(col("embedding"), i * subD + 1, subD).as("sv"))): _*)).as("x"))
      .select(col("vec_id"), col("x.sub").as("sub"), col("x.sv").as("sv"))

  /** Map-side nearest-centroid per subspace: an m-branch conditional,
    * each branch folding its subspace's k-element literal array. Ties
    * break to the smaller centroid id (the fold keeps the earlier entry
    * of the id-sorted array). Distances are EXACT integer 1e-9 units
    * (`VecD2Units`), so the argmin is bit-reproducible in the oracle. */
  private def assignSubs(subs: DataFrame,
                         cents: Seq[(Int, Long, Seq[Float])],
                         m: Int): DataFrame = {
    def d2(a: Column, cv: Column): Column =
      VectorFunctions.vecD2Units(a, cv)
    val bySub = cents.groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    def bestFor(sub: Int): Column = {
      // float→double promotion is exact, and VecD2Units wants its
      // centroid side as array<double>
      val arr = array(bySub(sub).map { case (_, id, cv) =>
        struct(d2(col("sv"), typedlit(cv.map(_.toDouble))).as("d"),
          lit(id).as("id"))
      }: _*)
      aggregate(arr,
        struct(lit(Long.MaxValue).as("d"), lit(-1L).as("id")),
        (acc, c) => when(c.getField("d") < acc.getField("d"), c).otherwise(acc))
    }
    val best = (1 until m).foldLeft(when(col("sub") === 0, bestFor(0))) {
      (w, i) => w.when(col("sub") === i, bestFor(i))
    }
    subs.withColumn("__b", best)
      .select(col("vec_id"), col("sub"), col("sv"),
        col("__b.id").as("cid"), col("__b.d").as("d2"))
  }
}
