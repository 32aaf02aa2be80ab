package graft.text

import graft.functions.VectorFunctions
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** IVF-style approximate nearest neighbor (SURVEY E54 [N] scale path #2,
  * beside the LSH sign-bucket variant): partition the corpus into inverted
  * lists by nearest centroid, search only the query's `nprobe` nearest
  * lists. Two centroid sources: first-k vectors (deterministic without
  * RNG — what the oracle-adjacent q72 uses) and [[kmeansCentroids]]
  * (MLlib KMeans, the production path — seeded, but partitioning-order
  * sensitive, hence spec-verified rather than hash-verified). Cost:
  * assignment is map-side over the corpus; each query scans ~nprobe/k of
  * the data.
  */
object Ivf {

  /** Production centroids: MLlib k-means over the embedding column,
    * returned in the (centroid_id, cv: array&lt;float&gt;) shape
    * [[assign]]/[[search]] expect. The model is tiny (k × dim) and lives
    * on the driver — exactly the precondition for map-side assignment. */
  def kmeansCentroids(emb: DataFrame, k: Int, seed: Long = 7L,
                      maxIter: Int = 10): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val spark = emb.sparkSession
    import spark.implicits._
    val feats = emb.select(
      array_to_vector(col("embedding").cast("array<double>")).as("features"))
    val model = new KMeans().setK(k).setSeed(seed).setMaxIter(maxIter)
      .setFeaturesCol("features").fit(feats)
    model.clusterCenters.zipWithIndex.toSeq
      .map { case (c, i) => (i.toLong, c.toArray.map(_.toFloat).toSeq) }
      .toDF("centroid_id", "cv")
  }

  /** Assign every vector to its nearest centroid (inverted-list id).
    *
    * Map-side argmax: the centroid table is tiny by construction (it must
    * fit a k-means model), so it is collected and folded over as a literal
    * array INSIDE the row projection — no crossJoin row inflation (k× the
    * corpus), no argmax shuffle. At 100 TB the corpus never moves; only the
    * centroid array (KBs–MBs) ships inside the task binaries. Ties break to
    * the smallest centroid_id (fold keeps the earlier entry of the
    * id-sorted array). */
  def assign(emb: DataFrame, centroids: DataFrame): DataFrame = {
    val cents = centroids.select(col("centroid_id").cast("long"), col("cv"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
      .sortBy(_._1)
    val centArr = array(cents.map { case (id, v) =>
      struct(lit(id).as("id"), typedlit(v).as("cv"))
    }: _*)
    val scored = transform(centArr, c =>
      struct(VectorFunctions.vecCosine(col("embedding"), c.getField("cv")).as("sim"),
        c.getField("id").as("id")))
    val best = aggregate(scored,
      struct(lit(-2.0).as("sim"), lit(-1L).as("id")),
      (acc, x) => when(x.getField("sim") > acc.getField("sim"), x).otherwise(acc))
    emb.select(col("vec_id"), col("embedding"), best.getField("id").as("list_id"))
  }

  /** EXACT-decimal assignment: argmin of Σ round((x−c)², 9 dp) in integer
    * 1e-9 units (VecD2Units — association-free, so the oracle's unnest +
    * DECIMAL(28,9) per-dim sum reproduces every boundary decision bit for
    * bit). Same map-side shape as [[assign]]: centroids fold as a literal
    * inside one projection, ties to the smallest centroid_id via the
    * lexicographic struct min. This is what converts the ANN rows from
    * rows-only to hash-green: L2 argmin on exact integers has no FP
    * boundary to disagree on. */
  def assignD2(emb: DataFrame, centroids: DataFrame,
               floorMode: Boolean = false): DataFrame = {
    val d2 = if (floorMode) VectorFunctions.vecD2Floor _ else VectorFunctions.vecD2Units _
    val cents = centroids.select(col("centroid_id").cast("long"), col("cv"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble)))
      .sortBy(_._1)
    val centArr = array(cents.map { case (id, v) =>
      struct(lit(id).as("id"), typedlit(v).as("cv"))
    }: _*)
    val best = array_min(transform(centArr, c =>
      struct(d2(col("embedding"), c.getField("cv")).as("u"),
        c.getField("id").as("id"))))
    emb.select(col("vec_id"), col("embedding"),
      best.getField("id").as("list_id"))
  }

  /** Top-`nprobe` centroid lists per query, ranked on exact-unit d² with
    * centroid_id tiebreak (the hash-green twin of [[probeLists]]). */
  def probeListsD2(queries: DataFrame, centroids: DataFrame, nprobe: Int,
                   floorMode: Boolean = false): DataFrame = {
    val d2 = if (floorMode) VectorFunctions.vecD2Floor _ else VectorFunctions.vecD2Units _
    val w = Window.partitionBy(col("query_id")).orderBy(col("cu"), col("centroid_id"))
    queries.crossJoin(broadcast(centroids))
      .withColumn("cu", d2(col("qv"),
        col("cv").cast("array<double>")))
      .withColumn("crn", row_number().over(w)).filter(col("crn") <= nprobe)
      .select(col("query_id"), col("qv"), col("centroid_id").as("list_id"))
  }

  /** Hash-green IVF search: first-`nCentroids` vectors as centroids,
    * exact-unit d² everywhere (assignment, probe ranking, final top-k),
    * dist² rematerialized as the exact decimal units/1e9 (the q240
    * representation). Plan shape identical to [[search]]. */
  def searchD2(emb: DataFrame, queryIds: Seq[Long], k: Int, nCentroids: Int,
               nprobe: Int, corpus: Option[DataFrame] = None,
               floorMode: Boolean = false): DataFrame = {
    val centroids = emb.filter(col("vec_id") < nCentroids)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("cv"))
    searchD2With(emb, centroids, queryIds, k, nprobe, corpus, floorMode)
  }

  /** As [[searchD2]] with an explicit centroid frame. `floorMode` switches
    * every unit conversion to floor(v·1e9) (engine-version-proof, no
    * round() boundary) and emits dist2 as the DOUBLE units/1e9 — one
    * correctly-rounded IEEE division, identical in Spark and any DuckDB. */
  def searchD2With(emb: DataFrame, centroids: DataFrame, queryIds: Seq[Long],
                   k: Int, nprobe: Int, corpus: Option[DataFrame] = None,
                   floorMode: Boolean = false): DataFrame = {
    val d2 = if (floorMode) VectorFunctions.vecD2Floor _ else VectorFunctions.vecD2Units _
    val lists = assignD2(corpus.getOrElse(emb), centroids, floorMode)
    val queries = emb.filter(col("vec_id").isInCollection(queryIds))
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val probed = probeListsD2(queries, centroids, nprobe, floorMode)
    val w = Window.partitionBy(col("query_id")).orderBy(col("u"), col("vec_id"))
    val dist2 =
      if (floorMode) (col("u") / lit(1e9)).as("dist2")
      else (col("u").cast("decimal(28,0)") / lit(1000000000L)).as("dist2")
    lists.join(broadcast(probed), "list_id")
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("u", d2(col("embedding"),
        col("qv").cast("array<double>")))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"), col("vec_id"),
        dist2,
        col("list_id"))
  }

  /** Top-`nprobe` centroid lists per query vector. */
  def probeLists(queries: DataFrame, centroids: DataFrame, nprobe: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id")).orderBy(col("csim").desc, col("centroid_id"))
    queries.crossJoin(broadcast(centroids))
      .withColumn("csim", VectorFunctions.vecCosine(col("qv"), col("cv")))
      .withColumn("crn", row_number().over(w)).filter(col("crn") <= nprobe)
      .select(col("query_id"), col("qv"), col("centroid_id").as("list_id"))
  }

  /** Search: exact cosine, but only inside the probed lists (equi-join on
    * list_id — the pruning that survives 100 TB). Deterministic first-k
    * centroids; use [[searchWith]] + [[kmeansCentroids]] for the trained
    * variant.
    *
    * `corpus` (optional) is a differently-partitioned view of the SAME
    * vectors, used only for the scan side of [[assign]]. Centroids and
    * queries always come from `emb` — they are tiny vec_id filters that
    * push to the parquet scan, and each one executes its own job (a driver
    * collect / a broadcast build). Deriving them from an
    * already-repartitioned frame would make each of those jobs pay a full
    * exchange of the corpus to extract a handful of rows (measured 2.4×
    * on q72 in round 3). */
  def search(emb: DataFrame, queryIds: Seq[Long], k: Int, nCentroids: Int,
             nprobe: Int, corpus: Option[DataFrame] = None): DataFrame = {
    val centroids = emb.filter(col("vec_id") < nCentroids)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("cv"))
    searchWith(emb, centroids, queryIds, k, nprobe, corpus)
  }

  /** Search against an explicit centroid frame (e.g. [[kmeansCentroids]]). */
  def searchWith(emb: DataFrame, centroids: DataFrame, queryIds: Seq[Long],
                 k: Int, nprobe: Int, corpus: Option[DataFrame] = None): DataFrame = {
    val lists = assign(corpus.getOrElse(emb), centroids)
    val queries = emb.filter(col("vec_id").isInCollection(queryIds))
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val probed = probeLists(queries, centroids, nprobe)
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("vec_id"))
    // probed is (n_queries × nprobe) rows — broadcast it so the corpus-side
    // inverted lists are filtered map-side instead of shuffled on list_id.
    lists.join(broadcast(probed), "list_id")
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("sim", VectorFunctions.vecCosine(col("embedding"), col("qv")))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"), col("vec_id"),
        round(col("sim"), 6).as("sim"), col("list_id"))
  }
}
