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
