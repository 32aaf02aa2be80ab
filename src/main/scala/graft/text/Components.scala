package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected components by iterative min-label propagation WITH pointer
  * doubling — the step that turns near-dup candidate PAIRS (LSH output)
  * into dedup CLUSTERS so one canonical doc survives per group (transitive
  * closure: a~b, b~c ⇒ one cluster {a,b,c} even when a,c never collide in
  * a band).
  *
  * Each iteration is two distributed keyed joins + one agg:
  *   1. neighbor min:      L(x) ← min(L(x), min over neighbors y of L(y))
  *   2. pointer doubling:  L(x) ← min(L(x), L(L(x)))
  * Step 2 (labels joined against themselves on the label value — labels
  * are always REAL node ids, so the join key exists) squares the distance
  * a label can travel per round: convergence is O(log diameter) rather
  * than O(diameter), so a pathological 10k-long dup chain converges in
  * ~14 rounds instead of tripping the iteration cap. This is the
  * alternating-star/pointer-jumping family of MapReduce CC algorithms
  * (Kiveris et al., "Connected Components in MapReduce and Beyond");
  * every pass is shuffle-keyed by doc id.
  *
  * Lineage control: each round's labels are `localCheckpoint(eager)`-ed.
  * Without truncation the logical plan NESTS the previous round's plan
  * (self-referential joins), i.e. exponential nodes — at ~9 rounds even
  * formatting the plan OOMs. Local checkpoints (executor storage) are
  * the right trade here; a multi-tenant cluster job would use reliable
  * `checkpoint()` to a DFS dir instead.
  */
object Components {

  /** @param nodes (id, plus any carried columns) — every doc, singletons too
    * @param pairs (id1, id2) undirected candidate edges
    * @return nodes plus a `component` column = min node id reachable
    * @throws IllegalStateException when the propagation has not converged
    *         after `maxIter` rounds (cluster path-diameter > maxIter) —
    *         returning the partial labels would silently split one true
    *         cluster into several. Raise `maxIter` (rounds are cheap, the
    *         bound exists to catch pathological inputs) or pre-contract
    *         obvious duplicates before calling. */
  def connectedComponents(nodes: DataFrame, pairs: DataFrame,
                          idCol: String, maxIter: Int = 20): DataFrame = {
    val edges = pairs.select(col("id1").as("a"), col("id2").as("b"))
      .union(pairs.select(col("id2").as("a"), col("id1").as("b")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = nodes.select(col(idCol), col(idCol).as("component"))
      .localCheckpoint(true)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val nbrMin = edges.join(labels, edges("b") === labels(idCol))
        .groupBy(col("a")).agg(min(col("component")).as("__nbr"))
      // The previous generation's label rides along as `__old` so the
      // convergence check below is a FILTER over the already-checkpointed
      // rows — the earlier form re-joined `next` against `labels` on the
      // id (one extra shuffle join per round, measured ~15-20% of the CC
      // loop at sf0.1) purely to recover a value this select still has.
      val prop = labels.join(nbrMin, labels(idCol) === nbrMin("a"), "left")
        .select(labels(idCol), col("component").as("__old"),
          least(col("component"), coalesce(col("__nbr"), col("component")))
            .as("component"))
      // pointer doubling: follow the label one hop through itself. Applied
      // from round 3 on — real near-dup clusters are shallow (diameter
      // 1–2) and converge before paying the extra join; a pathological
      // deep chain still gets the O(log d) reach-squaring rounds.
      val doubled = if (iter < 2) prop else {
        val ptr = prop.select(col(idCol).as("__pid"), col("component").as("__pcomp"))
        prop.join(ptr, prop("component") === ptr("__pid"), "left")
          .select(prop(idCol), prop("__old"),
            least(prop("component"), coalesce(col("__pcomp"), prop("component")))
              .as("component"))
      }
      val next = doubled
        .localCheckpoint(true) // truncate lineage; also materializes for the count
      val changed = next.filter(col("component") =!= col("__old")).count()
      // the superseded generation's checkpoint blocks are dead from here
      // — free them NOW, or a query loop accumulates one generation per
      // iteration per run (measured: q92 reps 1.2 s → 3.0 s in one
      // bench triple purely from dead block pressure)
      graft.CacheBag.freeCheckpoint(labels)
      labels = next.select(col(idCol), col("component"))
      converged = changed == 0
      iter += 1
    }
    edges.unpersist()
    // the final generation feeds the returned plan — free it only after
    // the caller's action completes
    graft.CacheBag.registerCheckpoint(labels)
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge after $maxIter iterations — " +
          "a cluster with path-diameter > maxIter would be silently split; " +
          "raise maxIter for this input")
    nodes.join(labels.withColumnRenamed(idCol, "__id"),
      nodes(idCol) === col("__id")).drop("__id")
  }
}
