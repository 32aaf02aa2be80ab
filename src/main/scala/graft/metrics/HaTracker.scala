package graft.metrics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cortex/Mimir HA tracker — deterministic batch replay of the
  * distributor's replica deduplication (`ha_tracker`): per cluster one
  * ELECTED replica; samples from it are accepted and refresh its
  * last-seen; samples from any other replica are dropped unless the
  * elected replica has been silent longer than the failover timeout, in
  * which case the sender becomes elected from that sample on.
  *
  * Spark-first shape: the sequential election state is compressed onto
  * REPLICA RUNS (maximal same-replica stretches in arrival order, found
  * with one lag + prefix-sum window). Within a run the elected replica's
  * last-seen cannot change, so the mid-run failover point is a pure
  * filter (`t > last_seen + timeout`) — no per-sample recursion. The
  * per-cluster fold then walks runs, not samples: state is O(1) and the
  * walk length is bounded by replica alternation (wall-clock flaps), not
  * sample volume. Upstream runs this same per-cluster sequential actor
  * in the distributor; the streaming face is the production shape.
  */
object HaTracker {

  /** Election/dedup statistics per cluster. Arrival TOTAL ORDER is
    * (`tsUsCol`, `ordCol`) — full µs so a streaming replay that splits
    * micro-batches on event time walks the identical sequence — while
    * the timeout arithmetic runs on `tsSecCol` (epoch seconds, the
    * ha_tracker grain). `valueCol` is rounded to 6 dp and accumulated
    * exactly in DECIMAL. */
  def dedupStats(samples: DataFrame, clusterCol: String, replicaCol: String,
                 tsUsCol: String, tsSecCol: String, ordCol: String,
                 valueCol: String, failoverSec: Long): DataFrame = {
    val wO = Window.partitionBy(col(clusterCol))
      .orderBy(col(tsUsCol), col(ordCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wL = Window.partitionBy(col(clusterCol))
      .orderBy(col(tsUsCol), col(ordCol))
    val marked = samples
      .withColumn("__chg",
        when(lag(col(replicaCol), 1).over(wL).isNull ||
          lag(col(replicaCol), 1).over(wL) =!= col(replicaCol), 1).otherwise(0))
      .withColumn("__run", sum(col("__chg")).over(wO))
    val runs = marked.groupBy(col(clusterCol), col("__run"))
      .agg(max(col(replicaCol)).as("rep"),
        max(col(tsSecCol)).as("t_last"),
        count(lit(1)).as("n"),
        collect_list(struct(col(tsSecCol).as("t"),
          round(col(valueCol), 6).cast("decimal(18,6)").as("v"))).as("arr"))
    val runStruct = struct(col("__run").as("rid"), col("rep"),
      col("t_last"), col("n"), col("arr"))

    val dec0 = lit(0).cast("decimal(28,6)")
    val init = struct(lit("").as("elected"),
      lit(Long.MinValue / 4).as("last"), lit(0L).as("nacc"), lit(0L).as("nrej"),
      lit(0L).as("nelect"), dec0.as("vsum"))
    def decSum(xs: Column): Column =
      aggregate(xs, dec0, (a, x) =>
        (a + x.getField("v")).cast("decimal(28,6)"))
    def mkState(elected: Column, last: Column, nacc: Column, nrej: Column,
                nelect: Column, vsum: Column): Column =
      struct(elected.as("elected"), last.as("last"), nacc.as("nacc"),
        nrej.as("nrej"), nelect.as("nelect"),
        vsum.cast("decimal(28,6)").as("vsum"))
    def fold(st: Column, r: Column): Column = {
      val arr = r.getField("arr")
      val qual = filter(arr,
        x => x.getField("t") > st.getField("last") + failoverSec)
      val nq = size(qual).cast("long")
      when(st.getField("nelect") === 0,
        mkState(r.getField("rep"), r.getField("t_last"),
          st.getField("nacc") + r.getField("n"), st.getField("nrej"),
          lit(1L), st.getField("vsum") + decSum(arr)))
        .when(st.getField("elected") === r.getField("rep"),
          mkState(st.getField("elected"), r.getField("t_last"),
            st.getField("nacc") + r.getField("n"), st.getField("nrej"),
            st.getField("nelect"), st.getField("vsum") + decSum(arr)))
        .when(nq > 0,
          mkState(r.getField("rep"), r.getField("t_last"),
            st.getField("nacc") + nq,
            st.getField("nrej") + r.getField("n") - nq,
            st.getField("nelect") + 1, st.getField("vsum") + decSum(qual)))
        .otherwise(
          mkState(st.getField("elected"), st.getField("last"),
            st.getField("nacc"), st.getField("nrej") + r.getField("n"),
            st.getField("nelect"), st.getField("vsum")))
    }
    runs.groupBy(col(clusterCol))
      .agg(sort_array(collect_list(runStruct)).as("__runs"),
        count(lit(1)).as("n_runs"))
      .withColumn("__st", aggregate(col("__runs"), init, fold))
      .select(col(clusterCol), col("n_runs"),
        col("__st").getField("elected").as("elected_final"),
        col("__st").getField("nelect").as("n_elections"),
        col("__st").getField("nacc").as("n_accepted"),
        col("__st").getField("nrej").as("n_rejected"),
        round(col("__st").getField("vsum").cast("double"), 4).as("sum_accepted"))
  }
}
