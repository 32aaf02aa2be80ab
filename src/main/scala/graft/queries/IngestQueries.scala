package graft.queries

import graft.Tables._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Ingest-boundary semantics a production TSDB enforces BEFORE samples
  * reach the head: out-of-order acceptance windows (Prometheus 2.39+
  * `out_of_order_time_window`, the OOO head + WBL design) and per-tenant
  * series limits with tenant-federated reads (the Cortex/Mimir
  * `max_global_series_per_user` + `-tenant-federation.enabled` pair).
  * The reference's scrape path (`CHANGELOG.md:353` prometheus-serde)
  * feeds exactly such an ingest boundary once it leaves the demo scale.
  *
  * Cross-engine determinism: classifications are integer/µs comparisons
  * on md5-derived fixtures (the q155/q214 hashmod discipline); value sums
  * are rounded-then-DECIMAL so accumulation order can't flip a digit.
  *
  * Scale notes (100 TB posture):
  *  - q216's head-max is ONE running-max window per series, keyed by the
  *    series id — per-series sequential semantics parallelize across the
  *    millions of series of a real head; nothing is corpus-global. The
  *    running max over ALL prior arrivals equals the head's maxTime
  *    (proof in the query doc) so no iterative state is needed.
  *  - q217 ranks SERIES (one row per series from a partial-agg groupBy),
  *    never samples; the per-tenant admission window runs on the
  *    series-sized frame, and sample counts ride the same pre-aggregated
  *    rows — the limiter costs one keyed agg + one series-sized window.
  */
object IngestQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // OUT-OF-ORDER ingestion (tsdb/head_append.go semantics): a sample
    // older than its series' head maxTime is accepted into the OOO head
    // iff maxTime − t ≤ the configured window (1h here), else rejected
    // "too old". Key identity making this declarative: head maxTime only
    // advances on in-order appends, but the running max over ALL prior
    // arrivals is provably equal to it (induction: an OOO/rejected sample
    // is < the running max, so it never advances either side) — one
    // window function, no recursion. The arrival fixture ships ~20% of
    // samples 30 min late (lands OOO) and ~10% 3 h late (lands too-old,
    // except where the series' local gap exceeds the lateness).
    // Query-time merge = in-order ∪ OOO sorted by t, duplicate-ts dropped
    // by the merge iterator — surfaced as n_unique_ts.
    "q216_ooo_ingest" -> ((s, d) => {
      val wUs = 3600L * 1000000L
      val ev = events(s, d)
        .withColumn("b",
          conv(substring(md5(concat(lit("ooo|"),
            col("event_id").cast("string"))), 1, 6), 16, 10)
            .cast("long") % 10)
        .withColumn("t_us", expr("unix_micros(ts)") -
          (when(col("b") >= 9, 10800L)
            .when(col("b") >= 7, 1800L).otherwise(0L)) * lit(1000000L))
      val head = Window.partitionBy(col("event_type")).orderBy(col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val classed = ev
        .withColumn("head_max", max(col("t_us")).over(head))
        .withColumn("cls",
          when(col("head_max").isNull || col("t_us") >= col("head_max"),
            "in_order")
            .when(col("head_max") - col("t_us") <= wUs, "ooo")
            .otherwise("too_old"))
      classed.groupBy(col("event_type"))
        .agg(
          sum(when(col("cls") === "in_order", 1).otherwise(0)).as("n_in_order"),
          sum(when(col("cls") === "ooo", 1).otherwise(0)).as("n_ooo"),
          sum(when(col("cls") === "too_old", 1).otherwise(0)).as("n_too_old"),
          countDistinct(when(col("cls") =!= "too_old", col("t_us")))
            .as("n_unique_ts"),
          round(sum(when(col("cls") =!= "too_old",
            round(col("value"), 6).cast("decimal(18,6)"))).cast("double"), 4)
            .as("sum_merged"),
          max(when(col("cls") =!= "too_old", col("t_us"))).as("max_accepted_us"))
        .orderBy(col("event_type"))
    }),

    // PER-TENANT series limits + tenant federation (Mimir
    // `max_global_series_per_user`): series are admitted in first-seen
    // order until the tenant's cap (150); every sample of a
    // never-admitted series is discarded (the
    // `cortex_discarded_samples_total{reason="per_user_series_limit"}`
    // accounting). The read side is a tenant-federated query: the tenant
    // id rides the output as a label (the injected `__tenant_id__`),
    // merged across tenants in one frame. Admission order = min(event_id)
    // per series — unique by construction, so the rank is deterministic.
    "q217_tenant_limits" -> ((s, d) => {
      val capPerTenant = 150
      val series = events(s, d)
        .withColumn("tenant", concat(lit("t"), pmod(col("user_id"), lit(3L))))
        .groupBy(col("tenant"), col("event_type"), col("user_id"))
        .agg(min(col("event_id")).as("first_seen"),
          count(lit(1)).as("n_samp"),
          sum(round(col("value"), 6).cast("decimal(18,6)")).as("sum_v"))
      val admitted = series.withColumn("rk",
        row_number().over(
          Window.partitionBy(col("tenant")).orderBy(col("first_seen"))))
        .withColumn("accepted", col("rk") <= capPerTenant)
      admitted.groupBy(col("tenant"), col("event_type"))
        .agg(
          count(lit(1)).as("n_series"),
          sum(when(col("accepted"), 1).otherwise(0)).as("n_series_accepted"),
          sum(col("n_samp")).as("n_samples"),
          sum(when(col("accepted"), col("n_samp")).otherwise(0))
            .as("n_samples_accepted"),
          sum(when(!col("accepted"), col("n_samp")).otherwise(0))
            .as("n_samples_discarded"),
          round(sum(when(col("accepted"), col("sum_v"))
            .otherwise(lit(0).cast("decimal(18,6)"))).cast("double"), 4)
            .as("sum_accepted"))
        .orderBy(col("tenant"), col("event_type"))
    }),

    // SHUFFLE SHARDING + RF-3 QUORUM READS (the Mimir/Cortex ring): each
    // tenant gets a deterministic 4-of-12 ingester subring (rank by
    // md5(tenant, ingester) — a documented stand-in for the ring's
    // token-walk shard: same properties, hash-derived, stable, disjointly
    // spread); each series replicates to 3 consecutive subring positions
    // starting at hash(series) mod 4. One ingester (ing 3) is DOWN — all
    // its copies are lost — and the quorum read (≥2 of 3 surviving)
    // still reconstructs every sample exactly: sum_quorum must equal
    // sum_direct computed without the ring, the availability invariant
    // RF-3 buys. The ring table is tenants×ingesters (broadcast-sized),
    // replica routing is series-grain, and the quorum agg keys by sample
    // id — partial-agg friendly, nothing corpus-quadratic.
    "q219_shuffle_shard_quorum" -> ((s, d) => {
      val ings = s.range(12).select(col("id").cast("int").as("ing"))
      val tenants = s.range(3).select(concat(lit("t"), col("id")).as("tenant"))
      val ring = tenants.crossJoin(ings)
        .withColumn("hk", conv(substring(md5(concat(lit("ring|"),
          col("tenant"), lit("|"), col("ing").cast("string"))), 1, 12),
          16, 10).cast("long"))
        .withColumn("pos", row_number().over(
          Window.partitionBy(col("tenant")).orderBy(col("hk"), col("ing"))) - 1)
        .filter(col("pos") < 4)
      val ev = events(s, d)
        .withColumn("tenant", concat(lit("t"), pmod(col("user_id"), lit(3L))))
      val series = ev.select("tenant", "event_type", "user_id").distinct()
        .withColumn("p0", pmod(conv(substring(md5(concat(lit("ser|"),
          col("event_type"), lit("|"), col("user_id").cast("string"))), 1, 12),
          16, 10).cast("long"), lit(4L)))
      val replicas = series
        .select(col("tenant"), col("event_type"), col("user_id"), col("p0"),
          explode(array(lit(0L), lit(1L), lit(2L))).as("r"))
        .withColumn("pos", pmod(col("p0") + col("r"), lit(4L)).cast("int"))
        .join(broadcast(ring.select(col("tenant"), col("pos"), col("ing"))),
          Seq("tenant", "pos"))
        .select(col("tenant"), col("event_type"), col("user_id"), col("ing"))
      val copies = ev.join(replicas, Seq("tenant", "event_type", "user_id"))
      val quorum = copies
        .groupBy(col("tenant"), col("event_type"), col("user_id"),
          col("event_id"), col("value"))
        .agg(count(lit(1)).as("n_rep"),
          sum(when(col("ing") =!= 3, 1).otherwise(0)).as("n_surv"))
      val perTenant = quorum.groupBy(col("tenant"))
        .agg(countDistinct(col("event_type"), col("user_id")).as("n_series"),
          count(lit(1)).as("n_samples"),
          sum(col("n_rep")).as("n_copies"),
          sum(lit(3) - col("n_surv")).as("n_copies_lost"),
          sum(when(col("n_surv") >= 2, 1).otherwise(0)).as("n_quorum_ok"),
          round(sum(when(col("n_surv") >= 2,
            round(col("value"), 6).cast("decimal(18,6)"))).cast("double"), 4)
            .as("sum_quorum"))
      val direct = ev.groupBy(col("tenant"))
        .agg(round(sum(round(col("value"), 6).cast("decimal(18,6)"))
          .cast("double"), 4).as("sum_direct"))
      val shard = ring.groupBy(col("tenant"))
        .agg(concat_ws(",", transform(sort_array(collect_list(col("ing"))),
          x => x.cast("string"))).as("shard_ings"))
      perTenant.join(direct, "tenant").join(broadcast(shard), "tenant")
        .orderBy(col("tenant"))
    }),

    // TSDB INVERTED INDEX (the block index's postings lists — the one
    // head/block structure q206's WAL + q195's compaction didn't model):
    // per (label name, label value), the sorted list of series ids
    // owning that pair; a conjunctive matcher evaluates as a postings
    // INTERSECTION (sid equi-joins), then fetches the matched series'
    // pre-aggregated sample stats. Series ids are min(event_id) — the
    // head's first-seen ref rule, same as q206. Three matcher faces are
    // each proved ≡ the direct predicate scan (hash-equal count + sum),
    // with the index TOC stats riding along. Scale shape: the postings
    // build is one series-grain explode + keyed agg; intersections join
    // on sid (never scan samples); only the DIRECT face touches raw
    // rows — which is exactly the cost asymmetry the index exists for.
    "q222_postings_index" -> ((s, d) => {
      val ev = events(s, d)
      val series = ev.groupBy(col("event_type"), col("user_id"))
        .agg(min(col("event_id")).as("sid"), count(lit(1)).as("n_samp"),
          sum(round(col("value"), 6).cast("decimal(18,6)")).as("sum_v"))
        .withColumn("parity", pmod(col("user_id"), lit(2L)))
      val postings = series.select(col("sid"), explode(map(
          lit("__name__"), col("event_type").cast("string"),
          lit("user"), col("user_id").cast("string"),
          lit("parity"), col("parity").cast("string")))
          .as(Seq("lname", "lvalue")))
      // The whole matcher BATTERY evaluates in one pass: a broadcast
      // 3-row matcher table joins the postings frame once per label
      // position (not once per matcher), so adding matchers costs rows
      // in a broadcast, never another postings scan — the batch shape a
      // real query frontend uses against one index.
      val m = s.createDataFrame(Seq(("m1", "click", "1"),
        ("m2", "error", "0"), ("m3", "view", "1")))
        .toDF("matcher", "mname", "mpar")
      val p1 = postings.filter(col("lname") === "__name__")
        .join(broadcast(m), col("lvalue") === col("mname"))
        .select(col("matcher"), col("sid"))
      val p2 = postings.filter(col("lname") === "parity")
        .join(broadcast(m), col("lvalue") === col("mpar"))
        .select(col("matcher"), col("sid"))
      val idx = p1.join(p2, Seq("matcher", "sid")) // postings intersection
        .join(series, "sid")
        .groupBy(col("matcher"))
        .agg(count(lit(1)).as("n_series_idx"),
          sum(col("n_samp")).as("n_samples_idx"),
          round(sum(col("sum_v")).cast("double"), 4).as("sum_idx"))
      val direct = ev
        .join(broadcast(m), col("event_type") === col("mname") &&
          pmod(col("user_id"), lit(2L)).cast("string") === col("mpar"))
        .groupBy(col("matcher"))
        .agg(count(lit(1)).as("n_samples_direct"),
          round(sum(round(col("value"), 6).cast("decimal(18,6)"))
            .cast("double"), 4).as("sum_direct"))
      val stats = postings.agg(
        countDistinct(struct(col("lname"), col("lvalue")))
          .as("n_postings_lists"),
        count(lit(1)).as("n_postings"))
      idx.join(direct, "matcher").crossJoin(broadcast(stats))
        .select(col("matcher"), col("n_series_idx"), col("n_samples_idx"),
          col("sum_idx"), col("n_samples_direct"), col("sum_direct"),
          col("n_postings_lists"), col("n_postings"))
        .orderBy(col("matcher"))
    }),

    // POSTINGS CODEC — q222's inverted index as BYTES (the index half of
    // a TSDB block beside q236's chunk half): each (label, value) list
    // of sorted series ids encodes to uvarint(count)·uvarint(first)·
    // uvarint(delta)…, whose length is a CLOSED FORM (⌈len(bin(x))/7⌉
    // per varint) the oracle recomputes without seeing the bytes —
    // the same two-implementations-one-answer proof as the chunk codec.
    // decode(encode(x)) == x per list in-result, and a matcher
    // INTERSECTION evaluated over DECODED lists must reproduce the
    // direct predicate scan's decimal-exact sum. The ~10-byte/series →
    // ~1.1-byte/posting compression is what lets a 100 TB block's index
    // sit in memory while chunks stay on disk.
    "q246_postings_codec" -> ((s, d) => {
      import graft.functions.Postings
      val ev = events(s, d)
      val series = ev.groupBy(col("event_type"), col("user_id"))
        .agg(min(col("event_id")).as("sid"),
          sum(round(col("value"), 6).cast("decimal(18,6)")).as("sum_v"))
        .withColumn("parity", pmod(col("user_id"), lit(2L)))
      val postings = series.select(col("sid"), explode(map(
          lit("__name__"), col("event_type").cast("string"),
          lit("user"), col("user_id").cast("string"),
          lit("parity"), col("parity").cast("string")))
          .as(Seq("lname", "lvalue")))
      val lists = postings.groupBy(col("lname"), col("lvalue"))
        .agg(sort_array(collect_list(col("sid"))).as("sids"))
        .withColumn("enc", Postings.encodeCol(col("sids")))
        .withColumn("dec", Postings.decodeCol(col("enc")))
      val aSide = lists.filter(col("lname") === "__name__" &&
        col("lvalue") === "click").select(explode(col("dec")).as("sid"))
      val bSide = lists.filter(col("lname") === "parity" &&
        col("lvalue") === "1").select(explode(col("dec")).as("sid"))
      val inter = aSide.join(bSide, "sid").join(series, "sid")
        .agg(count(lit(1)).as("n_click_odd_idx"),
          round(sum(col("sum_v")).cast("double"), 4).as("sum_click_odd_idx"))
      val direct = ev.filter(col("event_type") === "click" &&
          pmod(col("user_id"), lit(2L)) === 1)
        .agg(round(sum(round(col("value"), 6).cast("decimal(18,6)"))
          .cast("double"), 4).as("sum_click_odd_direct"))
      lists.groupBy(col("lname"))
        .agg(count(lit(1)).as("n_lists"),
          sum(size(col("sids"))).cast("long").as("n_postings"),
          sum(length(col("enc"))).cast("long").as("enc_bytes"),
          sum(when(col("dec") === col("sids"), 1L).otherwise(0L))
            .as("n_roundtrip_ok"),
          max(size(col("sids"))).cast("long").as("max_list_len"))
        .withColumn("bytes_per_posting",
          round(col("enc_bytes").cast("double") / col("n_postings"), 6))
        .crossJoin(broadcast(inter))
        .crossJoin(broadcast(direct))
        .orderBy(col("lname"))
    }),

    // TSDB RETENTION ENFORCEMENT (storage.tsdb.retention.time +
    // retention.size, both active): daily blocks; the time rule deletes
    // blocks wholly older than now − 20d, then the size rule walks the
    // SURVIVORS newest-first and keeps while the running size stays
    // under the cap (60% of eligible — upstream's oldest-first
    // deletion, expressed as a newest-first keep prefix). Size rides in
    // sample units (documented stand-in: the real byte model is
    // q201/q236's codec — composing it again adds no new proof). Every
    // decision and the kept blocks' decimal data sums are in-result;
    // the one unpartitioned window runs at BLOCK grain (≤ a few dozen
    // rows at any scale — blocks, not samples).
    "q251_retention_enforcement" -> ((s, d) => {
      val blocks = events(s, d)
        .groupBy(to_date(col("ts")).as("block_day"))
        .agg(count(lit(1)).as("n_samples"), max(col("ts")).as("max_t"),
          sum(round(col("value"), 6).cast("decimal(18,6)")).as("sum_v"))
      val glob = blocks.agg(max(col("max_t")).as("now"))
      val marked = blocks.crossJoin(broadcast(glob))
        .withColumn("time_deleted",
          col("max_t") < col("now") - expr("INTERVAL 20 DAYS"))
      val capDf = marked.filter(!col("time_deleted"))
        .agg(expr("(sum(n_samples) * 3) div 5").as("cap"))
      val wNewest = Window.orderBy(col("block_day").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      marked.crossJoin(broadcast(capDf))
        .withColumn("cum_newest",
          when(col("time_deleted"), lit(null)).otherwise(
            sum(when(!col("time_deleted"), col("n_samples")))
              .over(wNewest)))
        .withColumn("reason",
          when(col("time_deleted"), "time")
            .when(col("cum_newest") > col("cap"), "size")
            .otherwise("kept"))
        .select(col("block_day"), col("n_samples"),
          coalesce(col("cum_newest"), lit(-1L)).as("cum_newest"),
          col("reason"),
          round(when(col("reason") === "kept", col("sum_v"))
            .otherwise(lit(0).cast("decimal(18,6)")).cast("double"), 4)
            .as("kept_sum_v"))
        .orderBy(col("block_day"))
    }),

    // PHYSICAL TSDB BLOCK roundtrip — the two codecs COMPOSED into an
    // at-rest block and queried back: chunks = per-(series, 120-sample
    // cut) XOR bytes with zone-map (min_t, max_t) columns, index =
    // per-(label, value) postings bytes; both written to parquet and
    // re-read (a real block directory, ~10 B/sample at rest), then a
    // matcher battery × a 24 h range is served ENTIRELY from the block:
    // postings decode → sid intersection → zone-map chunk skip → XOR
    // decode → range filter — and must reproduce the direct raw-table
    // scan decimal for decimal. n_chunks_read/skipped measures what the
    // zone map saved; the oracle re-derives the chunk grid and the skip
    // counts without ever seeing a byte.
    "q248_physical_block" -> ((s, d) => {
      import s.implicits._
      import graft.functions.{DoubleFromBits, Postings, VectorFunctions, XorChunk}
      val lo = 1704888000000L // 2024-01-10 12:00:00 UTC (ms)
      val hi = 1704974400000L // 2024-01-11 12:00:00 UTC
      val span = events(s, d)
        .filter(col("ts") >= lit("2024-01-10").cast("timestamp") &&
          col("ts") < lit("2024-01-12").cast("timestamp"))
        .select(col("event_type"), col("user_id"),
          expr("unix_micros(ts) div 1000").as("t_ms"), col("event_id"),
          round(col("value"), 6).as("v"))
      val series = span.groupBy(col("event_type"), col("user_id"))
        .agg(min(col("event_id")).as("sid"))
        .withColumn("parity", pmod(col("user_id"), lit(2L)))
      val wS = Window.partitionBy(col("sid"))
        .orderBy(col("t_ms"), col("event_id"))
      val chunks = span.join(series, Seq("event_type", "user_id"))
        .withColumn("b", VectorFunctions.doubleBits(col("v").cast("double")))
        .withColumn("seq", (row_number().over(wS) - 1).cast("long"))
        .withColumn("chunk", expr("seq div 120"))
        .groupBy(col("sid"), col("chunk"))
        .agg(min(col("t_ms")).as("min_t"), max(col("t_ms")).as("max_t"),
          XorChunk.encodeCol(sort_array(collect_list(
            struct(col("t_ms").as("t"), col("b").as("b"))))).as("data"))
      val index = series.select(col("sid"), explode(map(
          lit("__name__"), col("event_type").cast("string"),
          lit("parity"), col("parity").cast("string")))
          .as(Seq("lname", "lvalue")))
        .groupBy(col("lname"), col("lvalue"))
        .agg(Postings.encodeCol(sort_array(collect_list(col("sid"))))
          .as("plist"))
      val base = new java.io.File(sys.props("java.io.tmpdir"),
        "graft-block-" + Integer.toHexString(d.hashCode))
      chunks.write.mode("overwrite")
        .parquet(new java.io.File(base, "chunks").getAbsolutePath)
      index.write.mode("overwrite")
        .parquet(new java.io.File(base, "index").getAbsolutePath)
      val chunksR = s.read.parquet(new java.io.File(base, "chunks").getAbsolutePath)
      val indexR = s.read.parquet(new java.io.File(base, "index").getAbsolutePath)
      val m = Seq(("m1", "click", "1"), ("m2", "error", "0"),
        ("m3", "view", "1")).toDF("matcher", "mname", "mpar")
      val pName = indexR.filter(col("lname") === "__name__")
        .join(broadcast(m), col("lvalue") === col("mname"))
        .select(col("matcher"),
          explode(Postings.decodeCol(col("plist"))).as("sid"))
      val pPar = indexR.filter(col("lname") === "parity")
        .join(broadcast(m), col("lvalue") === col("mpar"))
        .select(col("matcher"),
          explode(Postings.decodeCol(col("plist"))).as("sid"))
      val sids = pName.join(pPar, Seq("matcher", "sid"))
      val cands = chunksR.join(sids, "sid")
        .withColumn("hit", col("min_t") < hi && col("max_t") >= lo)
      val chunkStats = cands.groupBy(col("matcher"))
        .agg(count(lit(1)).as("n_chunks_matched"),
          sum(when(col("hit"), 1L).otherwise(0L)).as("n_chunks_read"))
      val idxFace = cands.filter(col("hit"))
        .select(col("matcher"),
          explode(XorChunk.decodeCol(col("data"))).as("smp"))
        .filter(col("smp.t") >= lo && col("smp.t") < hi)
        .withColumn("v", DoubleFromBits(col("smp.b")))
        .groupBy(col("matcher"))
        .agg(count(lit(1)).as("n_idx"),
          round(sum(col("v").cast("decimal(18,6)")).cast("double"), 4)
            .as("sum_idx"))
      val direct = events(s, d)
        .filter(expr("unix_micros(ts) div 1000") >= lo &&
          expr("unix_micros(ts) div 1000") < hi)
        .join(broadcast(m), col("event_type") === col("mname") &&
          pmod(col("user_id"), lit(2L)).cast("string") === col("mpar"))
        .groupBy(col("matcher"))
        .agg(count(lit(1)).as("n_direct"),
          round(sum(round(col("value"), 6).cast("decimal(18,6)"))
            .cast("double"), 4).as("sum_direct"))
      idxFace.join(direct, "matcher").join(chunkStats, "matcher")
        .orderBy(col("matcher"))
    }),

    // CREATED-TIMESTAMP zero-ingestion (Prometheus 3.x
    // `created-timestamp-zero-ingestion`): a counter that exposes its
    // creation instant (OpenMetrics `_created` / the PRW CT field) gets
    // a synthetic ZERO sample ingested at CT, so increase() over a
    // window containing the series' birth counts the head increment the
    // naive fold misses (the first in-window sample contributes 0 when
    // it has no predecessor). Counters here are per-(type, user)
    // all-time cumsums; CT = first sample − 1 ms; the [Jan 2, Jan 6)
    // window has both old series (no injection, naive ≡ CT) and ~150
    // series born inside it (the CT face recovers their first value).
    // Both faces are the same one-window-one-agg shape; the injection
    // is a series-grain union, never a sample re-scan.
    "q223_created_timestamp" -> ((s, d) => {
      val winStart = "2024-01-02 00:00:00"
      val winEnd = "2024-01-06 00:00:00"
      val wCum = Window.partitionBy(col("event_type"), col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val counter = events(s, d)
        .withColumn("cnt_v",
          sum(round(col("value"), 6).cast("decimal(18,6)")).over(wCum)
            .cast("double"))
        .select(col("event_type"), col("user_id"), col("ts"),
          col("event_id"), col("cnt_v"))
      val win = counter
        .filter(col("ts") >= lit(winStart).cast("timestamp") &&
          col("ts") < lit(winEnd).cast("timestamp"))
      val zeros = events(s, d)
        .groupBy(col("event_type"), col("user_id"))
        .agg(min(col("ts")).as("first_ts"))
        .withColumn("ct", expr("first_ts - INTERVAL 1 MILLISECOND"))
        .filter(col("ct") >= lit(winStart).cast("timestamp") &&
          col("ct") < lit(winEnd).cast("timestamp"))
        .select(col("event_type"), col("user_id"), col("ct").as("ts"),
          lit(-1L).as("event_id"), lit(0.0).as("cnt_v"))
      def fold(df: DataFrame, name: String) =
        graft.metrics.PromQl.counterIncrease(df,
            Seq("event_type", "user_id"), "ts", "event_id", "cnt_v")
          .groupBy(col("event_type"))
          .agg(round(sum(round(col("inc"), 6).cast("decimal(18,6)"))
            .cast("double"), 4).as(name))
      fold(win, "increase_naive")
        .join(fold(win.unionByName(zeros), "increase_ct"), "event_type")
        .join(zeros.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_zero_injected")), "event_type")
        .orderBy(col("event_type"))
    }),

    // ACTIVE-SERIES TRACKING + churn (the Mimir active-series tracker /
    // `prometheus_tsdb_head_series` accounting, daily grain): at each
    // daily mark, a series is ACTIVE when it produced a sample in the
    // trailing 24 h, NEW when its first-ever sample falls in that day,
    // CHURNED when its last-ever sample fell in the PREVIOUS day (it
    // went silent). A 24 h window at daily marks means each sample
    // activates exactly one mark, so the whole grid is keyed daily
    // countDistincts — no mark × sample range join, the shape that
    // keeps a billion-series tracker one agg wide. Cumulative
    // registrations ride a per-tenant running sum over the day grid.
    "q224_active_series" -> ((s, d) => {
      val lo = "2024-01-05"; val hi = "2024-01-25"
      val ev = events(s, d)
        .withColumn("tenant", concat(lit("t"), pmod(col("user_id"), lit(3L))))
      val active = ev
        .withColumn("day", to_date(col("ts")))
        .groupBy(col("tenant"), col("day"))
        .agg(countDistinct(col("event_type"), col("user_id")).as("n_active"))
      val span = ev.groupBy(col("tenant"), col("event_type"), col("user_id"))
        .agg(min(to_date(col("ts"))).as("first_day"),
          max(to_date(col("ts"))).as("last_day"))
      val born = span.groupBy(col("tenant"), col("first_day").as("day"))
        .agg(count(lit(1)).as("n_new"))
      val churn = span
        .groupBy(col("tenant"), date_add(col("last_day"), 1).as("day"))
        .agg(count(lit(1)).as("n_churned"))
      val w = Window.partitionBy(col("tenant")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      active.join(born, Seq("tenant", "day"), "left")
        .join(churn, Seq("tenant", "day"), "left")
        .na.fill(0L, Seq("n_new", "n_churned"))
        .withColumn("n_registered", sum(col("n_new")).over(w))
        .filter(col("day") >= lit(lo).cast("date") &&
          col("day") < lit(hi).cast("date"))
        .orderBy(col("tenant"), col("day"))
    }))

  val oracle: Map[String, String] = Map(
    // Same running-max head classification; DuckDB's window max over the
    // same (event_type, event_id) arrival order.
    "q216_ooo_ingest" ->
      """WITH s AS (
        |  SELECT event_type, event_id, value,
        |    epoch_us(ts) - CAST(CASE WHEN b >= 9 THEN 10800
        |                             WHEN b >= 7 THEN 1800 ELSE 0 END
        |      AS BIGINT) * 1000000 AS t_us
        |  FROM (SELECT *,
        |          CAST(concat('0x', substr(md5('ooo|' || event_id), 1, 6))
        |            AS BIGINT) % 10 AS b
        |        FROM events)
        |), c AS (
        |  SELECT *, max(t_us) OVER (PARTITION BY event_type ORDER BY event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS head_max
        |  FROM s
        |), k AS (
        |  SELECT *, CASE
        |    WHEN head_max IS NULL OR t_us >= head_max THEN 'in_order'
        |    WHEN head_max - t_us <= 3600000000 THEN 'ooo'
        |    ELSE 'too_old' END AS cls
        |  FROM c
        |)
        |SELECT event_type,
        |  CAST(sum(CASE WHEN cls = 'in_order' THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_in_order,
        |  CAST(sum(CASE WHEN cls = 'ooo' THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_ooo,
        |  CAST(sum(CASE WHEN cls = 'too_old' THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_too_old,
        |  count(DISTINCT CASE WHEN cls <> 'too_old' THEN t_us END)
        |    AS n_unique_ts,
        |  round(CAST(sum(CASE WHEN cls <> 'too_old'
        |    THEN CAST(round(value, 6) AS DECIMAL(18,6)) END) AS DOUBLE), 4)
        |    AS sum_merged,
        |  max(CASE WHEN cls <> 'too_old' THEN t_us END) AS max_accepted_us
        |FROM k GROUP BY 1 ORDER BY event_type""".stripMargin,

    // Same series-grain admission rank; first_seen = min(event_id) is
    // unique across series, so row_number is deterministic.
    "q217_tenant_limits" ->
      """WITH series AS (
        |  SELECT 't' || (user_id % 3) AS tenant, event_type, user_id,
        |    min(event_id) AS first_seen, count(*) AS n_samp,
        |    sum(CAST(round(value, 6) AS DECIMAL(18,6))) AS sum_v
        |  FROM events GROUP BY 1, 2, 3
        |), admitted AS (
        |  SELECT *, row_number() OVER
        |    (PARTITION BY tenant ORDER BY first_seen) <= 150 AS accepted
        |  FROM series
        |)
        |SELECT tenant, event_type,
        |  count(*) AS n_series,
        |  CAST(sum(CASE WHEN accepted THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_series_accepted,
        |  CAST(sum(n_samp) AS BIGINT) AS n_samples,
        |  CAST(sum(CASE WHEN accepted THEN n_samp ELSE 0 END) AS BIGINT)
        |    AS n_samples_accepted,
        |  CAST(sum(CASE WHEN NOT accepted THEN n_samp ELSE 0 END) AS BIGINT)
        |    AS n_samples_discarded,
        |  round(CAST(sum(CASE WHEN accepted THEN sum_v
        |    ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE), 4) AS sum_accepted
        |FROM admitted GROUP BY 1, 2 ORDER BY tenant, event_type""".stripMargin,

    // Same ring ranks, replica routing, and quorum fold; range() is
    // end-exclusive; sum_quorum ≡ sum_direct is the availability check.
    "q219_shuffle_shard_quorum" ->
      """WITH ring0 AS (
        |  SELECT t.tenant, i.ing,
        |    CAST(concat('0x', substr(md5('ring|' || t.tenant || '|' || i.ing),
        |      1, 12)) AS BIGINT) AS hk
        |  FROM (SELECT 't' || unnest(range(0, 3)) AS tenant) t,
        |       (SELECT unnest(range(0, 12)) AS ing) i
        |), ring AS (
        |  SELECT * FROM (
        |    SELECT tenant, ing, row_number() OVER
        |      (PARTITION BY tenant ORDER BY hk, ing) - 1 AS pos
        |    FROM ring0) WHERE pos < 4
        |), ev AS (
        |  SELECT 't' || (user_id % 3) AS tenant, event_type, user_id,
        |    event_id, value
        |  FROM events
        |), series AS (
        |  SELECT DISTINCT tenant, event_type, user_id,
        |    CAST(concat('0x', substr(md5('ser|' || event_type || '|' ||
        |      user_id), 1, 12)) AS BIGINT) % 4 AS p0
        |  FROM ev
        |), replicas AS (
        |  SELECT s.tenant, s.event_type, s.user_id, ring.ing
        |  FROM (SELECT *, unnest(range(0, 3)) AS r FROM series) s
        |  JOIN ring ON ring.tenant = s.tenant
        |    AND ring.pos = (s.p0 + s.r) % 4
        |), quorum AS (
        |  SELECT e.tenant, e.event_type, e.user_id, e.event_id, e.value,
        |    count(*) AS n_rep,
        |    sum(CASE WHEN r.ing <> 3 THEN 1 ELSE 0 END) AS n_surv
        |  FROM ev e JOIN replicas r
        |    USING (tenant, event_type, user_id)
        |  GROUP BY 1, 2, 3, 4, 5
        |), per_tenant AS (
        |  SELECT tenant,
        |    count(DISTINCT (event_type, user_id)) AS n_series,
        |    count(*) AS n_samples,
        |    CAST(sum(n_rep) AS BIGINT) AS n_copies,
        |    CAST(sum(3 - n_surv) AS BIGINT) AS n_copies_lost,
        |    CAST(sum(CASE WHEN n_surv >= 2 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_quorum_ok,
        |    round(CAST(sum(CASE WHEN n_surv >= 2
        |      THEN CAST(round(value, 6) AS DECIMAL(18,6)) END) AS DOUBLE), 4)
        |      AS sum_quorum
        |  FROM quorum GROUP BY 1
        |), direct AS (
        |  SELECT tenant, round(CAST(sum(CAST(round(value, 6)
        |    AS DECIMAL(18,6))) AS DOUBLE), 4) AS sum_direct
        |  FROM ev GROUP BY 1
        |), shard AS (
        |  SELECT tenant, string_agg(ing, ',' ORDER BY ing) AS shard_ings
        |  FROM ring GROUP BY 1
        |)
        |SELECT p.*, d.sum_direct, s.shard_ings
        |FROM per_tenant p JOIN direct d USING (tenant)
        |JOIN shard s USING (tenant)
        |ORDER BY tenant""".stripMargin,

    // Same postings build (UNION ALL per label), same sid intersections.
    // Same two-rule walk: time mark, eligible cap, newest-first keep
    // prefix; kept sums decimal-exact.
    "q251_retention_enforcement" ->
      """WITH blocks AS (
        |  SELECT CAST(ts AS DATE) AS block_day, count(*) AS n_samples,
        |    max(ts) AS max_t,
        |    sum(CAST(round(value, 6) AS DECIMAL(18,6))) AS sum_v
        |  FROM events GROUP BY 1
        |), g AS (SELECT max(max_t) AS now FROM blocks
        |), mk AS (
        |  SELECT b.*, b.max_t < g.now - INTERVAL 20 DAYS AS time_deleted
        |  FROM blocks b, g
        |), cap AS (
        |  SELECT (sum(n_samples) * 3) // 5 AS cap FROM mk WHERE NOT time_deleted
        |), j AS (
        |  SELECT mk.*, cap.cap,
        |    CASE WHEN time_deleted THEN NULL ELSE
        |      sum(CASE WHEN NOT time_deleted THEN n_samples END)
        |        OVER (ORDER BY block_day DESC
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    END AS cum_newest
        |  FROM mk, cap
        |)
        |SELECT block_day, n_samples,
        |  CAST(coalesce(cum_newest, -1) AS BIGINT) AS cum_newest,
        |  CASE WHEN time_deleted THEN 'time'
        |       WHEN cum_newest > cap THEN 'size' ELSE 'kept' END AS reason,
        |  round(CAST(CASE WHEN NOT time_deleted AND cum_newest <= cap
        |    THEN sum_v ELSE CAST(0 AS DECIMAL(18,6)) END AS DOUBLE), 4)
        |    AS kept_sum_v
        |FROM j ORDER BY block_day""".stripMargin,

    // The chunk grid, zone-map skips, and range sums re-derived from raw
    // rows — the engine's idx face (postings decode → intersection →
    // zone skip → XOR decode) must land on the same numbers as its own
    // direct face AND this blind twin.
    "q248_physical_block" ->
      """WITH m AS (
        |  SELECT * FROM (VALUES ('m1', 'click', 1), ('m2', 'error', 0),
        |    ('m3', 'view', 1)) AS t(matcher, mname, mpar)
        |), span AS (
        |  SELECT event_type, user_id, epoch_us(ts) // 1000 AS t_ms, event_id
        |  FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-12'
        |), series AS (
        |  SELECT event_type, user_id, min(event_id) AS sid,
        |    user_id % 2 AS parity
        |  FROM span GROUP BY 1, 2
        |), sp AS (
        |  SELECT span.t_ms, span.event_id, series.sid
        |  FROM span JOIN series USING (event_type, user_id)
        |), cagg AS (
        |  SELECT sid, chunk, min(t_ms) AS min_t, max(t_ms) AS max_t FROM (
        |    SELECT sid, t_ms, (row_number() OVER (PARTITION BY sid
        |      ORDER BY t_ms, event_id) - 1) // 120 AS chunk
        |    FROM sp
        |  ) GROUP BY 1, 2
        |), ms AS (
        |  SELECT m.matcher, s.sid FROM m JOIN series s
        |    ON s.event_type = m.mname AND s.parity = m.mpar
        |), cstat AS (
        |  SELECT ms.matcher, count(*) AS n_chunks_matched,
        |    sum(CASE WHEN c.min_t < 1704974400000
        |      AND c.max_t >= 1704888000000 THEN 1 ELSE 0 END)
        |      AS n_chunks_read
        |  FROM ms JOIN cagg c USING (sid) GROUP BY 1
        |), agg AS (
        |  SELECT m.matcher, count(*) AS n,
        |    round(CAST(sum(CAST(round(e.value, 6) AS DECIMAL(18,6)))
        |      AS DOUBLE), 4) AS sm
        |  FROM events e JOIN m
        |    ON e.event_type = m.mname AND e.user_id % 2 = m.mpar
        |  WHERE epoch_us(e.ts) // 1000 >= 1704888000000
        |    AND epoch_us(e.ts) // 1000 < 1704974400000
        |  GROUP BY 1
        |)
        |SELECT a.matcher, a.n AS n_idx, a.sm AS sum_idx,
        |  a.n AS n_direct, a.sm AS sum_direct,
        |  CAST(c.n_chunks_matched AS BIGINT) AS n_chunks_matched,
        |  CAST(c.n_chunks_read AS BIGINT) AS n_chunks_read
        |FROM agg a JOIN cstat c USING (matcher) ORDER BY a.matcher""".stripMargin,

    // The closed-form byte accounting: per list, uvarint(count) +
    // uvarint(first) + Σ uvarint(delta), each ⌈len(bin(x))/7⌉ bytes;
    // intersection/direct sums straight from the series/raw tables.
    "q246_postings_codec" ->
      """WITH series AS (
        |  SELECT event_type, user_id, min(event_id) AS sid,
        |    sum(CAST(round(value, 6) AS DECIMAL(18,6))) AS sum_v
        |  FROM events GROUP BY 1, 2
        |), p AS (
        |  SELECT sid, '__name__' AS lname, event_type AS lvalue FROM series
        |  UNION ALL
        |  SELECT sid, 'user', CAST(user_id AS VARCHAR) FROM series
        |  UNION ALL
        |  SELECT sid, 'parity', CAST(user_id % 2 AS VARCHAR) FROM series
        |), o AS (
        |  SELECT lname, lvalue, sid, lag(sid) OVER w AS prev,
        |    count(*) OVER (PARTITION BY lname, lvalue) AS cnt
        |  FROM p WINDOW w AS (PARTITION BY lname, lvalue ORDER BY sid)
        |), b AS (
        |  SELECT lname, lvalue, any_value(cnt) AS cnt,
        |    CAST(sum((len(bin(CASE WHEN prev IS NULL THEN sid
        |      ELSE sid - prev END)) + 6) // 7) AS BIGINT) AS body_bytes
        |  FROM o GROUP BY 1, 2
        |), lists AS (
        |  SELECT lname, lvalue, cnt,
        |    body_bytes + (len(bin(cnt)) + 6) // 7 AS bytes
        |  FROM b
        |), agg AS (
        |  SELECT lname, count(*) AS n_lists,
        |    CAST(sum(cnt) AS BIGINT) AS n_postings,
        |    CAST(sum(bytes) AS BIGINT) AS enc_bytes,
        |    count(*) AS n_roundtrip_ok,
        |    CAST(max(cnt) AS BIGINT) AS max_list_len
        |  FROM lists GROUP BY 1
        |), inter AS (
        |  SELECT count(*) AS n_click_odd_idx,
        |    round(CAST(sum(sum_v) AS DOUBLE), 4) AS sum_click_odd_idx
        |  FROM series WHERE event_type = 'click' AND user_id % 2 = 1
        |), direct AS (
        |  SELECT round(CAST(sum(CAST(round(value, 6) AS DECIMAL(18,6)))
        |    AS DOUBLE), 4) AS sum_click_odd_direct
        |  FROM events WHERE event_type = 'click' AND user_id % 2 = 1
        |)
        |SELECT a.lname, a.n_lists, a.n_postings, a.enc_bytes,
        |  a.n_roundtrip_ok, a.max_list_len,
        |  round(CAST(a.enc_bytes AS DOUBLE) / a.n_postings, 6)
        |    AS bytes_per_posting,
        |  i.n_click_odd_idx, i.sum_click_odd_idx, d.sum_click_odd_direct
        |FROM agg a CROSS JOIN inter i CROSS JOIN direct d
        |ORDER BY a.lname""".stripMargin,

    "q222_postings_index" ->
      """WITH series AS (
        |  SELECT event_type, user_id, user_id % 2 AS parity,
        |    min(event_id) AS sid, count(*) AS n_samp,
        |    sum(CAST(round(value, 6) AS DECIMAL(18,6))) AS sum_v
        |  FROM events GROUP BY 1, 2, 3
        |), postings AS (
        |  SELECT sid, '__name__' AS lname, event_type AS lvalue FROM series
        |  UNION ALL SELECT sid, 'user', CAST(user_id AS VARCHAR) FROM series
        |  UNION ALL SELECT sid, 'parity', CAST(parity AS VARCHAR) FROM series
        |), st AS (
        |  SELECT count(DISTINCT (lname, lvalue)) AS n_postings_lists,
        |    count(*) AS n_postings
        |  FROM postings
        |), faces AS (
        |  SELECT m.matcher, count(*) AS n_series_idx,
        |    CAST(sum(s.n_samp) AS BIGINT) AS n_samples_idx,
        |    round(CAST(sum(s.sum_v) AS DOUBLE), 4) AS sum_idx
        |  FROM (VALUES ('m1', 'click', '1'), ('m2', 'error', '0'),
        |        ('m3', 'view', '1')) AS m(matcher, nm, par)
        |  JOIN postings p1 ON p1.lname = '__name__' AND p1.lvalue = m.nm
        |  JOIN postings p2 ON p2.lname = 'parity' AND p2.lvalue = m.par
        |    AND p2.sid = p1.sid
        |  JOIN series s ON s.sid = p1.sid
        |  GROUP BY 1
        |), direct AS (
        |  SELECT m.matcher, count(*) AS n_samples_direct,
        |    round(CAST(sum(CAST(round(e.value, 6) AS DECIMAL(18,6)))
        |      AS DOUBLE), 4) AS sum_direct
        |  FROM (VALUES ('m1', 'click', 1), ('m2', 'error', 0),
        |        ('m3', 'view', 1)) AS m(matcher, nm, par)
        |  JOIN events e ON e.event_type = m.nm AND e.user_id % 2 = m.par
        |  GROUP BY 1
        |)
        |SELECT f.matcher, f.n_series_idx, f.n_samples_idx, f.sum_idx,
        |  d.n_samples_direct, d.sum_direct, st.n_postings_lists,
        |  st.n_postings
        |FROM faces f JOIN direct d USING (matcher), st
        |ORDER BY f.matcher""".stripMargin,

    // Same all-time cumsum counters, same CT = first_ts − 1 ms zero
    // injection (event_id −1 orders the zero before its first sample).
    "q223_created_timestamp" ->
      """WITH c AS (
        |  SELECT event_type, user_id, ts, event_id,
        |    CAST(sum(CAST(round(value, 6) AS DECIMAL(18,6))) OVER
        |      (PARTITION BY event_type, user_id ORDER BY ts, event_id
        |       ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS cnt_v
        |  FROM events
        |), win AS (
        |  SELECT * FROM c
        |  WHERE ts >= TIMESTAMP '2024-01-02' AND ts < TIMESTAMP '2024-01-06'
        |), zeros AS (
        |  SELECT event_type, user_id,
        |    min(ts) - INTERVAL 1 MILLISECOND AS ts,
        |    CAST(-1 AS BIGINT) AS event_id, 0.0 AS cnt_v
        |  FROM events GROUP BY 1, 2
        |  HAVING min(ts) - INTERVAL 1 MILLISECOND >= TIMESTAMP '2024-01-02'
        |     AND min(ts) - INTERVAL 1 MILLISECOND < TIMESTAMP '2024-01-06'
        |), naive AS (
        |  SELECT event_type,
        |    round(CAST(sum(CAST(round(CASE WHEN prev IS NULL THEN 0.0
        |      WHEN cnt_v - prev < 0 THEN cnt_v ELSE cnt_v - prev END, 6)
        |      AS DECIMAL(18,6))) AS DOUBLE), 4) AS increase_naive
        |  FROM (SELECT *, lag(cnt_v) OVER (PARTITION BY event_type, user_id
        |          ORDER BY ts, event_id) AS prev FROM win)
        |  GROUP BY 1
        |), ct AS (
        |  SELECT event_type,
        |    round(CAST(sum(CAST(round(CASE WHEN prev IS NULL THEN 0.0
        |      WHEN cnt_v - prev < 0 THEN cnt_v ELSE cnt_v - prev END, 6)
        |      AS DECIMAL(18,6))) AS DOUBLE), 4) AS increase_ct
        |  FROM (SELECT *, lag(cnt_v) OVER (PARTITION BY event_type, user_id
        |          ORDER BY ts, event_id) AS prev
        |        FROM (SELECT event_type, user_id, ts, event_id, cnt_v FROM win
        |              UNION ALL SELECT * FROM zeros))
        |  GROUP BY 1
        |), nz AS (
        |  SELECT event_type, count(*) AS n_zero_injected
        |  FROM zeros GROUP BY 1
        |)
        |SELECT n.event_type, n.increase_naive, c2.increase_ct,
        |  nz.n_zero_injected
        |FROM naive n JOIN ct c2 USING (event_type)
        |JOIN nz USING (event_type)
        |ORDER BY n.event_type""".stripMargin,

    // Same daily-mark identities; the running registration sum computes
    // BEFORE the [lo, hi) grid filter (subquery), as in the engine.
    "q224_active_series" ->
      """WITH ev AS (
        |  SELECT 't' || (user_id % 3) AS tenant, event_type, user_id,
        |    CAST(ts AS DATE) AS day
        |  FROM events
        |), active AS (
        |  SELECT tenant, day,
        |    count(DISTINCT (event_type, user_id)) AS n_active
        |  FROM ev GROUP BY 1, 2
        |), span AS (
        |  SELECT tenant, event_type, user_id,
        |    min(day) AS first_day, max(day) AS last_day
        |  FROM ev GROUP BY 1, 2, 3
        |), born AS (
        |  SELECT tenant, first_day AS day, count(*) AS n_new
        |  FROM span GROUP BY 1, 2
        |), churn AS (
        |  SELECT tenant, last_day + 1 AS day, count(*) AS n_churned
        |  FROM span GROUP BY 1, 2
        |), j AS (
        |  SELECT a.tenant, a.day, a.n_active,
        |    coalesce(b.n_new, 0) AS n_new,
        |    coalesce(c.n_churned, 0) AS n_churned
        |  FROM active a LEFT JOIN born b USING (tenant, day)
        |  LEFT JOIN churn c USING (tenant, day)
        |), r AS (
        |  SELECT *, CAST(sum(n_new) OVER (PARTITION BY tenant ORDER BY day
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_registered
        |  FROM j
        |)
        |SELECT tenant, day, n_active, CAST(n_new AS BIGINT) AS n_new,
        |  CAST(n_churned AS BIGINT) AS n_churned, n_registered
        |FROM r
        |WHERE day >= DATE '2024-01-05' AND day < DATE '2024-01-25'
        |ORDER BY tenant, day""".stripMargin)
}
