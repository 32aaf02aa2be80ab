package graft.stream

import graft.Tables
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Typed event row for streaming stages (≅ the reference's stream payload,
  * SURVEY §1.2: composite key (user_id, event_type), ts, value). */
case class Ev(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
              event_type: String, value: Double)

/** Emitted window record (P3 output shape, FIXTURES.md B2). */
case class WinOut(user_id: Long, event_type: String, end_ts: java.sql.Timestamp,
                  win_mean: Double)

/** Per-key assembler state: the trailing w−1 samples. */
case class AsmState(buf: Seq[(Long, Double)])

/** Emitted window record carrying the FULL vector (trained-model scoring
  * needs the shape, not just the mean). */
case class WinVec(user_id: Long, event_type: String, end_ts: java.sql.Timestamp,
                  win_arr: Seq[Double])

/** Emitted per-sample increase record (PromQL `increase()`, streaming form). */
case class IncOut(user_id: Long, event_type: String, ts: java.sql.Timestamp,
                  inc: Double, reset: Int)

/** Emitted multivariate window record: a `[w × n_features]` matrix per
  * key (the reference's 2-D window payload — see [[graft.anomaly.MultiVar]]). */
case class MatOut(user_id: Long, end_ts: java.sql.Timestamp,
                  mat: Seq[Seq[Double]])

/** Per-key co-windowing state: last known value per feature (carry-
  * forward), the currently open step (epoch ms; MinValue = none) with its
  * in-step values, and the trailing ≤w completed step-vectors. Bounded:
  * |features| + w·|features| doubles per key. */
case class CoWinState(lastVals: Map[String, Double], curStep: Long,
                      curVals: Map[String, Double], buf: Seq[Seq[Double]])

/** Per-series counter state: the last observed value plus its event-time
  * position (ts ms, ts nanos, event_id) — the position makes out-of-order
  * arrivals detectable (see [[StreamOps.streamingIncrease]]). */
case class IncState(last: Double, tsMs: Long, tsNanos: Int, eventId: Long)

/** Streaming alert state per series: the open hour + its qualifying
  * count, the active run's start step, and the last closed ACTIVE step
  * (contiguity probe). Four longs — O(1) at 10M series. */
/** Streaming HA-tracker state (Cortex/Mimir ha_tracker, per cluster):
  * the elected replica, its last-seen second, accept/reject/election
  * counters, and the accepted-value sum in 1e-6 fixed-point units
  * (exact decimal accumulation). Six fields — O(1) per cluster. */
case class HaState(elected: String, lastSec: Long, nacc: Long, nrej: Long,
                   nelect: Long, vsumMicros: Long)
case class HaOut(event_type: String, elected_final: String,
                 n_elections: Long, n_accepted: Long, n_rejected: Long,
                 sum_accepted: Double)

/** Streaming Gorilla/XOR encoder state per series: the open chunk's
  * index/counters plus the codec registers (two timestamp lags, previous
  * value bits, leading/trailing window) — O(1), the exact state the
  * Prometheus head appender holds per series. */
case class XorState(chunk: Long, idx: Long, t1: Long, t2: Long,
                    prevBits: Long, lead: Int, trail: Int,
                    tsBits: Long, valBits: Long,
                    nzero: Long, nreuse: Long, nnew: Long)
case class XorChunkOut(event_type: String, shard: Long, chunk: Long,
                       n_samples: Long, ts_bits: Long, val_bits: Long,
                       n_xor_zero: Long, n_window_reuse: Long,
                       n_new_window: Long)

/** Streaming OOO-head state per series: exactly the head's registers —
  * maxTime plus accept/reject counters and the accepted-value sum in
  * 1e-6 fixed-point units. O(1) per series; the in-memory face the WBL
  * would rebuild on restart. */
case class OooState(headMaxUs: Long, nIn: Long, nOoo: Long, nOld: Long,
                    sumUnits: Long, maxAccUs: Long)
case class OooOut(event_type: String, n_in_order: Long, n_ooo: Long,
                  n_too_old: Long, sum_merged: Double,
                  max_accepted_us: Long)

/** Streaming delta→cumulative state: per in-key bucket the converter's
  * registers — running total in 1e-6 fixed point + point count. */
case class D2cState(subs: Map[String, Seq[Long]])
/** Per-bucket registers of the restart-aware face: fixed-point units of
  * the CURRENT accumulation segment, the pre-restart peak, restart-seen
  * flag (0/1), point count. */
case class D2cRState(subs: Map[String, Seq[Long]])
case class D2cROut(event_type: String, bucket: String, n_points: Long,
                   cum_premid: Double, cum_final: Double)
case class D2cOut(event_type: String, bucket: String, which: String,
                  rn: Long, cum: Double)

/** Streaming stale-gap state: per (series-key, instance) the scrape
  * loop's own registers — last seen hour, present-hour and gap counters
  * (the marker count), first hour. O(1) per target. */
case class StaleSub(lastH: Long, nHours: Long, nGaps: Long,
                    nMissed: Long, firstH: Long)
case class StaleGapState(subs: Map[Int, StaleSub])
case class StaleGapOut(event_type: String, instance: Int, n_hours: Long,
                       n_gaps: Long, n_missed_hours: Long,
                       first_h_ms: Long, last_h_ms: Long)

/** Streaming tenant-limiter state (the Mimir ingester's own memory
  * shape): the per-series admission map (exactly what the ingester's
  * series map holds), the admitted count against the cap, per-type
  * counter rows [nSamp, nAcc, nDisc, sumUnits], and an emitted flag so
  * only the first flush sentinel produces output. State is
  * series-cardinality — the ingester's true footprint, bounded by the
  * cap it enforces. */
case class TlState(seen: Map[String, Boolean], nAdm: Long,
                   ctrs: Map[String, Seq[Long]], emitted: Boolean)
case class TlOut(tenant: String, event_type: String, n_series: Long,
                 n_series_accepted: Long, n_samples: Long,
                 n_samples_accepted: Long, n_samples_discarded: Long,
                 sum_accepted: Double)

/** Streaming-CUSUM state: the open hour, its count so far, and the CUSUM
  * in 1e-6 fixed-point units (exact decimal recursion). */
case class CusumState(curStep: Long, curCount: Long, sUnits: Long)
case class CusumOut(event_type: String, h: java.sql.Timestamp,
                    cusum: Double, cp: Boolean)

case class AlertState(curStep: Long, curCount: Long, runStart: Long,
                      lastActive: Long)

/** One ALERTS{...} sample: a closed ACTIVE hourly step with its
  * pending/firing verdict and the qualifying count as the value. */
case class AlertOut(event_type: String, step_ts: java.sql.Timestamp,
                    alertstate: String, value: Double)

/** Structured Streaming operators (SURVEY §2 E41–E47, P1/P3/P4/P11).
  *
  * Test harness pattern: the batch parquet events are replayed through a
  * `MemoryStream` in event-time-ordered chunks, so watermarks advance
  * between micro-batches and append-mode operators flush deterministically.
  * On a real cluster the same plans run unchanged off Kafka/file streams —
  * only the source changes (P1).
  */
object StreamOps {

  /** Ordered replay rows per sf dir, collected once per JVM — every
    * streaming query replays the same frame, so re-collecting and
    * re-sorting 100k rows per query is pure repeated driver work. */
  private val replayCache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Ev]]()

  /** Sentinel that advances the watermark past every real event (10 days
    * beyond `maxTs`), flushing append-mode state that would otherwise be
    * held back at query stop. Carries user_id = -1 so pipelines can filter
    * its own emission out of the sink. */
  def flushSentinel(maxTs: java.sql.Timestamp): Ev =
    Ev(-1L, new java.sql.Timestamp(maxTs.getTime + 10L * 24 * 3600 * 1000),
      -1L, "__flush__", 0.0)

  /** Replay the events table as `chunks` event-time-ordered micro-batches
    * through `pipeline`, blocking until all data is processed; returns the
    * committed result table. */
  def replayEvents(spark: SparkSession, dir: String, name: String, chunks: Int,
                   flushTail: Boolean = false, flushPerUser: Boolean = false,
                   flushPerType: Boolean = false)
                  (pipeline: Dataset[Ev] => DataFrame, outputMode: OutputMode): DataFrame = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = replayCache.computeIfAbsent(dir, d =>
      Tables.events(spark, d)
        .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
        .as[Ev].orderBy($"ts", $"event_id").collect())
    val stream = MemoryStream[Ev]
    // Checkpoint on tmpfs when available: every micro-batch fsyncs offsets/
    // commit/state-delta files, and for a seconds-long replay that metadata
    // I/O dominates. RAM-backed /dev/shm makes those fsyncs free; a real
    // deployment points this at a DFS dir instead (durability matters
    // there, not here — the replay is rebuilt from scratch each run).
    val shm = new java.io.File("/dev/shm")
    val ckptBase = if (shm.isDirectory && shm.canWrite) shm
                   else new java.io.File(sys.props("java.io.tmpdir"))
    val ckpt = new java.io.File(ckptBase,
      s"graft-ckpt-$name-${java.util.UUID.randomUUID().toString.take(8)}")
    // Size state partitions to the key space (≈150 series here): the state
    // store commits one delta file per partition per micro-batch, so excess
    // partitions are pure per-batch overhead. Fixed at query start; a real
    // deployment sizes this to series cardinality / executor count.
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    val q =
      try pipeline(stream.toDS())
        .writeStream.outputMode(outputMode)
        .option("checkpointLocation", ckpt.getAbsolutePath)
        .format("memory").queryName(name)
        .start()
      finally spark.conf.set("spark.sql.shuffle.partitions", prevParts)
    try {
      val per = math.max(1, math.ceil(rows.length.toDouble / chunks).toInt)
      rows.grouped(per).foreach { chunk =>
        stream.addData(chunk.toSeq)
        q.processAllAvailable()
      }
      if (flushTail && rows.nonEmpty) {
        stream.addData(flushSentinel(rows.last.ts))
        q.processAllAvailable()
      }
      // Per-key flush: keyed stateful operators (groupByKey on user_id)
      // never see another key's sentinel, so end-of-stream closure needs
      // one sentinel PER key — the streaming analogue of "the input
      // ended" for close-on-advance operators like coWindowStream.
      if (flushPerUser && rows.nonEmpty) {
        val base = flushSentinel(rows.last.ts)
        stream.addData(rows.map(_.user_id).distinct.toSeq
          .map(uid => base.copy(user_id = uid)))
        q.processAllAvailable()
      }
      // event_type-keyed operators need a sentinel PER TYPE: it keeps the
      // real event_type (so it reaches the key's group) and is recognized
      // by the sentinel user_id = -1 instead of the "__flush__" name.
      if (flushPerType && rows.nonEmpty) {
        val base = flushSentinel(rows.last.ts)
        stream.addData(rows.map(_.event_type).distinct.toSeq
          .map(et => base.copy(event_type = et)))
        q.processAllAvailable()
      }
    } finally {
      q.stop()
      deleteRecursively(ckpt)
    }
    spark.table(name)
  }

  /** Generic deterministic replay of pre-built STRING records (e.g. OTLP
    * export documents, exposition pages) — the replayEvents harness for
    * sources whose unit is a document, not an event row. Same adjudicated
    * class: the record list is fixture-sized, the pipeline under test is
    * the real streaming plan. */
  def replayStrings(spark: SparkSession, name: String, records: Seq[String],
                    chunks: Int)
                   (pipeline: Dataset[String] => DataFrame,
                    outputMode: OutputMode): DataFrame = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[String]
    val shm = new java.io.File("/dev/shm")
    val ckptBase = if (shm.isDirectory && shm.canWrite) shm
                   else new java.io.File(sys.props("java.io.tmpdir"))
    val ckpt = new java.io.File(ckptBase,
      s"graft-ckpt-$name-${java.util.UUID.randomUUID().toString.take(8)}")
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    val q =
      try pipeline(stream.toDS())
        .writeStream.outputMode(outputMode)
        .option("checkpointLocation", ckpt.getAbsolutePath)
        .format("memory").queryName(name)
        .start()
      finally spark.conf.set("spark.sql.shuffle.partitions", prevParts)
    try {
      val per = math.max(1, math.ceil(records.length.toDouble / chunks).toInt)
      records.grouped(per).foreach { chunk =>
        stream.addData(chunk.toSeq)
        q.processAllAvailable()
      }
    } finally {
      q.stop()
      deleteRecursively(ckpt)
    }
    spark.table(name)
  }

  /** Checkpoint cleanup for queries that start their stream directly
    * (s78's DSv2 source) — same semantics as the private helper. */
  def deleteRecursivelyPublic(f: java.io.File): Unit = deleteRecursively(f)

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete(): Unit
  }

  /** E41+E42: watermarked tumbling-window aggregation. */
  def tumblingAgg(ds: Dataset[Ev]): DataFrame =
    ds.withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "6 hours"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))

  /** E44/P4: streaming dedup within watermark on (key, day). */
  def streamingDedup(ds: Dataset[Ev]): DataFrame =
    ds.withColumn("day", date_trunc("day", col("ts")))
      .withWatermark("ts", "25 hours")
      .dropDuplicatesWithinWatermark("user_id", "event_type", "day")

  /** E43: session windows (30-minute gap) per user. */
  def sessionize(ds: Dataset[Ev]): DataFrame =
    ds.withWatermark("ts", "2 hours")
      .groupBy(session_window(col("ts"), "30 minutes").as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))

  /** E45/P3: exact-N sliding window assembler via flatMapGroupsWithState —
    * the count-based window Spark's time-based `window()` cannot express
    * (SURVEY §7.3 risk 1). State per key is the trailing w−1 samples,
    * O(w) bounded; late/duplicate policy: batch-sorted by (ts, event_id).
    * Derived from [[assemblerVec]] (ONE stateful core): the mean is the
    * vector's left-to-right sum — identical to the pre-refactor fold. */
  def assembler(ds: Dataset[Ev], w: Int): Dataset[WinOut] = {
    import ds.sparkSession.implicits._
    assemblerVec(ds, w).map(wv =>
      WinOut(wv.user_id, wv.event_type, wv.end_ts, wv.win_arr.sum / w))
  }

  /** The assembler's stateful core, emitting the full window VECTOR —
    * the input shape for trained per-key models (P6). State per key is
    * the trailing w−1 samples; late/duplicate policy: batch-sorted by
    * (ts, event_id). */
  def assemblerVec(ds: Dataset[Ev], w: Int): Dataset[WinVec] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(e => (e.user_id, e.event_type))
      .flatMapGroupsWithState[AsmState, WinVec](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case ((uid, etype), events, state: GroupState[AsmState]) =>
          val prior = if (state.exists) state.get.buf else Seq.empty
          val sorted = events.toSeq.sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
          var buf = prior.toVector
          val out = Vector.newBuilder[WinVec]
          sorted.foreach { e =>
            buf = (buf :+ (e.event_id, e.value)).takeRight(w)
            if (buf.length == w)
              out += WinVec(uid, etype, e.ts, buf.map(_._2))
          }
          state.update(AsmState(buf.takeRight(w - 1)))
          out.result().iterator
      }
  }

  /** Multivariate co-windowing, streaming face (the reference's 2-D
    * `[w × n_features]` window payload — semantics shared with the batch
    * [[graft.anomaly.MultiVar.coWindowMat]]; MultiVarSpec pins parity):
    * per key, each 1-hour step's vector is the LAST sample per feature
    * with carry-forward for features the step didn't observe; a step
    * CLOSES when a later-step event for the key arrives (event-time order
    * within the sorted batch makes steps monotone per key), or when the
    * per-key flush sentinel (`replayEvents(flushPerUser = true)`) ends
    * the stream. Vectors emit only once every feature has been seen;
    * state is |features| + w·|features| doubles per key — O(1) at 10M
    * keys, same as the univariate assembler. */
  def coWindowStream(ds: Dataset[Ev], features: Seq[String], w: Int): Dataset[MatOut] = {
    import ds.sparkSession.implicits._
    val featSet = features.toSet
    // UTC hour bucket: epoch-ms floor (the session timezone contract
    // makes this identical to date_trunc('hour') on the batch side)
    def stepOf(ts: java.sql.Timestamp): Long = ts.getTime - ts.getTime % 3600000L
    ds.filter(e => featSet(e.event_type) || e.event_type == "__flush__")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[CoWinState, MatOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (uid, events, state: GroupState[CoWinState]) =>
          var st = if (state.exists) state.get
                   else CoWinState(Map.empty, Long.MinValue, Map.empty, Vector.empty)
          val out = Vector.newBuilder[MatOut]
          def close(): Unit = if (st.curStep != Long.MinValue) {
            val lv = st.lastVals ++ st.curVals
            val buf =
              if (features.forall(lv.contains)) {
                val b = (st.buf :+ features.map(lv)).takeRight(w)
                if (b.length == w)
                  out += MatOut(uid, new java.sql.Timestamp(st.curStep), b)
                b
              } else st.buf
            st = CoWinState(lv, Long.MinValue, Map.empty, buf)
          }
          events.toSeq
            .sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
            .foreach { e =>
              if (e.event_type == "__flush__") close()
              else {
                val step = stepOf(e.ts)
                if (st.curStep != Long.MinValue && step > st.curStep) close()
                st = st.copy(curStep = step,
                  curVals = st.curVals + (e.event_type -> e.value))
              }
            }
          state.update(st)
          out.result().iterator
      }
  }

  /** P6 streaming face with TRAINED models (the reference's live scoring
    * path with error fallback, `reference/CHANGELOG.md:139,124`): assemble
    * exact-`w` window vectors statefully, stream–static LEFT join against
    * the broadcast PCA registry on the model key, score by reconstruction
    * error where a model resolved and by the static threshold on the
    * window mean where none did (`model_source` records which path). The
    * model frame is registry-sized (broadcast); the stateful assembly is
    * the only shuffle at fact grain — the same plan shape at 10M series. */
  def streamPcaScore(ds: Dataset[Ev], models: DataFrame, staticLimit: Double,
                     w: Int = 12): DataFrame =
    assemblerVec(ds, w).toDF()
      .join(broadcast(models.select(col("event_type"), col("mean"), col("pcs"))),
        Seq("event_type"), "left")
      .withColumn("win_mean",
        aggregate(col("win_arr"), lit(0.0), (s, v) => s + v) / w)
      .withColumn("model_source",
        when(col("pcs").isNotNull, lit("fitted")).otherwise(lit("static")))
      .withColumn("score",
        when(col("pcs").isNotNull,
          graft.anomaly.Pca.reconErrExpr(col("win_arr"), col("mean"), col("pcs")))
          .otherwise(graft.anomaly.Threshold.staticScore(col("win_mean"), staticLimit)))
      .drop("mean", "pcs")

  /** PromQL `increase()`/`resets()` as a stateful stream (the live twin of
    * `metrics.PromQl.counterIncrease`): per-series state is one double plus
    * its event-time position; each arriving sample emits its increase with
    * the Prometheus counter-reset rule (a drop counts from zero). State is
    * O(1) per series — the shape that holds at 10M live series.
    *
    * Out-of-order policy: a sample at or before the state's last position
    * (ts, event_id) is LATE — comparing it against a newer last-value would
    * record a spurious reset and corrupt the state. Late samples are
    * dropped, matching Prometheus's remote-write behavior (out-of-order
    * samples are rejected at ingestion). With an in-order source (the
    * replay harness sorts globally) nothing is ever dropped, so batch
    * parity is unchanged. */
  def streamingIncrease(ds: Dataset[Ev]): Dataset[IncOut] = {
    import ds.sparkSession.implicits._
    val posOrd = implicitly[Ordering[(Long, Int, Long)]]
    ds.groupByKey(e => (e.user_id, e.event_type))
      .flatMapGroupsWithState[IncState, IncOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (_, events, state: GroupState[IncState]) =>
          val sorted = events.toSeq.sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
          var last = if (state.exists) Some(state.get) else None
          val out = sorted.flatMap { e =>
            val pos = (e.ts.getTime, e.ts.getNanos, e.event_id)
            last match {
              case Some(p) if posOrd.gteq((p.tsMs, p.tsNanos, p.eventId), pos) =>
                None // late arrival: drop, leave state at the newer sample
              case _ =>
                val (inc, reset) = last match {
                  case None => (0.0, 0)
                  case Some(p) if e.value - p.last < 0 => (e.value, 1)
                  case Some(p) => (e.value - p.last, 0)
                }
                last = Some(IncState(e.value, pos._1, pos._2, pos._3))
                Some(IncOut(e.user_id, e.event_type, e.ts, inc, reset))
            }
          }
          last.foreach(state.update)
          out.iterator
      }
  }

  /** N-R48's STREAMING face: the Prometheus pending→firing state machine
    * evaluated continuously — per event_type, the hourly condition
    * "≥ `minCount` events with value > `threshold`", closed on step
    * advance (or the per-type flush sentinel). An unbroken chain of
    * ACTIVE closed hours is an alert run: pending until `forSec` old,
    * firing from then on; an inactive closed hour, or any hour gap,
    * breaks the run — exactly the batch [[graft.metrics.AlertRules]]
    * contiguity rule, so the committed sink equals the batch twin on
    * the deterministic replay. State per key is four longs; the only
    * shuffle is the groupByKey — the same plan at 10M series. */
  def streamAlertRule(ds: Dataset[Ev], threshold: Double, minCount: Long,
                      forSec: Long): Dataset[AlertOut] = {
    import ds.sparkSession.implicits._
    def stepOf(ts: java.sql.Timestamp): Long = ts.getTime - ts.getTime % 3600000L
    val MinV = Long.MinValue
    ds.groupByKey(_.event_type)
      .flatMapGroupsWithState[AlertState, AlertOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (etype, events, state: GroupState[AlertState]) =>
          var st = if (state.exists) state.get else AlertState(MinV, 0L, MinV, MinV)
          val out = Vector.newBuilder[AlertOut]
          def close(): Unit = if (st.curStep != MinV) {
            if (st.curCount >= minCount) {
              val rs = if (st.runStart != MinV && st.lastActive == st.curStep - 3600000L)
                         st.runStart else st.curStep
              val verdict =
                if ((st.curStep - rs) / 1000L >= forSec) "firing" else "pending"
              out += AlertOut(etype, new java.sql.Timestamp(st.curStep),
                verdict, st.curCount.toDouble)
              st = AlertState(MinV, 0L, rs, st.curStep)
            } else st = AlertState(MinV, 0L, MinV, MinV)
          }
          events.toSeq
            .sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
            .foreach { e =>
              if (e.user_id == -1L) close() // per-type flush sentinel
              else {
                val step = stepOf(e.ts)
                if (st.curStep != MinV && step > st.curStep) close()
                if (st.curStep == MinV) st = st.copy(curStep = step)
                if (e.value > threshold) st = st.copy(curCount = st.curCount + 1)
              }
            }
          state.update(st)
          out.result().iterator
      }
  }

  /** N-R96's STREAMING face: online CUSUM over hourly counts with
    * OFFLINE-trained (μ, σ) per series — the standard deployment split
    * (stats from the warehouse, the recursion at the edge). Hours close
    * on step advance (or the per-type sentinel), each closed hour folds
    * S ← max(0, S + dev) where dev = round(cnt − μ, 6) held in integer
    * MICRO-UNITS — exact fixed-point arithmetic, so the committed sink
    * equals the batch prefix-sum-identity twin digit-for-digit. State
    * per key: three longs. */
  /** Streaming Gorilla/XOR chunk encoder — the ONLINE face of
    * graft.metrics.Gorilla.encodeStats, holding exactly the registers
    * the Prometheus head appender keeps per series (xor.go: two ts lags,
    * previous value bits, the leading/trailing window). Chunks cut at
    * `chunkSize` samples and emit their closed bit-cost stats; the open
    * head chunk stays in state, never emitted — the upstream behavior.
    * Same bucket/window/varint math as the batch fold, digit for digit. */
  def streamXorChunks(ds: Dataset[Ev], chunkSize: Int = 120): Dataset[XorChunkOut] = {
    import ds.sparkSession.implicits._
    def uvarintBits(x: Long): Long = {
      val bitlen = if (x == 0L) 1 else 64 - java.lang.Long.numberOfLeadingZeros(x)
      ((bitlen + 6) / 7).toLong * 8L
    }
    def dodBits(dod: Long): Long =
      if (dod == 0L) 1L
      else if (dod >= -8191L && dod <= 8192L) 16L
      else if (dod >= -65535L && dod <= 65536L) 20L
      else if (dod >= -524287L && dod <= 524288L) 24L
      else 68L
    ds.groupByKey(e => (e.event_type, e.user_id % 5))
      .flatMapGroupsWithState[XorState, XorChunkOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case ((etype, shard), events, state: GroupState[XorState]) =>
          var st = if (state.exists) state.get
            else XorState(0L, 0L, 0L, 0L, 0L, 255, 0, 0L, 0L, 0L, 0L, 0L)
          val out = Vector.newBuilder[XorChunkOut]
          events.toSeq
            .sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
            .foreach { e =>
              val tMs = e.ts.getTime
              val bits = java.lang.Double.doubleToRawLongBits(
                BigDecimal(e.value).setScale(0, BigDecimal.RoundingMode.HALF_UP)
                  .toDouble)
              val tsCost =
                if (st.idx == 0L) uvarintBits(tMs * 2)
                else if (st.idx == 1L) uvarintBits((tMs - st.t1) * 2)
                else dodBits(tMs - 2 * st.t1 + st.t2)
              st =
                if (st.idx == 0L)
                  st.copy(idx = 1L, t1 = tMs, prevBits = bits, lead = 255,
                    trail = 0, tsBits = st.tsBits + tsCost, valBits = 64L)
                else {
                  val xor = st.prevBits ^ bits
                  val (cost, lead, trail, z, r, n) =
                    if (xor == 0L) (1L, st.lead, st.trail, 1L, 0L, 0L)
                    else {
                      val lz = math.min(java.lang.Long.numberOfLeadingZeros(xor), 31)
                      val tz = java.lang.Long.numberOfTrailingZeros(xor)
                      if (st.lead != 255 && lz >= st.lead && tz >= st.trail)
                        (2L + (64 - st.lead - st.trail), st.lead, st.trail, 0L, 1L, 0L)
                      else (13L + (64 - lz - tz), lz, tz, 0L, 0L, 1L)
                    }
                  st.copy(idx = st.idx + 1, t2 = st.t1, t1 = tMs,
                    prevBits = bits, lead = lead, trail = trail,
                    tsBits = st.tsBits + tsCost, valBits = st.valBits + cost,
                    nzero = st.nzero + z, nreuse = st.nreuse + r,
                    nnew = st.nnew + n)
                }
              if (st.idx == chunkSize.toLong) {
                out += XorChunkOut(etype, shard, st.chunk, st.idx,
                  st.tsBits, st.valBits, st.nzero, st.nreuse, st.nnew)
                st = XorState(st.chunk + 1, 0L, 0L, 0L, 0L, 255, 0,
                  0L, 0L, 0L, 0L, 0L)
              }
            }
          state.update(st)
          out.result().iterator
      }
  }

  /** Streaming HA replica dedup — the per-sample walk the batch
    * run-compressed fold (graft.metrics.HaTracker) is an optimization
    * of: accept from the elected replica (refreshing last-seen), fail
    * over to a different sender only after `failoverSec` of elected
    * silence. Emits the cluster's running totals at each per-type flush
    * sentinel. Matching the batch twin exactly also PROVES the
    * run-compression equivalence. Samples order by (second, event_id) —
    * the same total order as the batch walk and the oracle. */
  def streamHaDedup(ds: Dataset[Ev], replicaOf: Ev => String,
                    failoverSec: Long): Dataset[HaOut] = {
    import ds.sparkSession.implicits._
    def vUnits(v: Double): Long =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .*(BigDecimal(1000000)).toLongExact
    ds.groupByKey(_.event_type)
      .flatMapGroupsWithState[HaState, HaOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (etype, events, state: GroupState[HaState]) =>
          var st = if (state.exists) state.get
            else HaState("", Long.MinValue / 4, 0L, 0L, 0L, 0L)
          val out = Vector.newBuilder[HaOut]
          events.toSeq
            .sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
            .foreach { e =>
              if (e.user_id == -1L)
                out += HaOut(etype, st.elected, st.nelect, st.nacc, st.nrej,
                  java.math.BigDecimal.valueOf(st.vsumMicros.toDouble / 1e6)
                    .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue())
              else {
                val t = e.ts.getTime / 1000
                val r = replicaOf(e)
                if (st.nelect == 0L)
                  st = HaState(r, t, st.nacc + 1, st.nrej, 1L,
                    st.vsumMicros + vUnits(e.value))
                else if (r == st.elected)
                  st = st.copy(lastSec = t, nacc = st.nacc + 1,
                    vsumMicros = st.vsumMicros + vUnits(e.value))
                else if (t > st.lastSec + failoverSec)
                  st = HaState(r, t, st.nacc + 1, st.nrej, st.nelect + 1,
                    st.vsumMicros + vUnits(e.value))
                else st = st.copy(nrej = st.nrej + 1)
              }
            }
          state.update(st)
          out.result().iterator
      }
  }

  /** Streaming twin of q216's out-of-order ingestion classification
    * (tsdb/head_append.go + the 1h OOO window): per-series state is the
    * head's own registers — maxTime + counters — O(1)/series. A sample
    * with t >= maxTime appends in-order (advancing maxTime); an older
    * one is OOO-accepted iff maxTime − t ≤ window, else too-old. The
    * same md5 lateness fixture as the batch twin; processing order is
    * arrival order (event_id — the replay's own order). Emits one row
    * per series at its flush sentinel; matching the batch twin digit for
    * digit proves the running-max identity under micro-batched arrival. */
  def streamOooIngest(ds: Dataset[Ev], windowSec: Long): Dataset[OooOut] = {
    import ds.sparkSession.implicits._
    val windowUs = windowSec * 1000000L
    def vUnits(v: Double): Long =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .*(BigDecimal(1000000)).toLongExact
    def delayUs(id: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(("ooo|" + id).getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      val b = java.lang.Long.parseLong(hex.substring(0, 6), 16) % 10
      (if (b >= 9) 10800L else if (b >= 7) 1800L else 0L) * 1000000L
    }
    ds.groupByKey(_.event_type)
      .flatMapGroupsWithState[OooState, OooOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (etype, events, state: GroupState[OooState]) =>
          var st = if (state.exists) state.get
            else OooState(Long.MinValue, 0L, 0L, 0L, 0L, Long.MinValue)
          val out = Vector.newBuilder[OooOut]
          // sentinel (user_id = -1) sorts LAST regardless of its ids
          events.toSeq.sortBy(e => (e.user_id == -1L, e.event_id))
            .foreach { e =>
              if (e.user_id == -1L)
                out += OooOut(etype, st.nIn, st.nOoo, st.nOld,
                  java.math.BigDecimal.valueOf(st.sumUnits.toDouble / 1e6)
                    .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue(),
                  st.maxAccUs)
              else {
                val tUs = (e.ts.getTime / 1000) * 1000000L +
                  e.ts.getNanos / 1000 - delayUs(e.event_id)
                if (tUs >= st.headMaxUs)
                  st = st.copy(headMaxUs = tUs, nIn = st.nIn + 1,
                    sumUnits = st.sumUnits + vUnits(e.value),
                    maxAccUs = math.max(st.maxAccUs, tUs))
                else if (st.headMaxUs - tUs <= windowUs)
                  st = st.copy(nOoo = st.nOoo + 1,
                    sumUnits = st.sumUnits + vUnits(e.value),
                    maxAccUs = math.max(st.maxAccUs, tUs))
                else st = st.copy(nOld = st.nOld + 1)
              }
            }
          state.update(st)
          out.result().iterator
      }
  }

  /** ONLINE delta→cumulative conversion (q249's streaming face — how
    * the upstream otlp-deltatocumulative processor actually runs: one
    * running total per series, each delta point emitting a cumulative
    * point). Keyed by metric with per-bucket registers (total in 1e-6
    * fixed point — exact, so the online walk ≡ the batch prefix sum);
    * the sink emits every 100th cumulative point as it happens plus the
    * final total at the flush sentinel, which the batch running-sum
    * twin reproduces at the same ranks. */
  def streamDeltaToCumulative(ds: Dataset[Ev]): Dataset[D2cOut] = {
    import ds.sparkSession.implicits._
    def vUnits(v: Double): Long =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .*(BigDecimal(1000000)).toLongExact
    def cumOf(units: Long): Double =
      java.math.BigDecimal.valueOf(units.toDouble / 1e6)
        .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
    ds.groupByKey(_.event_type)
      .flatMapGroupsWithState[D2cState, D2cOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (etype, events, state: GroupState[D2cState]) =>
          var subs = if (state.exists) state.get.subs
            else Map.empty[String, Seq[Long]]
          val out = Vector.newBuilder[D2cOut]
          events.toSeq.sortBy(e => (e.user_id == -1L, e.ts.getTime, e.event_id))
            .foreach { e =>
              if (e.user_id == -1L)
                subs.toSeq.sortBy(_._1).foreach { case (b, Seq(u, n)) =>
                  out += D2cOut(etype, b, "final", n, cumOf(u))
                }
              else {
                val b = (e.user_id % 3).toString
                val Seq(u0, n0) = subs.getOrElse(b, Seq(0L, 0L))
                val u = u0 + vUnits(e.value); val n = n0 + 1
                subs += b -> Seq(u, n)
                if (n % 100 == 0) out += D2cOut(etype, b, "spot", n, cumOf(u))
              }
            }
          state.update(D2cState(subs))
          out.result().iterator
      }
  }

  /** Restart-aware ONLINE delta→cumulative (q254's streaming face, the
    * way the upstream deltatocumulative processor actually holds state):
    * one fixed-point running total per (metric, bucket) that RESETS when
    * a point's accumulation epoch changes — here the epoch boundary is
    * derived from event time (points at/after `restartMs` belong to the
    * restarted collector), mirroring q254's start_ts-change rule. The
    * pre-restart peak is latched at the reset. Registers are O(1) per
    * series; flush sentinels emit the per-series summary, which must
    * land digit-for-digit on the batch segment sums. */
  def streamDeltaToCumulativeRestarts(ds: Dataset[Ev],
                                      restartMs: Long): Dataset[D2cROut] = {
    import ds.sparkSession.implicits._
    def vUnits(v: Double): Long =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .*(BigDecimal(1000000)).toLongExact
    def cumOf(units: Long): Double =
      java.math.BigDecimal.valueOf(units.toDouble / 1e6)
        .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
    ds.groupByKey(_.event_type)
      .flatMapGroupsWithState[D2cRState, D2cROut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (etype, events, state: GroupState[D2cRState]) =>
          var subs = if (state.exists) state.get.subs
            else Map.empty[String, Seq[Long]]
          val out = Vector.newBuilder[D2cROut]
          events.toSeq.sortBy(e => (e.user_id == -1L, e.ts.getTime, e.event_id))
            .foreach { e =>
              if (e.user_id == -1L)
                subs.toSeq.sortBy(_._1).foreach {
                  case (b, Seq(cur, pre, restarted, n)) =>
                    val premid = if (restarted == 1L) pre else cur
                    out += D2cROut(etype, b, n, cumOf(premid), cumOf(cur))
                }
              else {
                val b = (e.user_id % 3).toString
                val Seq(cur0, pre0, restarted0, n0) =
                  subs.getOrElse(b, Seq(0L, 0L, 0L, 0L))
                val restartNow = restarted0 == 0L && e.ts.getTime >= restartMs
                val (cur1, pre1, r1) =
                  if (restartNow) (0L, cur0, 1L) else (cur0, pre0, restarted0)
                subs += b -> Seq(cur1 + vUnits(e.value), pre1, r1, n0 + 1)
              }
            }
          state.update(D2cRState(subs))
          out.result().iterator
      }
  }

  /** ONLINE stale-marker synthesis on scrape gaps — the scrape-loop half
    * of q238's staleness story, run as the loop itself would: keyed by
    * metric, per-instance registers hold the last PRESENT hour; when a
    * sample arrives ≥ 2 hours after it, the hours between were missed
    * scrapes, and upstream would have written a stale marker at the
    * first of them — `n_gaps` counts those markers, `n_missed_hours`
    * the full outage span. Arrival is event-time order (the replay's
    * sort), so the online walk equals the batch lag-over-distinct-hours
    * twin exactly — which is what the oracle computes. Emits per
    * instance at the metric's flush sentinel. */
  def streamStaleGaps(ds: Dataset[Ev]): Dataset[StaleGapOut] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.event_type)
      .flatMapGroupsWithState[StaleGapState, StaleGapOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (etype, events, state: GroupState[StaleGapState]) =>
          var subs = if (state.exists) state.get.subs
            else Map.empty[Int, StaleSub]
          val out = Vector.newBuilder[StaleGapOut]
          events.toSeq.sortBy(e => (e.user_id == -1L, e.ts.getTime, e.event_id))
            .foreach { e =>
              if (e.user_id == -1L)
                subs.toSeq.sortBy(_._1).foreach { case (inst, st) =>
                  out += StaleGapOut(etype, inst, st.nHours, st.nGaps,
                    st.nMissed, st.firstH * 3600000L, st.lastH * 3600000L)
                }
              else {
                val inst = (e.user_id % 2).toInt
                val h = e.ts.getTime / 3600000L
                subs.get(inst) match {
                  case None =>
                    subs += inst -> StaleSub(h, 1L, 0L, 0L, h)
                  case Some(st) if h <= st.lastH => () // same scrape hour
                  // (replay order is event-time ascending, so h < lastH
                  // cannot occur; the guard keeps the walk total anyway)
                  case Some(st) if h == st.lastH + 1 =>
                    subs += inst -> st.copy(lastH = h, nHours = st.nHours + 1)
                  case Some(st) => // gap: marker at lastH+1, span counted
                    subs += inst -> st.copy(lastH = h, nHours = st.nHours + 1,
                      nGaps = st.nGaps + 1,
                      nMissed = st.nMissed + (h - st.lastH - 1))
                }
              }
            }
          state.update(StaleGapState(subs))
          out.result().iterator
      }
  }

  /** Streaming twin of q217's per-tenant series limiter
    * (`max_global_series_per_user`): keyed by tenant, a sample's series
    * is admitted iff already known or the cap has room — first-seen
    * order IS arrival order (event_id, the replay's order), so the
    * admitted set equals the batch twin's min(event_id) rank ≤ cap
    * exactly. Values accumulate in 1e-6 fixed-point; one output row per
    * (tenant, event_type) on the tenant's FIRST flush sentinel
    * (flushPerUser reaches every tenant key; later sentinels no-op). */
  def streamTenantLimits(ds: Dataset[Ev], cap: Long): Dataset[TlOut] = {
    import ds.sparkSession.implicits._
    def vUnits(v: Double): Long =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .*(BigDecimal(1000000)).toLongExact
    ds.groupByKey(e => "t" + java.lang.Math.floorMod(e.user_id, 3L))
      .flatMapGroupsWithState[TlState, TlOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (tenant, events, state: GroupState[TlState]) =>
          var st = if (state.exists) state.get
            else TlState(Map.empty, 0L, Map.empty, emitted = false)
          val out = Vector.newBuilder[TlOut]
          events.toSeq
            .sortBy(e => (e.event_type == "__flush__", e.event_id))
            .foreach { e =>
              if (e.event_type == "__flush__") {
                if (!st.emitted) {
                  st.ctrs.toSeq.sortBy(_._1).foreach { case (et, c) =>
                    val nSeries = st.seen.keysIterator
                      .count(_.startsWith(et + "|"))
                    val nSeriesAcc = st.seen.iterator
                      .count(kv => kv._1.startsWith(et + "|") && kv._2)
                    out += TlOut(tenant, et, nSeries, nSeriesAcc,
                      c(0), c(1), c(2),
                      java.math.BigDecimal.valueOf(c(3).toDouble / 1e6)
                        .setScale(4, java.math.RoundingMode.HALF_UP)
                        .doubleValue())
                  }
                  st = st.copy(emitted = true)
                }
              } else {
                val skey = e.event_type + "|" + e.user_id
                val admitted = st.seen.getOrElse(skey, {
                  val adm = st.nAdm < cap
                  st = st.copy(seen = st.seen + (skey -> adm),
                    nAdm = st.nAdm + (if (adm) 1L else 0L))
                  adm
                })
                val c = st.ctrs.getOrElse(e.event_type, Seq(0L, 0L, 0L, 0L))
                val nc =
                  if (admitted) Seq(c(0) + 1, c(1) + 1, c(2),
                    c(3) + vUnits(e.value))
                  else Seq(c(0) + 1, c(1), c(2) + 1, c(3))
                st = st.copy(ctrs = st.ctrs + (e.event_type -> nc))
              }
            }
          state.update(st)
          out.result().iterator
      }
  }

  def streamCusum(ds: Dataset[Ev],
                  stats: Map[String, (Double, Double)]): Dataset[CusumOut] = {
    import ds.sparkSession.implicits._
    val MinV = Long.MinValue
    def stepOf(ts: java.sql.Timestamp): Long = ts.getTime - ts.getTime % 3600000L
    def devUnits(cnt: Long, mu: Double): Long =
      BigDecimal(cnt - mu).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .*(BigDecimal(1000000)).toLongExact
    ds.groupByKey(_.event_type)
      .flatMapGroupsWithState[CusumState, CusumOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (etype, events, state: GroupState[CusumState]) =>
          val (mu, sigma) = stats.getOrElse(etype, (0.0, 0.0))
          var st = if (state.exists) state.get else CusumState(MinV, 0L, 0L)
          val out = Vector.newBuilder[CusumOut]
          def close(): Unit = if (st.curStep != MinV) {
            val s = math.max(0L, st.sUnits + devUnits(st.curCount, mu))
            val cusum = s / 1e6
            out += CusumOut(etype, new java.sql.Timestamp(st.curStep),
              cusum, cusum > 3.0 * sigma)
            st = CusumState(MinV, 0L, s)
          }
          events.toSeq
            .sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
            .foreach { e =>
              if (e.user_id == -1L) close() // per-type flush sentinel
              else {
                val step = stepOf(e.ts)
                if (st.curStep != MinV && step > st.curStep) close()
                if (st.curStep == MinV) st = st.copy(curStep = step)
                st = st.copy(curCount = st.curCount + 1)
              }
            }
          state.update(st)
          out.result().iterator
      }
  }

  /** E46/P13: stream–static join against a fitted model table, scoring each
    * event as it arrives (per-batch model freshness, SURVEY §7.3 risk 5). */
  def streamStaticScore(ds: Dataset[Ev], model: DataFrame): DataFrame =
    ds.join(broadcast(model), "event_type")
      .withColumn("score",
        least(greatest(col("value") / (col("threshold") + lit(1e-9)), lit(0.0)), lit(10.0)))

  /** P15: config hot-reload — the reference watched its omegaconf files and
    * re-applied settings live (`CHANGELOG.md:116,173`); the streaming twin
    * re-reads config at every micro-batch boundary inside foreachBatch, so
    * a config change takes effect on the next batch without restarting the
    * query. `readConf` stands in for the config source (file/table). */
  def scoreWithReloadedConfig(ds: Dataset[Ev], readConf: () => Double,
                              outPath: String): org.apache.spark.sql.streaming.DataStreamWriter[Ev] =
    ds.writeStream.outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[Ev], batchId: Long) =>
        val threshold = readConf() // re-resolved per micro-batch
        batch.toDF()
          .withColumn("threshold_used", lit(threshold))
          .withColumn("score",
            least(greatest(col("value") / lit(threshold), lit(0.0)), lit(10.0)))
          .withColumn("batch_id", lit(batchId))
          .write.mode("append").parquet(outPath)
      }

  /** E4/P11: foreachBatch train-request sink — emits per-batch-deduplicated
    * train requests (key + reason) for keys whose score exceeds the
    * trigger, appended to a parquet request table at `path` (the batch
    * analogue of the reference's Redis-deduped UDSink,
    * `CHANGELOG.md:530,479`). */
  def trainRequestSink(scored: DataFrame, trigger: Double,
                       path: String): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    scored.writeStream.outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.filter(col("score") > trigger)
          .select(col("user_id"), col("event_type"), lit("score_exceeded").as("reason"))
          .dropDuplicates("user_id", "event_type")
          .write.mode("append").parquet(path)
      }
}
