package graft.stream

import graft.anomaly.AnomalyOps
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** Streaming-vs-batch parity (SURVEY §5.2 item 4): the streaming form of
  * each operator must produce the batch twin's results on the same data. */
class StreamSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  private val SF = graft.TestSpark.SF

  test("exact-12 assembler: streaming ≡ batch window counts and means") {
    val streamed = StreamOps.replayEvents(spark, SF, "t_asm", 3)(
      ds => StreamOps.assembler(ds, 12).toDF(), OutputMode.Append)
      .groupBy($"user_id", $"event_type")
      .agg(count(lit(1)).as("n"), round(avg($"win_mean"), 6).as("m"))
    val batch = AnomalyOps.assembleWindows(
      graft.Tables.events(spark, SF), Seq("user_id", "event_type"), "ts", "event_id", "value", 12)
      .withColumn("win_mean", aggregate($"win_arr", lit(0.0), _ + _) / lit(12.0))
      .groupBy($"user_id", $"event_type")
      .agg(count(lit(1)).as("n"), round(avg($"win_mean"), 6).as("m"))
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("streaming PCA scoring ≡ batch reconstruction error; fallback on missing model") {
    val events = graft.Tables.events(spark, SF)
    val wins = AnomalyOps.assembleWindows(events,
      Seq("user_id", "event_type"), "ts", "event_id", "value", 12)
    // train on everything EXCEPT 'error' — its windows must take the
    // static path in the stream
    val models = graft.anomaly.Pca.fit(
      wins.filter($"event_type" =!= "error"), "event_type", "win_arr", dim = 12, k = 3)
    val streamed = StreamOps.replayEvents(spark, SF, "t_pca", 3)(
      ds => StreamOps.streamPcaScore(ds, models, staticLimit = 250.0), OutputMode.Append)
    // fitted path: per-window scores equal the batch scorer's recon_err on
    // the identical windows (same models, same expression) — keyed by
    // (series, end_ts) so the comparison is row-level, not aggregate
    val sf = streamed.filter($"model_source" === "fitted")
      .select($"user_id", $"event_type", $"end_ts", round($"score", 9).as("v"))
    val bf = graft.anomaly.Pca.reconstructionError(
        wins.filter($"event_type" =!= "error"), models, "event_type", "win_arr")
      .select($"user_id", $"event_type", $"ts".as("end_ts"), round($"recon_err", 9).as("v"))
    assert(sf.exceptAll(bf).isEmpty && bf.exceptAll(sf).isEmpty)
    // static path: exactly the 'error' windows, scored by the threshold rule
    val st = streamed.filter($"model_source" === "static")
    assert(st.filter($"event_type" =!= "error").count() == 0)
    val expected = wins.filter($"event_type" === "error")
      .withColumn("wm", aggregate($"win_arr", lit(0.0), _ + _) / lit(12.0))
      .select($"user_id", $"event_type", $"ts".as("end_ts"),
        round(graft.anomaly.Threshold.staticScore($"wm", 250.0), 9).as("v"))
    val got = st.select($"user_id", $"event_type", $"end_ts", round($"score", 9).as("v"))
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
  }

  test("streaming increase(): stateful stream ≡ batch lag form incl. resets") {
    val streamed = StreamOps.replayEvents(spark, SF, "t_inc", 3)(
      ds => StreamOps.streamingIncrease(ds).toDF(), OutputMode.Append)
      .groupBy($"user_id", $"event_type")
      .agg(count(lit(1)).as("n"), sum($"reset").as("resets"),
        round(sum(round($"inc", 6).cast("decimal(18,6)")).cast("double"), 4).as("total"))
    val batch = graft.metrics.PromQl.counterIncrease(
      graft.Tables.events(spark, SF), Seq("user_id", "event_type"), "ts", "event_id", "value")
      .groupBy($"user_id", $"event_type")
      .agg(count(lit(1)).as("n"), sum($"reset").as("resets"),
        round(sum(round($"inc", 6).cast("decimal(18,6)")).cast("double"), 4).as("total"))
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("streaming increase(): late out-of-order sample dropped, no spurious reset") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Ev]
    val q = StreamOps.streamingIncrease(ms.toDS()).toDF()
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("t_inc_late").start()
    def ev(id: Long, min: Int, v: Double) =
      Ev(id, java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00"), 1L, "cpu", v)
    try {
      ms.addData(ev(1, 0, 10.0), ev(2, 2, 30.0)); q.processAllAvailable()
      // arrives after the 10:02 sample but carries ts 10:01: late. Against
      // last=30 it would look like a reset — must be dropped instead.
      ms.addData(ev(3, 1, 20.0)); q.processAllAvailable()
      ms.addData(ev(4, 3, 35.0)); q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("t_inc_late").orderBy($"ts")
      .select($"inc", $"reset").collect()
    assert(rows.length == 3) // the late sample emitted nothing
    assert(rows.map(_.getDouble(0)).toSeq == Seq(0.0, 20.0, 5.0))
    assert(rows.map(_.getInt(1)).sum == 0)
  }

  test("streaming OOO head: in-order / within-window / too-old classes") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Ev]
    val q = StreamOps.streamOooIngest(ms.toDS(), 3600L).toDF()
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("t_ooo").start()
    // pick ids whose md5 lateness bucket is 0-6 (no synthetic delay) so
    // the test controls disorder through the timestamps alone
    def bucket(id: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(("ooo|" + id).getBytes("UTF-8")).map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex.substring(0, 6), 16) % 10
    }
    val ids = (1L to 200L).filter(bucket(_) <= 6).iterator
    def tsOf(hhmm: String) =
      java.sql.Timestamp.valueOf(s"2024-01-01 $hhmm:00")
    def ev(hhmm: String, v: Double) = Ev(ids.next(), tsOf(hhmm), 1L, "cpu", v)
    val last = tsOf("10:40")
    try {
      ms.addData(ev("10:00", 1.0), ev("10:30", 2.0)); q.processAllAvailable()
      ms.addData(ev("10:10", 3.0)) // 20 min behind head max → OOO window
      ms.addData(ev("08:00", 4.0)) // 2.5 h behind → too old
      ms.addData(ev("10:40", 5.0)); q.processAllAvailable()
      ms.addData(StreamOps.flushSentinel(last).copy(event_type = "cpu"))
      q.processAllAvailable()
    } finally q.stop()
    val r = spark.table("t_ooo").collect().head
    assert(r.getAs[Long]("n_in_order") == 3, r)
    assert(r.getAs[Long]("n_ooo") == 1, r)
    assert(r.getAs[Long]("n_too_old") == 1, r)
    assert(r.getAs[Double]("sum_merged") == 11.0, r) // 1+2+3+5
    val wantUs = (last.getTime / 1000) * 1000000L + last.getNanos / 1000
    assert(r.getAs[Long]("max_accepted_us") == wantUs, r)
  }

  test("streaming alert rule: pending→firing, inactive hour breaks the run") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Ev]
    // condition: any event with value > 100 in the hour; for = 1h
    val q = StreamOps.streamAlertRule(ms.toDS(), 100.0, 1L, 3600L).toDF()
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("t_alert").start()
    def ev(id: Long, hour: Int, v: Double) =
      Ev(id, java.sql.Timestamp.valueOf(f"2024-01-01 $hour%02d:30:00"), 1L, "cpu", v)
    try {
      // h10 active (151>100, split across batches), h11 active → firing,
      // h12 INACTIVE (50), h13 active → run restarts at pending
      ms.addData(ev(1, 10, 151.0)); q.processAllAvailable()
      ms.addData(ev(2, 10, 7.0), ev(3, 11, 200.0)); q.processAllAvailable()
      ms.addData(ev(4, 12, 50.0), ev(5, 13, 120.0)); q.processAllAvailable()
      ms.addData(Ev(6, java.sql.Timestamp.valueOf("2024-01-01 23:00:00"),
        -1L, "cpu", 0.0)); q.processAllAvailable() // per-type flush
    } finally q.stop()
    val rows = spark.table("t_alert").orderBy($"step_ts")
      .select(date_format($"step_ts", "HH").as("h"), $"alertstate")
      .collect().map(r => r.getString(0) -> r.getString(1)).toSeq
    assert(rows == Seq("10" -> "pending", "11" -> "firing", "13" -> "pending"))
  }

  test("tumbling agg: streaming ≡ batch window() aggregation") {
    val streamed = StreamOps.replayEvents(spark, SF, "t_tumble", 3)(
      StreamOps.tumblingAgg, OutputMode.Complete)
      .select($"window.start".as("ws"), $"event_type", $"n", round($"sum_value", 2).as("sv"))
    val batch = graft.Tables.events(spark, SF)
      .groupBy(window($"ts", "6 hours"), $"event_type")
      .agg(count(lit(1)).as("n"),
        sum($"value".cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select($"window.start".as("ws"), $"event_type", $"n", round($"sum_value", 2).as("sv"))
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("streaming dedup keeps one row per (key, day)") {
    val streamed = StreamOps.replayEvents(spark, SF, "t_dedup", 3)(
      ds => StreamOps.streamingDedup(ds).drop("day"), OutputMode.Append)
    val batchDistinct = graft.Tables.events(spark, SF)
      .select($"user_id", $"event_type", date_trunc("day", $"ts").as("day")).distinct().count()
    assert(streamed.count() == batchDistinct)
  }

  test("session windows: streaming flushed sessions ⊆ batch sessions, non-empty") {
    val streamed = StreamOps.replayEvents(spark, SF, "t_sess", 3)(
      StreamOps.sessionize _, OutputMode.Append)
      .select($"sw.start".as("start"), $"user_id", $"n_events")
    val batch = graft.Tables.events(spark, SF)
      .groupBy(session_window($"ts", "30 minutes").as("sw"), $"user_id")
      .agg(count(lit(1)).as("n_events"))
      .select($"sw.start".as("start"), $"user_id", $"n_events")
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty, "streamed session not present in batch form")
  }

  test("assembler runs on the RocksDB state store (100 TB state path)") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val streamed = StreamOps.replayEvents(spark, SF, "t_rocks", 3)(
        ds => StreamOps.assembler(ds, 12).toDF(), OutputMode.Append)
      val batchCount = AnomalyOps.assembleWindows(
        graft.Tables.events(spark, SF), Seq("user_id", "event_type"), "ts", "event_id", "value", 12)
        .count()
      assert(streamed.count() == batchCount)
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("config hot-reload applies new threshold on next micro-batch (P15)") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val confFile = java.nio.file.Files.createTempFile("graft_conf", ".txt")
    java.nio.file.Files.writeString(confFile, "100.0")
    val outDir = java.nio.file.Files.createTempDirectory("reload_out").toString + "/out"
    val rows = graft.Tables.events(spark, SF)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[Ev].orderBy($"ts").collect()
    val stream = MemoryStream[Ev]
    val q = StreamOps.scoreWithReloadedConfig(stream.toDS(),
      () => java.nio.file.Files.readString(confFile).trim.toDouble, outDir).start()
    try {
      stream.addData(rows.take(500).toSeq); q.processAllAvailable()
      java.nio.file.Files.writeString(confFile, "200.0") // hot config change
      stream.addData(rows.drop(500).toSeq); q.processAllAvailable()
    } finally q.stop()
    val used = spark.read.parquet(outDir)
      .select($"threshold_used").distinct().collect().map(_.getDouble(0)).sorted.toSeq
    assert(used == Seq(100.0, 200.0))
  }

  test("config file-watch: ConfigWatcher snapshot swaps on edit and feeds the stream (P15)") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = java.nio.file.Files.createTempDirectory("graft_watch")
    val confFile = dir.resolve("scoring.conf")
    java.nio.file.Files.writeString(confFile, "# scoring config\nthreshold=100.0\n")
    val w = new ConfigWatcher(confFile)
    try {
      assert(w.getDouble("threshold", -1.0) == 100.0)
      assert(w.get("missing").isEmpty && w.getDouble("missing", 7.0) == 7.0)
      // the watcher half: an edit swaps the snapshot without any reader I/O
      java.nio.file.Files.writeString(confFile,
        "# scoring config\nthreshold=250.0\nextra=x\n")
      assert(w.awaitValue("threshold")(_.contains("250.0")),
        "watch event did not deliver the edited value")
      assert(w.snapshot("extra") == "x")
      // the stream half: next micro-batch scores with the new threshold
      val outDir = java.nio.file.Files.createTempDirectory("watch_out").toString + "/out"
      val rows = graft.Tables.events(spark, SF)
        .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
        .as[Ev].orderBy($"ts").collect()
      val stream = MemoryStream[Ev]
      val q = StreamOps.scoreWithReloadedConfig(stream.toDS(),
        () => w.getDouble("threshold", 1.0), outDir).start()
      try {
        stream.addData(rows.take(500).toSeq); q.processAllAvailable()
        java.nio.file.Files.writeString(confFile, "threshold=500.0\n")
        assert(w.awaitValue("threshold")(_.contains("500.0")))
        stream.addData(rows.drop(500).toSeq); q.processAllAvailable()
      } finally q.stop()
      val used = spark.read.parquet(outDir)
        .select($"threshold_used").distinct().collect().map(_.getDouble(0)).sorted.toSeq
      assert(used == Seq(250.0, 500.0))
    } finally w.close()
  }

  test("train-request sink collects deduplicated requests (P11)") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val model = graft.anomaly.Threshold.fit(
      graft.Tables.events(spark, SF), Seq("event_type"), "value", 0.0)
      .select($"event_type", $"threshold")
    val rows = graft.Tables.events(spark, SF)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[Ev].orderBy($"ts").collect()
    val stream = MemoryStream[Ev]
    val dir = java.nio.file.Files.createTempDirectory("train_requests").toString + "/out"
    val q = StreamOps.trainRequestSink(
      StreamOps.streamStaticScore(stream.toDS(), model), 1.0, dir).start()
    try {
      rows.grouped(500).foreach { c => stream.addData(c.toSeq); q.processAllAvailable() }
    } finally q.stop()
    val reqs = spark.read.parquet(dir)
    assert(reqs.count() > 0)
    assert(reqs.select($"reason").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("score_exceeded"))
  }
}
