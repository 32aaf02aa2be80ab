package graft.queries

import graft.Tables
import graft.anomaly.Threshold
import graft.stream.StreamOps
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Streaming surface (SURVEY §2 E41–E47), declared WITHOUT oracle SQL —
  * the driver records rows-only checks (SparkEntry.scala contract). Each
  * query replays the events table through a MemoryStream in event-time
  * chunks (watermarks advance across micro-batches), runs a Structured
  * Streaming pipeline to completion, then returns a deterministic batch
  * aggregation of the committed sink table. Streaming-vs-batch parity is
  * asserted in StreamSpec.
  */
object StreamingQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // E41+E42: watermark + tumbling event-time windows.
    "s57_stream_tumbling" -> ((s, d) => {
      val t = StreamOps.replayEvents(s, d, "s57_sink", 2)(
        StreamOps.tumblingAgg, OutputMode.Complete)
      t.select(col("window.start").as("win_start"), col("event_type"), col("n"),
        round(col("sum_value"), 2).as("sum_value"))
        .orderBy(col("win_start"), col("event_type"))
    }),

    // E44/P4: streaming dedup within watermark.
    "s58_stream_dedup" -> ((s, d) => {
      val t = StreamOps.replayEvents(s, d, "s58_sink", 2)(
        ds => StreamOps.streamingDedup(ds).drop("day"), OutputMode.Append)
      t.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_kept"))
        .orderBy(col("event_type"))
    }),

    // E43: session windows (30-min gap).
    "s59_stream_sessions" -> ((s, d) => {
      val t = StreamOps.replayEvents(s, d, "s59_sink", 2)(
        StreamOps.sessionize _, OutputMode.Append)
      t.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_sessions"), sum(col("n_events")).as("n_events"))
        .orderBy(col("user_id"))
    }),

    // E45/P3: exact-12 stateful window assembler (flatMapGroupsWithState).
    "s60_stream_assembler" -> ((s, d) => {
      val t = StreamOps.replayEvents(s, d, "s60_sink", 2)(
        ds => StreamOps.assembler(ds, 12).toDF(), OutputMode.Append)
      t.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_windows"),
          round(avg(col("win_mean")), 6).as("avg_win_mean"))
        .orderBy(col("event_type"))
    }),

    // The reference's full vertex chain as ONE streaming plan (P2→P3→P6→
    // P7→P8): exact-12 assembly (stateful) → model join → threshold score
    // → tanh norm, then a deterministic batch rollup of the sink.
    "s73_stream_pipeline" -> ((s, d) => {
      val model = Threshold.fit(Tables.events(s, d), Seq("event_type"), "value", 3.0)
        .select(col("event_type"), col("threshold"))
      val t = StreamOps.replayEvents(s, d, "s73_sink", 2)(
        ds => StreamOps.assembler(ds, 12).toDF()
          .join(broadcast(model), "event_type")
          .withColumn("score", graft.anomaly.AnomalyOps.tanhNorm(
            graft.anomaly.Threshold.score(col("win_mean"), col("threshold")))),
        OutputMode.Append)
      t.groupBy(date_trunc("day", col("end_ts")).as("day"))
        .agg(count(lit(1)).as("n_windows"),
          round(max(col("score")), 6).as("max_score"),
          round(avg(col("score")), 6).as("avg_score"))
        .orderBy(col("day"))
    }),

    // E46/P13+P6: stream–static model join scoring each arriving event.
    "s61_stream_static_score" -> ((s, d) => {
      val model = Threshold.fit(Tables.events(s, d), Seq("event_type"), "value", 3.0)
        .select(col("event_type"), col("threshold"))
      val t = StreamOps.replayEvents(s, d, "s61_sink", 2)(
        ds => StreamOps.streamStaticScore(ds, model), OutputMode.Append)
      t.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), round(avg(col("score")), 6).as("avg_score"))
        .orderBy(col("event_type"))
    })
  )

  /** No oracle entries — streaming is verified by rows-only checks here and
    * batch-parity assertions in scalatest (SURVEY §5.2 item 4). */
  val oracle: Map[String, String] = Map.empty
}
