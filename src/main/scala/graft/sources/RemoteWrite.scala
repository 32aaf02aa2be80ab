package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Prometheus REMOTE-WRITE ingestion — the reference's actual ingest wire
  * (its scrape pipeline consumed Prometheus data re-published to the
  * stream bus via a prometheus-serde, reference `CHANGELOG.md:353`); this
  * is the `prometheus.WriteRequest` payload every Prometheus ships to a
  * remote store: `timeseries[] = {labels[] = {name, value},
  * samples[] = {value, timestamp(ms)}}`.
  *
  * Encoding note: the upstream wire is snappy-compressed protobuf; this
  * sandbox carries no protobuf/snappy deps (zero egress), so the engine
  * ingests the JSON rendering of the SAME message shape — field names and
  * nesting are the protobuf JSON mapping, so a real deployment swaps the
  * `from_json` for a protobuf decode (Spark 4 ships `from_protobuf`)
  * without touching anything downstream.
  *
  * Zero-UDF discipline (same as [[Otlp]]): one `from_json` + two
  * `explode`s + pure column math, all map-side inside whole-stage
  * codegen — a 100 TB remote-write archive parses at scan speed with no
  * shuffle until the caller aggregates. Label translation: `__name__`
  * becomes the metric column (dropped from the label map), everything
  * else stays a label; sample timestamps are MILLISECONDS (the
  * remote-write unit, unlike OTLP's nanoseconds).
  */
object RemoteWrite {

  private val labelType = ArrayType(StructType(Seq(
    StructField("name", StringType),
    StructField("value", StringType))))

  private val sampleType = ArrayType(StructType(Seq(
    StructField("value", DoubleType),
    StructField("timestamp", LongType))))

  val schema: DataType = StructType(Seq(
    StructField("timeseries", ArrayType(StructType(Seq(
      StructField("labels", labelType),
      StructField("samples", sampleType)))))))

  /** Parse a frame holding one remote-write request document per row in
    * `jsonCol` into samples: `metric` (the `__name__` label), `labels`
    * (the remaining label map), `ts` (timestamp), `value` (double). */
  def parse(df: DataFrame, jsonCol: String = "json"): DataFrame = {
    val labelMap = map_from_entries(transform(col("ts_row.labels"),
      l => struct(l.getField("name"), l.getField("value"))))
    df.select(from_json(col(jsonCol), schema).as("d"))
      .select(explode(col("d.timeseries")).as("ts_row"))
      .select(labelMap.as("__labels"), explode(col("ts_row.samples")).as("s"))
      .select(
        element_at(col("__labels"), "__name__").as("metric"),
        map_filter(col("__labels"), (k, _) => k =!= "__name__").as("labels"),
        timestamp_millis(col("s.timestamp")).as("ts"),
        col("s.value").as("value"))
  }

  /** Render a sample frame INTO remote-write request documents — the
    * inverse used by the replay harness and oracle (one request per
    * `docKey` group, one timeseries per (metric, label set) within it,
    * samples ordered by timestamp as upstream requires). */
  def render(df: DataFrame, docKey: Column, metricCol: Column, tsCol: Column,
             valueCol: Column, labelCols: Seq[(String, Column)]): DataFrame = {
    val labels = array(
      (("__name__", metricCol) +: labelCols).map { case (k, c) =>
        struct(lit(k).as("name"), c.cast("string").as("value"))
      }: _*)
    // timestamp leads the struct so array_sort orders samples by time
    // (upstream requires ascending-timestamp samples); from_json reads
    // fields by name, so the JSON field order is irrelevant.
    val sample = struct(
      unix_millis(tsCol).as("timestamp"),
      valueCol.cast("double").as("value"))
    df.groupBy(docKey.as("__doc"), labels.as("__labels"))
      .agg(array_sort(collect_list(sample)).as("samples"))
      .groupBy(col("__doc"))
      .agg(to_json(struct(collect_list(
        struct(col("__labels").as("labels"), col("samples"))).as("timeseries")))
        .as("json"))
  }
}
