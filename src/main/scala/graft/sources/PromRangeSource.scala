package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import scala.jdk.CollectionConverters._

/** DataSource V2 range-query source (SURVEY §2 P1/P14 "full parity" item —
  * the reference pulled history via the Prometheus fetcher's
  * `query_range(query, start, end, step)`, reference `CHANGELOG.md:90`).
  *
  * The real deployment points this connector at a PromQL HTTP endpoint; in
  * this repo (zero egress) the "endpoint" is a deterministic sample
  * generator, so the CONNECTOR machinery — `TableProvider` → `ScanBuilder`
  * → `Batch` → `PartitionReaderFactory` → `PartitionReader` — is fully
  * real and testable, and the payload is md5-derived so DuckDB reproduces
  * it bit-for-bit for the oracle.
  *
  * Scale design: one `InputPartition` per (series × 6h time slice) — the
  * same split a PromQL fetcher shards range pulls by. Executors read
  * slices in parallel; a month × 10k series fans out to ~1.2M independent
  * partitions with no driver-side materialization.
  *
  * Usage:
  * {{{
  * spark.read.format("graft.sources.PromRangeSource")
  *   .option("start", "1704067200")   // epoch seconds, inclusive
  *   .option("end",   "1704153600")   // epoch seconds, exclusive
  *   .option("stepSeconds", "60")
  *   .option("series", "cpu,mem,disk")
  *   .load()                           // => (series STRING, ts TIMESTAMP, value DOUBLE)
  * }}}
  */
class PromRangeSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PromRangeSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new PromRangeTable(properties.asScala.toMap)
}

object PromRangeSource {
  val schema: StructType = StructType(Seq(
    StructField("series", StringType, nullable = false),
    StructField("ts", TimestampType, nullable = false),
    StructField("value", DoubleType, nullable = false)))

  val SliceSeconds: Long = 6L * 3600

  /** Deterministic sample: (md5("series|sec") first-12-hex % 1000) / 10 —
    * mirrored in DuckDB as
    * `(CAST(concat('0x', substr(md5(series || '|' || sec), 1, 12)) AS BIGINT) % 1000) / 10.0`. */
  def sampleValue(series: String, sec: Long): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$series|$sec".getBytes("UTF-8"))
    val hex = md.map("%02x".format(_)).mkString.substring(0, 12)
    (java.lang.Long.parseLong(hex, 16) % 1000L) / 10.0
  }

  /** LIVE HTTP face of the connector (P1's last face): each slice
    * partition issues ONE `GET <endpoint>/api/v1/query_range?query=
    * <series>&start=<from>&end=<to-step>&step=<step>` and parses the
    * standard Prometheus JSON matrix response
    * (`data.result[].values = [[sec, "v"], …]`). The fetch runs INSIDE
    * the executor's PartitionReader — the driver plans only (series ×
    * slice) metadata, so a month × 10k series is ~1.2M independent HTTP
    * pulls fanned across the cluster, each bounded to one slice. Slice
    * pruning and series pushdown happen before any request is issued
    * (pruned slices are never fetched); a failed request throws, so
    * Spark's task retry covers endpoint flakiness. Jackson rides Spark's
    * own classpath. end is inclusive upstream, so the request sends
    * `to − 1`: grid points are `from + k·step`, and an inclusive end of
    * to−1 returns exactly the points < to — the generator face's [from,
    * to) — even when step does not divide the slice. */
  def httpReaderFactory(endpoint: String, fields: Seq[String]): PartitionReaderFactory = {
    val fieldArr = fields.toArray
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
        val p = partition.asInstanceOf[PromSlice]
        new PartitionReader[InternalRow] {
          private var it: Iterator[(Long, Double)] = _
          private var cur: (Long, Double) = _
          private def fetch(): Iterator[(Long, Double)] = {
            val url = new java.net.URI(endpoint +
              "/api/v1/query_range?query=" +
              java.net.URLEncoder.encode(p.series, "UTF-8") +
              s"&start=${p.fromSec}&end=${p.toSec - 1}&step=${p.stepSec}").toURL
            val conn = url.openConnection().asInstanceOf[java.net.HttpURLConnection]
            conn.setConnectTimeout(10000); conn.setReadTimeout(60000)
            val code = conn.getResponseCode
            if (code != 200)
              throw new java.io.IOException(s"query_range $url -> HTTP $code")
            val body = scala.io.Source.fromInputStream(conn.getInputStream, "UTF-8").mkString
            val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(body)
            require(root.path("status").asText() == "success",
              s"query_range $url -> status=${root.path("status").asText()}")
            val results = root.path("data").path("result")
            (0 until results.size()).iterator.flatMap { i =>
              val values = results.get(i).path("values")
              (0 until values.size()).iterator.map { j =>
                val v = values.get(j)
                (v.get(0).asLong(), v.get(1).asText().toDouble)
              }
            }
          }
          override def next(): Boolean = {
            if (it == null) it = fetch()
            if (it.hasNext) { cur = it.next(); true } else false
          }
          override def get(): InternalRow =
            InternalRow(fieldArr.map {
              case "series" => UTF8String.fromString(p.series)
              case "ts" => cur._1 * 1000000L
              case "value" => cur._2
            }: _*)
          override def close(): Unit = ()
        }
      }
    }
  }

  /** Reader factory emitting exactly the (possibly pruned) column set, in
    * the requested order. Shared by the batch scan and the micro-batch
    * stream (the stream reads the full schema). */
  def readerFactory(fields: Seq[String]): PartitionReaderFactory = {
    val fieldArr = fields.toArray
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
        val p = partition.asInstanceOf[PromSlice]
        new PartitionReader[InternalRow] {
          private var sec = p.fromSec - p.stepSec
          override def next(): Boolean = { sec += p.stepSec; sec < p.toSec }
          override def get(): InternalRow =
            InternalRow(fieldArr.map {
              case "series" => UTF8String.fromString(p.series)
              case "ts" => sec * 1000000L
              case "value" => PromRangeSource.sampleValue(p.series, sec)
            }: _*)
          override def close(): Unit = ()
        }
      }
    }
  }
}

class PromRangeTable(props: Map[String, String]) extends Table with SupportsRead {
  override def name(): String = s"prom_range(${props.getOrElse("series", "")})"
  override def schema(): StructType = PromRangeSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new PromRangeScan(props ++ options.asScala)
}

/** Time-based streaming offset: everything before `sec` has been served. */
case class PromOffset(sec: Long) extends Offset {
  override def json(): String = sec.toString
}

/** Micro-batch face of the connector (the reference's live scrape path,
  * P1 "stream in"): each trigger serves the next `batchSeconds` of the
  * range as one batch of (series × slice) partitions, advancing a
  * time-based offset until `end`. Deterministic — replaying the full
  * range to completion equals the batch read, which is what lets the
  * streaming query carry the same DuckDB oracle. */
class PromMicroBatch(props: Map[String, String]) extends MicroBatchStream {
  private val start = props("start").toLong
  private val end = props("end").toLong
  private val step = props("stepSeconds").toLong
  private val batchSec = props.getOrElse("batchSeconds", "21600").toLong
  private var planned: Long = start

  override def initialOffset(): Offset = PromOffset(start)
  override def latestOffset(): Offset = {
    planned = math.min(end, math.max(planned, start) + batchSec)
    PromOffset(planned)
  }
  override def deserializeOffset(json: String): Offset = PromOffset(json.toLong)
  override def commit(offset: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(startOff: Offset, endOff: Offset): Array[InputPartition] = {
    val a = startOff.asInstanceOf[PromOffset].sec
    val b = endOff.asInstanceOf[PromOffset].sec
    val series = props.getOrElse("series", "").split(",").map(_.trim).filter(_.nonEmpty)
    series.toSeq.map { s =>
      // grid stays anchored at the global start so batch boundaries never
      // duplicate or drop a sample.
      val firstIdx = (a - start + step - 1) / step
      PromSlice(s, start + firstIdx * step, b, step)
    }.filter(p => p.fromSec < p.toSec).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    props.get("endpoint") match {
      case Some(ep) =>
        PromRangeSource.httpReaderFactory(ep, PromRangeSource.schema.fieldNames.toSeq)
      case None =>
        PromRangeSource.readerFactory(PromRangeSource.schema.fieldNames.toSeq)
    }
}

/** One slice of one series: rows at `start + i*step` for ts ∈ [from, to). */
case class PromSlice(series: String, fromSec: Long, toSec: Long, stepSec: Long)
  extends InputPartition

class PromRangeScan(props: Map[String, String])
  extends ScanBuilder with Scan with Batch
  with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
  private def long(key: String): Long = props.getOrElse(key,
    throw new IllegalArgumentException(s"PromRangeSource: missing option '$key'")).toLong

  // Pruning bounds tightened by pushed filters. Conservative by design:
  // every filter is also RETURNED as remaining (Spark re-applies it after
  // the scan), so pruning only skips whole slices / series that cannot
  // match — it can shrink IO, never change results.
  private var tsLowSec: Long = Long.MinValue
  private var tsHighSec: Long = Long.MaxValue
  private var seriesKeep: Option[Set[String]] = None
  private var pruned: Array[Filter] = Array.empty

  private def tsSec(v: Any): Option[Long] = v match {
    case t: java.sql.Timestamp => Some(t.getTime / 1000L)
    case i: java.time.Instant => Some(i.getEpochSecond)
    case _ => None
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val used = filters.filter {
      case GreaterThanOrEqual("ts", v) => tsSec(v).exists { s => tsLowSec = tsLowSec.max(s); true }
      case GreaterThan("ts", v)        => tsSec(v).exists { s => tsLowSec = tsLowSec.max(s); true }
      case LessThanOrEqual("ts", v)    => tsSec(v).exists { s => tsHighSec = tsHighSec.min(s + 1); true }
      case LessThan("ts", v)           => tsSec(v).exists { s => tsHighSec = tsHighSec.min(s + 1); true }
      case EqualTo("series", v: String) =>
        seriesKeep = Some(seriesKeep.getOrElse(Set(v)).intersect(Set(v))); true
      case In("series", vs) =>
        val set = vs.collect { case s: String => s }.toSet
        seriesKeep = Some(seriesKeep.fold(set)(_.intersect(set))); true
      case _ => false
    }
    pruned = used
    filters // all remain — Spark re-applies them post-scan
  }

  override def pushedFilters(): Array[Filter] = pruned

  private var required: StructType = PromRangeSource.schema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = this
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val start = long("start"); val end = long("end"); val step = long("stepSeconds")
    require(step > 0 && end >= start, "PromRangeSource: need end >= start, stepSeconds > 0")
    val series = props.getOrElse("series", "").split(",").map(_.trim).filter(_.nonEmpty)
      .filter(s => seriesKeep.forall(_.contains(s)))
    val slice = PromRangeSource.SliceSeconds
    (for {
      s <- series.toSeq
      // slice boundaries snap to the step grid so each sample lands in
      // exactly one partition: from = first step-aligned sec >= sliceStart.
      sliceStart <- start until end by slice
      if sliceStart + slice > tsLowSec && sliceStart < tsHighSec
    } yield {
      val firstIdx = (sliceStart - start + step - 1) / step
      val from = start + firstIdx * step
      val to = math.min(sliceStart + slice, end)
      PromSlice(s, from, to, step)
    }).filter(p => p.fromSec < p.toSec).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    props.get("endpoint") match {
      case Some(ep) => PromRangeSource.httpReaderFactory(ep, required.fieldNames.toSeq)
      case None => PromRangeSource.readerFactory(required.fieldNames.toSeq)
    }

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new PromMicroBatch(props)
}
