package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.{ColumnBridge => ExpressionUtils}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Protocol-buffers WIRE codec for `prometheus.WriteRequest` (remote-write
  * v1) — REAL length-delimited bytes, not a JSON stand-in. The message
  * shape (public remote-write spec / prompb/remote.proto):
  *
  *   WriteRequest { repeated TimeSeries timeseries = 1; }
  *   TimeSeries   { repeated Label labels = 1; repeated Sample samples = 2; }
  *   Label        { string name = 1; string value = 2; }
  *   Sample       { double value = 1; int64 timestamp = 2; }
  *
  * Encoding rules are the public protobuf wire format: tag =
  * (field << 3) | wiretype; wiretype 0 = varint (int64 timestamps), 1 =
  * fixed64 little-endian (doubles), 2 = length-delimited (strings and
  * embedded messages). The decoder is a defensive field walk — unknown
  * fields of any wire type are skipped by their own length rule, and
  * absent fields read proto3 defaults (0 / ""), so canonical Go-encoded
  * requests (which omit zero values) parse identically to this encoder's
  * explicit output.
  *
  * Execution posture mirrors [[XorChunk]]/[[Postings]]: MESSAGE grain —
  * one expression call per request document (thousands of samples), never
  * per sample, so CodegenFallback boxing is amortized to nothing and the
  * per-byte walk stays a tight JVM loop. A 100 TB remote-write archive
  * decodes map-side at scan speed with zero shuffle until the caller
  * aggregates.
  *
  * Upstream wraps the bytes in snappy framing; that layer is a
  * documented delta (no snappy dep in this sandbox) and is orthogonal —
  * the protobuf layer here is the part that was previously stubbed.
  */
object ProtoWire {

  /** The decoded Catalyst shape — field names/order match
    * [[graft.sources.RemoteWrite]]'s JSON schema so both wire faces
    * share every downstream column expression. */
  val writeRequestType: DataType = ArrayType(StructType(Seq(
    StructField("labels", ArrayType(StructType(Seq(
      StructField("name", StringType),
      StructField("value", StringType))))),
    StructField("samples", ArrayType(StructType(Seq(
      StructField("value", DoubleType),
      StructField("timestamp", LongType))))))))

  // ---- plain model (spec-side fixtures + readable codec core) ----
  final case class Label(name: String, value: String)
  final case class Sample(value: Double, timestamp: Long)
  final case class Series(labels: Seq[Label], samples: Seq[Sample])

  private final class Writer {
    val out = new java.io.ByteArrayOutputStream(256)
    def varint(x0: Long): Unit = {
      var x = x0
      while ((x & ~0x7fL) != 0L) { out.write(((x & 0x7fL) | 0x80L).toInt); x >>>= 7 }
      out.write(x.toInt)
    }
    def tag(field: Int, wt: Int): Unit = varint(((field << 3) | wt).toLong)
    def lenDelim(field: Int, bytes: Array[Byte]): Unit = {
      tag(field, 2); varint(bytes.length.toLong); out.write(bytes)
    }
    def str(field: Int, s: String): Unit = lenDelim(field, s.getBytes("UTF-8"))
    def fixed64(field: Int, bits: Long): Unit = {
      tag(field, 1)
      var i = 0; var b = bits
      while (i < 8) { out.write((b & 0xff).toInt); b >>>= 8; i += 1 }
    }
    def int64(field: Int, v: Long): Unit = { tag(field, 0); varint(v) }
    def bytes: Array[Byte] = out.toByteArray
  }

  private def labelBytes(l: Label): Array[Byte] = {
    val w = new Writer; w.str(1, l.name); w.str(2, l.value); w.bytes
  }
  private def sampleBytes(s: Sample): Array[Byte] = {
    val w = new Writer
    w.fixed64(1, java.lang.Double.doubleToLongBits(s.value))
    w.int64(2, s.timestamp)
    w.bytes
  }
  private def seriesBytes(ts: Series): Array[Byte] = {
    val w = new Writer
    ts.labels.foreach(l => w.lenDelim(1, labelBytes(l)))
    ts.samples.foreach(s => w.lenDelim(2, sampleBytes(s)))
    w.bytes
  }

  /** A full `WriteRequest` message as real protobuf bytes. */
  def encode(series: Seq[Series]): Array[Byte] = {
    val w = new Writer
    series.foreach(ts => w.lenDelim(1, seriesBytes(ts)))
    w.bytes
  }

  private final class Reader(bytes: Array[Byte], var pos: Int, val end: Int) {
    def hasMore: Boolean = pos < end
    def varint(): Long = {
      var v = 0L; var shift = 0; var more = true
      while (more) {
        if (pos >= end) throw new IllegalArgumentException(
          "protobuf: truncated varint")
        val b = bytes(pos) & 0xff; pos += 1
        if (shift < 64) v |= (b & 0x7fL) << shift
        shift += 7
        more = (b & 0x80) != 0
      }
      v
    }
    def fixed64(): Long = {
      if (pos + 8 > end) throw new IllegalArgumentException(
        "protobuf: truncated fixed64")
      var v = 0L; var i = 7
      while (i >= 0) { v = (v << 8) | (bytes(pos + i) & 0xffL); i -= 1 }
      pos += 8
      v
    }
    def lenDelim(): Reader = {
      val n = varint().toInt
      if (n < 0 || pos + n > end) throw new IllegalArgumentException(
        s"protobuf: bad length $n")
      val r = new Reader(bytes, pos, pos + n); pos += n; r
    }
    def rawBytes(): Array[Byte] = {
      val n = varint().toInt
      if (n < 0 || pos + n > end) throw new IllegalArgumentException(
        s"protobuf: bad length $n")
      val out = java.util.Arrays.copyOfRange(bytes, pos, pos + n); pos += n
      out
    }
    def utf8(): String = {
      val n = varint().toInt
      if (n < 0 || pos + n > end) throw new IllegalArgumentException(
        s"protobuf: bad length $n")
      val s = new String(bytes, pos, n, "UTF-8"); pos += n; s
    }
    /** Skip one field of any wire type (forward compatibility). Every
      * advance is bounds-checked: a crafted varint length that truncates
      * to a negative Int must fail loudly, not move `pos` backwards and
      * spin the `while (hasMore)` decode loops forever (this reader runs
      * on untrusted /api/v1/write and /api/v1/read POST bodies). */
    def skip(wt: Int): Unit = wt match {
      case 0 => varint(): Unit
      case 1 =>
        if (pos + 8 > end) throw new IllegalArgumentException(
          "protobuf: truncated fixed64 skip")
        pos += 8
      case 2 =>
        val n = varint().toInt
        if (n < 0 || pos + n > end) throw new IllegalArgumentException(
          s"protobuf: bad skip length $n")
        pos += n
      case 5 =>
        if (pos + 4 > end) throw new IllegalArgumentException(
          "protobuf: truncated fixed32 skip")
        pos += 4
      case other => throw new IllegalArgumentException(
        s"protobuf: unsupported wire type $other")
    }
  }

  private def readLabel(r: Reader): Label = {
    var name = ""; var value = ""
    while (r.hasMore) {
      val t = r.varint(); val f = (t >>> 3).toInt; val wt = (t & 7).toInt
      (f, wt) match {
        case (1, 2) => name = r.utf8()
        case (2, 2) => value = r.utf8()
        case _ => r.skip(wt)
      }
    }
    Label(name, value)
  }

  private def readSample(r: Reader): Sample = {
    var value = 0.0; var ts = 0L
    while (r.hasMore) {
      val t = r.varint(); val f = (t >>> 3).toInt; val wt = (t & 7).toInt
      (f, wt) match {
        case (1, 1) => value = java.lang.Double.longBitsToDouble(r.fixed64())
        case (2, 0) => ts = r.varint()
        case _ => r.skip(wt)
      }
    }
    Sample(value, ts)
  }

  private def readSeries(r: Reader): Series = {
    val labels = Seq.newBuilder[Label]
    val samples = Seq.newBuilder[Sample]
    while (r.hasMore) {
      val t = r.varint(); val f = (t >>> 3).toInt; val wt = (t & 7).toInt
      (f, wt) match {
        case (1, 2) => labels += readLabel(r.lenDelim())
        case (2, 2) => samples += readSample(r.lenDelim())
        case _ => r.skip(wt)
      }
    }
    Series(labels.result(), samples.result())
  }

  /** Parse real `WriteRequest` protobuf bytes. */
  def decode(bytes: Array[Byte]): Seq[Series] = {
    val r = new Reader(bytes, 0, bytes.length)
    val series = Seq.newBuilder[Series]
    while (r.hasMore) {
      val t = r.varint(); val f = (t >>> 3).toInt; val wt = (t & 7).toInt
      (f, wt) match {
        case (1, 2) => series += readSeries(r.lenDelim())
        case _ => r.skip(wt)
      }
    }
    series.result()
  }

  def encodeCol(series: Column): Column =
    ExpressionUtils.column(PbWriteRequestEncode(ExpressionUtils.expression(series)))
  def decodeCol(bytes: Column): Column =
    ExpressionUtils.column(PbWriteRequestDecode(ExpressionUtils.expression(bytes)))

  // ---------- remote-write 2.0 (io.prometheus.write.v2.Request) ----------
  //
  //   Request    { reserved 1..3; repeated string symbols = 4;
  //                repeated TimeSeries timeseries = 5; }
  //   TimeSeries { repeated uint32 labels_refs = 1 [packed];
  //                repeated Sample samples = 2;
  //                repeated Exemplar exemplars = 4; /* 3,5,6 skipped */ }
  //   Exemplar   { repeated uint32 labels_refs = 1 [packed];
  //                double value = 2; int64 timestamp = 3; }
  //
  // labels_refs is PACKED (proto3 default for scalar repeated): one
  // LEN-delimited run of varints. The decoder also accepts the unpacked
  // spelling (repeated wiretype-0 fields) — spec-required tolerance.

  final case class ExemplarV2(labelsRefs: Seq[Int], value: Double, timestamp: Long)

  /** Native histogram on the v2 wire (types.proto `Histogram`, integer
    * flavour): sint fields are ZIGZAG varints, span/delta runs are
    * PACKED. `spans` are (offset, length) pairs; deltas are the
    * upstream delta-coded counts. */
  final case class HistogramPb(countInt: Long, sum: Double, schema: Int,
                               zeroCountInt: Long,
                               negSpans: Seq[(Int, Int)], negDeltas: Seq[Long],
                               posSpans: Seq[(Int, Int)], posDeltas: Seq[Long],
                               timestamp: Long)
  final case class SeriesV2(labelsRefs: Seq[Int], samples: Seq[Sample],
                            exemplars: Seq[ExemplarV2],
                            histograms: Seq[HistogramPb] = Nil)
  final case class RequestV2(symbols: Seq[String], timeseries: Seq[SeriesV2])

  // zigzag (protobuf sint32/sint64): small negatives stay small
  private def zigzag(n: Long): Long = (n << 1) ^ (n >> 63)
  private def unzigzag(v: Long): Long = (v >>> 1) ^ -(v & 1L)

  /** The decoded Catalyst shape — matches
    * [[graft.sources.RemoteWrite]]'s rw2 JSON schema field for field. */
  private val spanType = ArrayType(StructType(Seq(
    StructField("offset", IntegerType),
    StructField("length", IntegerType))))

  val requestV2Type: DataType = StructType(Seq(
    StructField("symbols", ArrayType(StringType)),
    StructField("timeseries", ArrayType(StructType(Seq(
      StructField("labelsRefs", ArrayType(IntegerType)),
      StructField("samples", ArrayType(StructType(Seq(
        StructField("value", DoubleType),
        StructField("timestamp", LongType))))),
      StructField("exemplars", ArrayType(StructType(Seq(
        StructField("labelsRefs", ArrayType(IntegerType)),
        StructField("value", DoubleType),
        StructField("timestamp", LongType))))),
      StructField("histograms", ArrayType(StructType(Seq(
        StructField("countInt", LongType),
        StructField("sum", DoubleType),
        StructField("schema", IntegerType),
        StructField("zeroCountInt", LongType),
        StructField("negativeSpans", spanType),
        StructField("negativeDeltas", ArrayType(LongType)),
        StructField("positiveSpans", spanType),
        StructField("positiveDeltas", ArrayType(LongType)),
        StructField("timestamp", LongType)))))))))))

  private def packedBytes(xs: Seq[Int]): Array[Byte] = {
    val w = new Writer; xs.foreach(x => w.varint(x.toLong & 0xffffffffL)); w.bytes
  }
  private def exemplarBytes(e: ExemplarV2): Array[Byte] = {
    val w = new Writer
    if (e.labelsRefs.nonEmpty) w.lenDelim(1, packedBytes(e.labelsRefs))
    w.fixed64(2, java.lang.Double.doubleToLongBits(e.value))
    w.int64(3, e.timestamp)
    w.bytes
  }
  private def spanBytes(sp: (Int, Int)): Array[Byte] = {
    val w = new Writer
    if (sp._1 != 0) { w.tag(1, 0); w.varint(zigzag(sp._1.toLong)) } // sint32
    if (sp._2 != 0) w.int64(2, sp._2.toLong)                       // uint32
    w.bytes
  }
  private def packedZigzag(xs: Seq[Long]): Array[Byte] = {
    val w = new Writer; xs.foreach(x => w.varint(zigzag(x))); w.bytes
  }
  private def histogramBytes(h: HistogramPb): Array[Byte] = {
    val w = new Writer
    if (h.countInt != 0) w.int64(1, h.countInt)              // count_int
    w.fixed64(3, java.lang.Double.doubleToLongBits(h.sum))   // sum
    if (h.schema != 0) { w.tag(4, 0); w.varint(zigzag(h.schema.toLong)) }
    if (h.zeroCountInt != 0) w.int64(6, h.zeroCountInt)      // zero_count_int
    h.negSpans.foreach(sp => w.lenDelim(8, spanBytes(sp)))
    if (h.negDeltas.nonEmpty) w.lenDelim(9, packedZigzag(h.negDeltas))
    h.posSpans.foreach(sp => w.lenDelim(11, spanBytes(sp)))
    if (h.posDeltas.nonEmpty) w.lenDelim(12, packedZigzag(h.posDeltas))
    if (h.timestamp != 0) w.int64(15, h.timestamp)
    w.bytes
  }
  private def seriesV2Bytes(ts: SeriesV2): Array[Byte] = {
    val w = new Writer
    if (ts.labelsRefs.nonEmpty) w.lenDelim(1, packedBytes(ts.labelsRefs))
    ts.samples.foreach(s => w.lenDelim(2, sampleBytes(s)))
    ts.histograms.foreach(h => w.lenDelim(3, histogramBytes(h)))
    ts.exemplars.foreach(e => w.lenDelim(4, exemplarBytes(e)))
    w.bytes
  }

  /** A full v2 `Request` message as real protobuf bytes. */
  def encodeV2(req: RequestV2): Array[Byte] = {
    val w = new Writer
    req.symbols.foreach(s => w.str(4, s))
    req.timeseries.foreach(ts => w.lenDelim(5, seriesV2Bytes(ts)))
    w.bytes
  }

  private def readPacked(r: Reader): Seq[Int] = {
    val out = Seq.newBuilder[Int]
    while (r.hasMore) out += r.varint().toInt
    out.result()
  }
  private def readExemplar(r: Reader): ExemplarV2 = {
    val refs = Seq.newBuilder[Int]
    var value = 0.0; var ts = 0L
    while (r.hasMore) {
      val t = r.varint(); val f = (t >>> 3).toInt; val wt = (t & 7).toInt
      (f, wt) match {
        case (1, 2) => refs ++= readPacked(r.lenDelim())
        case (1, 0) => refs += r.varint().toInt // unpacked spelling
        case (2, 1) => value = java.lang.Double.longBitsToDouble(r.fixed64())
        case (3, 0) => ts = r.varint()
        case _ => r.skip(wt)
      }
    }
    ExemplarV2(refs.result(), value, ts)
  }
  private def readSpan(r: Reader): (Int, Int) = {
    var off = 0; var len = 0
    while (r.hasMore) {
      val t = r.varint(); val f = (t >>> 3).toInt; val wt = (t & 7).toInt
      (f, wt) match {
        case (1, 0) => off = unzigzag(r.varint()).toInt
        case (2, 0) => len = r.varint().toInt
        case _ => r.skip(wt)
      }
    }
    (off, len)
  }
  private def readPackedZigzag(r: Reader): Seq[Long] = {
    val out = Seq.newBuilder[Long]
    while (r.hasMore) out += unzigzag(r.varint())
    out.result()
  }
  private def readHistogram(r: Reader): HistogramPb = {
    var cnt = 0L; var sum = 0.0; var schema = 0; var zc = 0L; var ts = 0L
    val ns = Seq.newBuilder[(Int, Int)]; val nd = Seq.newBuilder[Long]
    val ps = Seq.newBuilder[(Int, Int)]; val pd = Seq.newBuilder[Long]
    while (r.hasMore) {
      val t = r.varint(); val f = (t >>> 3).toInt; val wt = (t & 7).toInt
      (f, wt) match {
        case (1, 0)  => cnt = r.varint()
        case (3, 1)  => sum = java.lang.Double.longBitsToDouble(r.fixed64())
        case (4, 0)  => schema = unzigzag(r.varint()).toInt
        case (6, 0)  => zc = r.varint()
        case (8, 2)  => ns += readSpan(r.lenDelim())
        case (9, 2)  => nd ++= readPackedZigzag(r.lenDelim())
        case (9, 0)  => nd += unzigzag(r.varint()) // unpacked spelling
        case (11, 2) => ps += readSpan(r.lenDelim())
        case (12, 2) => pd ++= readPackedZigzag(r.lenDelim())
        case (12, 0) => pd += unzigzag(r.varint())
        case (15, 0) => ts = r.varint()
        case _ => r.skip(wt) // float flavour / zero_threshold / reset_hint
      }
    }
    HistogramPb(cnt, sum, schema, zc, ns.result(), nd.result(),
      ps.result(), pd.result(), ts)
  }
  private def readSeriesV2(r: Reader): SeriesV2 = {
    val refs = Seq.newBuilder[Int]
    val samples = Seq.newBuilder[Sample]
    val exemplars = Seq.newBuilder[ExemplarV2]
    val histograms = Seq.newBuilder[HistogramPb]
    while (r.hasMore) {
      val t = r.varint(); val f = (t >>> 3).toInt; val wt = (t & 7).toInt
      (f, wt) match {
        case (1, 2) => refs ++= readPacked(r.lenDelim())
        case (1, 0) => refs += r.varint().toInt
        case (2, 2) => samples += readSample(r.lenDelim())
        case (3, 2) => histograms += readHistogram(r.lenDelim())
        case (4, 2) => exemplars += readExemplar(r.lenDelim())
        case _ => r.skip(wt) // metadata=5, created_ts=6
      }
    }
    SeriesV2(refs.result(), samples.result(), exemplars.result(),
      histograms.result())
  }

  /** Parse real v2 `Request` protobuf bytes. */
  def decodeV2(bytes: Array[Byte]): RequestV2 = {
    val r = new Reader(bytes, 0, bytes.length)
    val symbols = Seq.newBuilder[String]
    val series = Seq.newBuilder[SeriesV2]
    while (r.hasMore) {
      val t = r.varint(); val f = (t >>> 3).toInt; val wt = (t & 7).toInt
      (f, wt) match {
        case (4, 2) => symbols += r.utf8()
        case (5, 2) => series += readSeriesV2(r.lenDelim())
        case _ => r.skip(wt)
      }
    }
    RequestV2(symbols.result(), series.result())
  }

  def encodeV2Col(req: Column): Column =
    ExpressionUtils.column(PbRequestV2Encode(ExpressionUtils.expression(req)))
  def decodeV2Col(bytes: Column): Column =
    ExpressionUtils.column(PbRequestV2Decode(ExpressionUtils.expression(bytes)))

  // ---------- remote-read (prometheus.ReadRequest / ReadResponse) ----------
  //
  //   ReadRequest  { repeated Query queries = 1;
  //                  repeated ResponseType accepted_response_types = 2
  //                    [packed enum: SAMPLES=0, STREAMED_XOR_CHUNKS=1]; }
  //   Query        { int64 start_timestamp_ms = 1;
  //                  int64 end_timestamp_ms = 2;
  //                  repeated LabelMatcher matchers = 3;
  //                  ReadHints hints = 4 (skipped); }
  //   LabelMatcher { Type type = 1 [EQ=0 NEQ=1 RE=2 NRE=3];
  //                  string name = 2; string value = 3; }
  //   ReadResponse { repeated QueryResult results = 1; }
  //   QueryResult  { repeated TimeSeries timeseries = 1; }
  //
  // TimeSeries/Label/Sample are the v1 WriteRequest shapes — shared.
  // These messages are KB-sized driver work (a read request, a response
  // frame), so they stay plain functions, not expressions.

  final case class MatcherPb(mtype: Int, name: String, value: String)
  final case class ReadQueryPb(startMs: Long, endMs: Long,
                               matchers: Seq[MatcherPb])
  final case class ReadRequestPb(queries: Seq[ReadQueryPb],
                                 acceptedTypes: Seq[Int])

  private def matcherBytes(m: MatcherPb): Array[Byte] = {
    val w = new Writer
    if (m.mtype != 0) w.int64(1, m.mtype.toLong)
    w.str(2, m.name); w.str(3, m.value)
    w.bytes
  }
  private def readQueryBytes(q: ReadQueryPb): Array[Byte] = {
    val w = new Writer
    if (q.startMs != 0) w.int64(1, q.startMs)
    if (q.endMs != 0) w.int64(2, q.endMs)
    q.matchers.foreach(m => w.lenDelim(3, matcherBytes(m)))
    w.bytes
  }

  def encodeReadRequest(req: ReadRequestPb): Array[Byte] = {
    val w = new Writer
    req.queries.foreach(q => w.lenDelim(1, readQueryBytes(q)))
    if (req.acceptedTypes.nonEmpty)
      w.lenDelim(2, packedBytes(req.acceptedTypes))
    w.bytes
  }

  private def readMatcher(r: Reader): MatcherPb = {
    var t = 0; var name = ""; var value = ""
    while (r.hasMore) {
      val tag = r.varint(); val f = (tag >>> 3).toInt; val wt = (tag & 7).toInt
      (f, wt) match {
        case (1, 0) => t = r.varint().toInt
        case (2, 2) => name = r.utf8()
        case (3, 2) => value = r.utf8()
        case _ => r.skip(wt)
      }
    }
    MatcherPb(t, name, value)
  }
  private def readReadQuery(r: Reader): ReadQueryPb = {
    var start = 0L; var end = 0L
    val ms = Seq.newBuilder[MatcherPb]
    while (r.hasMore) {
      val tag = r.varint(); val f = (tag >>> 3).toInt; val wt = (tag & 7).toInt
      (f, wt) match {
        case (1, 0) => start = r.varint()
        case (2, 0) => end = r.varint()
        case (3, 2) => ms += readMatcher(r.lenDelim())
        case _ => r.skip(wt) // hints = 4
      }
    }
    ReadQueryPb(start, end, ms.result())
  }

  def decodeReadRequest(bytes: Array[Byte]): ReadRequestPb = {
    val r = new Reader(bytes, 0, bytes.length)
    val qs = Seq.newBuilder[ReadQueryPb]
    val at = Seq.newBuilder[Int]
    while (r.hasMore) {
      val tag = r.varint(); val f = (tag >>> 3).toInt; val wt = (tag & 7).toInt
      (f, wt) match {
        case (1, 2) => qs += readReadQuery(r.lenDelim())
        case (2, 2) => at ++= readPacked(r.lenDelim())
        case (2, 0) => at += r.varint().toInt // unpacked enum spelling
        case _ => r.skip(wt)
      }
    }
    ReadRequestPb(qs.result(), at.result())
  }

  def encodeReadResponse(results: Seq[Seq[Series]]): Array[Byte] = {
    val w = new Writer
    results.foreach { tss =>
      val qr = new Writer
      tss.foreach(ts => qr.lenDelim(1, seriesBytes(ts)))
      w.lenDelim(1, qr.bytes)
    }
    w.bytes
  }

  // ---- streamed remote-read (prometheus.ChunkedReadResponse) ----
  //
  //   ChunkedReadResponse { repeated ChunkedSeries chunked_series = 1;
  //                         int64 query_index = 2; }
  //   ChunkedSeries { repeated Label labels = 1; repeated Chunk chunks = 2; }
  //   Chunk { int64 min_time_ms = 1; int64 max_time_ms = 2;
  //           Encoding type = 3 [XOR = 1]; bytes data = 4; }
  //
  // Frame transport (storage/remote chunked.go ChunkedWriter): each
  // message rides as uvarint(len) · 4-byte BIG-ENDIAN CRC32-Castagnoli
  // of the payload · payload. Streamed responses are NOT snappy'd —
  // the chunk data bytes are already XOR-compressed.

  final case class ChunkPb(minMs: Long, maxMs: Long, ctype: Int,
                           data: Seq[Byte])
  final case class ChunkedSeriesPb(labels: Seq[Label], chunks: Seq[ChunkPb])
  final case class ChunkedReadResponsePb(series: Seq[ChunkedSeriesPb],
                                         queryIndex: Long)

  private def chunkBytes(c: ChunkPb): Array[Byte] = {
    val w = new Writer
    if (c.minMs != 0) w.int64(1, c.minMs)
    if (c.maxMs != 0) w.int64(2, c.maxMs)
    if (c.ctype != 0) w.int64(3, c.ctype.toLong)
    w.lenDelim(4, c.data.toArray)
    w.bytes
  }
  private def chunkedSeriesBytes(s: ChunkedSeriesPb): Array[Byte] = {
    val w = new Writer
    s.labels.foreach(l => w.lenDelim(1, labelBytes(l)))
    s.chunks.foreach(c => w.lenDelim(2, chunkBytes(c)))
    w.bytes
  }

  def encodeChunkedReadResponse(m: ChunkedReadResponsePb): Array[Byte] = {
    val w = new Writer
    m.series.foreach(s => w.lenDelim(1, chunkedSeriesBytes(s)))
    if (m.queryIndex != 0) w.int64(2, m.queryIndex)
    w.bytes
  }

  private def readChunk(r: Reader): ChunkPb = {
    var mn = 0L; var mx = 0L; var t = 0; var data: Seq[Byte] = Nil
    while (r.hasMore) {
      val tag = r.varint(); val f = (tag >>> 3).toInt; val wt = (tag & 7).toInt
      (f, wt) match {
        case (1, 0) => mn = r.varint()
        case (2, 0) => mx = r.varint()
        case (3, 0) => t = r.varint().toInt
        case (4, 2) => data = scala.collection.immutable.ArraySeq
          .unsafeWrapArray(r.rawBytes())
        case _ => r.skip(wt)
      }
    }
    ChunkPb(mn, mx, t, data)
  }
  private def readChunkedSeries(r: Reader): ChunkedSeriesPb = {
    val ls = Seq.newBuilder[Label]; val cs = Seq.newBuilder[ChunkPb]
    while (r.hasMore) {
      val tag = r.varint(); val f = (tag >>> 3).toInt; val wt = (tag & 7).toInt
      (f, wt) match {
        case (1, 2) => ls += readLabel(r.lenDelim())
        case (2, 2) => cs += readChunk(r.lenDelim())
        case _ => r.skip(wt)
      }
    }
    ChunkedSeriesPb(ls.result(), cs.result())
  }

  def decodeChunkedReadResponse(bytes: Array[Byte]): ChunkedReadResponsePb = {
    val r = new Reader(bytes, 0, bytes.length)
    val ss = Seq.newBuilder[ChunkedSeriesPb]
    var qi = 0L
    while (r.hasMore) {
      val tag = r.varint(); val f = (tag >>> 3).toInt; val wt = (tag & 7).toInt
      (f, wt) match {
        case (1, 2) => ss += readChunkedSeries(r.lenDelim())
        case (2, 0) => qi = r.varint()
        case _ => r.skip(wt)
      }
    }
    ChunkedReadResponsePb(ss.result(), qi)
  }

  /** CRC32-Castagnoli (the chunked-transport checksum). */
  def crc32c(b: Array[Byte]): Long = {
    val c = new java.util.zip.CRC32C
    c.update(b)
    c.getValue
  }

  /** Frame messages per upstream chunked.go: uvarint(len) · BE-CRC32C ·
    * payload, concatenated. */
  def frameMessages(msgs: Seq[Array[Byte]]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    msgs.foreach { m =>
      var x = m.length
      while ((x & ~0x7f) != 0) { out.write((x & 0x7f) | 0x80); x >>>= 7 }
      out.write(x)
      val c = crc32c(m)
      out.write(((c >> 24) & 0xff).toInt); out.write(((c >> 16) & 0xff).toInt)
      out.write(((c >> 8) & 0xff).toInt); out.write((c & 0xff).toInt)
      out.write(m)
    }
    out.toByteArray
  }

  /** Unframe a chunked-transport stream, VERIFYING each CRC. */
  def unframeMessages(bytes: Array[Byte]): Seq[Array[Byte]] = {
    var pos = 0
    val out = Seq.newBuilder[Array[Byte]]
    while (pos < bytes.length) {
      var len = 0; var shift = 0; var more = true
      while (more) {
        if (pos >= bytes.length) throw new IllegalArgumentException(
          "chunked frame: truncated length")
        val b = bytes(pos) & 0xff; pos += 1
        len |= (b & 0x7f) << shift; shift += 7
        more = (b & 0x80) != 0
      }
      if (pos + 4 + len > bytes.length) throw new IllegalArgumentException(
        "chunked frame: truncated body")
      val crc = ((bytes(pos) & 0xffL) << 24) | ((bytes(pos + 1) & 0xffL) << 16) |
        ((bytes(pos + 2) & 0xffL) << 8) | (bytes(pos + 3) & 0xffL)
      pos += 4
      val m = java.util.Arrays.copyOfRange(bytes, pos, pos + len)
      pos += len
      if (crc32c(m) != crc) throw new IllegalArgumentException(
        "chunked frame: CRC32C mismatch")
      out += m
    }
    out.result()
  }

  def decodeReadResponse(bytes: Array[Byte]): Seq[Seq[Series]] = {
    val r = new Reader(bytes, 0, bytes.length)
    val out = Seq.newBuilder[Seq[Series]]
    while (r.hasMore) {
      val tag = r.varint(); val f = (tag >>> 3).toInt; val wt = (tag & 7).toInt
      (f, wt) match {
        case (1, 2) =>
          val qr = r.lenDelim()
          val tss = Seq.newBuilder[Series]
          while (qr.hasMore) {
            val t2 = qr.varint(); val f2 = (t2 >>> 3).toInt; val w2 = (t2 & 7).toInt
            (f2, w2) match {
              case (1, 2) => tss += readSeries(qr.lenDelim())
              case _ => qr.skip(w2)
            }
          }
          out += tss.result()
        case _ => r.skip(wt)
      }
    }
    out.result()
  }
}

/** array<struct<labels,samples>> (the [[ProtoWire.writeRequestType]]
  * shape) → real `prometheus.WriteRequest` protobuf bytes. */
case class PbWriteRequestEncode(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (DataType.equalsStructurally(child.dataType, ProtoWire.writeRequestType,
      ignoreNullability = true)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"expects ${ProtoWire.writeRequestType.catalogString}, got ${child.dataType.catalogString}")
  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val series = (0 until arr.numElements()).map { i =>
      val row = arr.getStruct(i, 2)
      val ls = row.getArray(0)
      val labels = (0 until ls.numElements()).map { j =>
        val l = ls.getStruct(j, 2)
        ProtoWire.Label(l.getUTF8String(0).toString, l.getUTF8String(1).toString)
      }
      val ss = row.getArray(1)
      val samples = (0 until ss.numElements()).map { j =>
        val s = ss.getStruct(j, 2)
        ProtoWire.Sample(s.getDouble(0), s.getLong(1))
      }
      ProtoWire.Series(labels, samples)
    }
    ProtoWire.encode(series)
  }
  override protected def withNewChildInternal(c: Expression): PbWriteRequestEncode = copy(c)
}

/** struct<symbols, timeseries> (the rw2 shape; field ORDER within each
  * struct is resolved BY NAME at bind time, so both the render path's
  * (timestamp, value) sample spelling and the canonical (value,
  * timestamp) encode identically) → real v2 `Request` protobuf bytes. */
case class PbRequestV2Encode(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true

  private def fieldIdx(st: StructType, name: String): Int = st.fieldIndex(name)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case st: StructType if st.fieldNames.contains("symbols") &&
      st.fieldNames.contains("timeseries") => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"expects struct<symbols, timeseries>, got ${other.catalogString}")
  }

  // ordinals resolved once from the bound child schema
  private lazy val topSt = child.dataType.asInstanceOf[StructType]
  private lazy val symIdx = fieldIdx(topSt, "symbols")
  private lazy val tssIdx = fieldIdx(topSt, "timeseries")
  private lazy val serSt = topSt(tssIdx).dataType.asInstanceOf[ArrayType]
    .elementType.asInstanceOf[StructType]
  private lazy val refsIdx = fieldIdx(serSt, "labelsRefs")
  private lazy val samplesIdx = fieldIdx(serSt, "samples")
  private lazy val exIdx =
    if (serSt.fieldNames.contains("exemplars")) fieldIdx(serSt, "exemplars") else -1
  private lazy val samSt = serSt(samplesIdx).dataType.asInstanceOf[ArrayType]
    .elementType.asInstanceOf[StructType]
  private lazy val samValIdx = fieldIdx(samSt, "value")
  private lazy val samTsIdx = fieldIdx(samSt, "timestamp")
  private lazy val exSt = if (exIdx < 0) null else
    serSt(exIdx).dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]
  private lazy val exRefsIdx = if (exSt == null) -1 else fieldIdx(exSt, "labelsRefs")
  private lazy val exValIdx = if (exSt == null) -1 else fieldIdx(exSt, "value")
  private lazy val exTsIdx = if (exSt == null) -1 else fieldIdx(exSt, "timestamp")
  private lazy val histIdx =
    if (serSt.fieldNames.contains("histograms")) fieldIdx(serSt, "histograms") else -1
  private lazy val histSt = if (histIdx < 0) null else
    serSt(histIdx).dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]
  private lazy val hIdx: Map[String, Int] =
    if (histSt == null) Map.empty
    else Seq("countInt", "sum", "schema", "zeroCountInt", "negativeSpans",
      "negativeDeltas", "positiveSpans", "positiveDeltas", "timestamp")
      .map(n => n -> fieldIdx(histSt, n)).toMap

  override def nullSafeEval(v: Any): Any = {
    val row = v.asInstanceOf[InternalRow]
    val syms = row.getArray(symIdx)
    val symbols = (0 until syms.numElements()).map(i => syms.getUTF8String(i).toString)
    val tss = row.getArray(tssIdx)
    val series = (0 until tss.numElements()).map { i =>
      val sr = tss.getStruct(i, serSt.length)
      val refsArr = sr.getArray(refsIdx)
      val refs = (0 until refsArr.numElements()).map(refsArr.getInt)
      val ss = sr.getArray(samplesIdx)
      val samples = (0 until ss.numElements()).map { j =>
        val s = ss.getStruct(j, samSt.length)
        ProtoWire.Sample(s.getDouble(samValIdx), s.getLong(samTsIdx))
      }
      val exemplars =
        if (exIdx < 0 || sr.isNullAt(exIdx)) Nil
        else {
          val ea = sr.getArray(exIdx)
          (0 until ea.numElements()).map { j =>
            val e = ea.getStruct(j, exSt.length)
            val er = e.getArray(exRefsIdx)
            ProtoWire.ExemplarV2((0 until er.numElements()).map(er.getInt),
              e.getDouble(exValIdx), e.getLong(exTsIdx))
          }.toSeq
        }
      val histograms =
        if (histIdx < 0 || sr.isNullAt(histIdx)) Nil
        else {
          val ha = sr.getArray(histIdx)
          (0 until ha.numElements()).map { j =>
            val h = ha.getStruct(j, histSt.length)
            def spansOf(name: String): Seq[(Int, Int)] = {
              val a = h.getArray(hIdx(name))
              (0 until a.numElements()).map { k =>
                val sp = a.getStruct(k, 2)
                (sp.getInt(0), sp.getInt(1))
              }
            }
            def deltasOf(name: String): Seq[Long] = {
              val a = h.getArray(hIdx(name))
              (0 until a.numElements()).map(a.getLong)
            }
            ProtoWire.HistogramPb(
              h.getLong(hIdx("countInt")), h.getDouble(hIdx("sum")),
              h.getInt(hIdx("schema")), h.getLong(hIdx("zeroCountInt")),
              spansOf("negativeSpans"), deltasOf("negativeDeltas"),
              spansOf("positiveSpans"), deltasOf("positiveDeltas"),
              h.getLong(hIdx("timestamp")))
          }.toSeq
        }
      ProtoWire.SeriesV2(refs, samples, exemplars, histograms)
    }
    ProtoWire.encodeV2(ProtoWire.RequestV2(symbols, series))
  }
  override protected def withNewChildInternal(c: Expression): PbRequestV2Encode = copy(c)
}

/** Real v2 `Request` protobuf bytes → [[ProtoWire.requestV2Type]]. */
case class PbRequestV2Decode(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ProtoWire.requestV2Type
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"expects binary, got ${other.catalogString}")
  }
  override def nullSafeEval(v: Any): Any = {
    val req = ProtoWire.decodeV2(v.asInstanceOf[Array[Byte]])
    def spans(ss: Seq[(Int, Int)]) =
      new GenericArrayData(ss.map(sp => InternalRow(sp._1, sp._2)).toArray[Any])
    InternalRow(
      new GenericArrayData(req.symbols.map(UTF8String.fromString).toArray[Any]),
      new GenericArrayData(req.timeseries.map { ts =>
        InternalRow(
          new GenericArrayData(ts.labelsRefs.toArray[Any]),
          new GenericArrayData(ts.samples.map(s =>
            InternalRow(s.value, s.timestamp)).toArray[Any]),
          new GenericArrayData(ts.exemplars.map(e =>
            InternalRow(new GenericArrayData(e.labelsRefs.toArray[Any]),
              e.value, e.timestamp)).toArray[Any]),
          new GenericArrayData(ts.histograms.map(h =>
            InternalRow(h.countInt, h.sum, h.schema, h.zeroCountInt,
              spans(h.negSpans),
              new GenericArrayData(h.negDeltas.toArray[Any]),
              spans(h.posSpans),
              new GenericArrayData(h.posDeltas.toArray[Any]),
              h.timestamp)).toArray[Any]))
      }.toArray[Any]))
  }
  override protected def withNewChildInternal(c: Expression): PbRequestV2Decode = copy(c)
}

/** Real `prometheus.WriteRequest` protobuf bytes →
  * array<struct<labels,samples>> ([[ProtoWire.writeRequestType]]). */
case class PbWriteRequestDecode(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ProtoWire.writeRequestType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"expects binary, got ${other.catalogString}")
  }
  override def nullSafeEval(v: Any): Any = {
    val series = ProtoWire.decode(v.asInstanceOf[Array[Byte]])
    new GenericArrayData(series.map { ts =>
      InternalRow(
        new GenericArrayData(ts.labels.map(l => InternalRow(
          UTF8String.fromString(l.name), UTF8String.fromString(l.value))).toArray[Any]),
        new GenericArrayData(ts.samples.map(s => InternalRow(
          s.value, s.timestamp)).toArray[Any]))
    }.toArray[Any])
  }
  override protected def withNewChildInternal(c: Expression): PbWriteRequestDecode = copy(c)
}
