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
    def utf8(): String = {
      val n = varint().toInt
      if (n < 0 || pos + n > end) throw new IllegalArgumentException(
        s"protobuf: bad length $n")
      val s = new String(bytes, pos, n, "UTF-8"); pos += n; s
    }
    /** Skip one field of any wire type (forward compatibility). */
    def skip(wt: Int): Unit = wt match {
      case 0 => varint(): Unit
      case 1 => pos += 8
      case 2 => val n = varint().toInt; pos += n
      case 5 => pos += 4
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
