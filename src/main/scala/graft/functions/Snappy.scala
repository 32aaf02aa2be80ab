package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.{ColumnBridge => ExpressionUtils}
import org.apache.spark.sql.types._

/** Snappy BLOCK format codec (google/snappy `format_description.txt`) in
  * pure JVM — the compression layer of the Prometheus remote-write wire
  * (`Content-Encoding: snappy`, block format, not the framing format).
  * With [[ProtoWire]] this completes the real wire:
  * `snappy(protobuf(WriteRequest))`.
  *
  * Format: uvarint uncompressed length, then tagged elements —
  * tag byte b, type = b & 3:
  *   0 = LITERAL: len = (b>>2)+1; 60..63 mean 1..4 extra LE length bytes
  *   1 = COPY-1:  len = 4 + ((b>>2) & 7), offset = ((b & 0xE0) << 3) | next
  *   2 = COPY-2:  len = (b>>2) + 1, offset = 2-byte LE
  *   3 = COPY-4:  len = (b>>2) + 1, offset = 4-byte LE
  *
  * The DECOMPRESSOR handles every element type (foreign bytes from any
  * real snappy encoder decode here). The COMPRESSOR is a greedy
  * hash-of-4-byte-grams matcher emitting copy-1/copy-2 elements — real
  * compression, deterministic, and every output it produces is valid
  * snappy by construction (round-trip property-tested; golden bytes pin
  * the decompressor to the public spec independently).
  *
  * Execution posture: message grain (one call per request document),
  * like [[ProtoWire]]/[[XorChunk]].
  */
object Snappy {

  def compress(in: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(in.length / 2 + 16)
    // preamble: uncompressed length as uvarint
    var v = in.length
    while ((v & ~0x7f) != 0) { out.write((v & 0x7f) | 0x80); v >>>= 7 }
    out.write(v)
    def emitLiteral(from: Int, until: Int): Unit = {
      var p = from
      while (p < until) {
        val n = math.min(until - p, 65536) // one extra-length byte pair max
        if (n <= 60) out.write((n - 1) << 2)
        else if (n <= 256) { out.write(60 << 2); out.write(n - 1) }
        else { out.write(61 << 2); out.write((n - 1) & 0xff); out.write(((n - 1) >> 8) & 0xff) }
        out.write(in, p, n)
        p += n
      }
    }
    def emitCopy(offset: Int, len0: Int): Unit = {
      var len = len0
      // copy-1 fits len 4..11 / offset < 2048; copy-2 fits len 1..64 /
      // offset < 65536. Chunk long matches into <=64-byte copies.
      while (len > 0) {
        val n = math.min(len, 64)
        if (n >= 4 && n <= 11 && offset < 2048) {
          out.write(1 | ((n - 4) << 2) | ((offset >> 8) << 5))
          out.write(offset & 0xff)
        } else {
          out.write(2 | ((n - 1) << 2))
          out.write(offset & 0xff); out.write((offset >> 8) & 0xff)
        }
        len -= n
      }
    }
    val n = in.length
    if (n < 4) { emitLiteral(0, n); return out.toByteArray }
    val shift = 15
    val table = new Array[Int](1 << shift) // 4-gram hash -> last position+1
    def hash(p: Int): Int = {
      val x = ((in(p) & 0xff)) | ((in(p + 1) & 0xff) << 8) |
        ((in(p + 2) & 0xff) << 16) | ((in(p + 3) & 0xff) << 24)
      (x * 0x1e35a7bd) >>> (32 - shift)
    }
    var lit = 0 // start of pending literal run
    var p = 0
    while (p + 4 <= n) {
      val h = hash(p)
      val cand = table(h) - 1
      table(h) = p + 1
      if (cand >= 0 && p - cand < 65536 &&
        in(cand) == in(p) && in(cand + 1) == in(p + 1) &&
        in(cand + 2) == in(p + 2) && in(cand + 3) == in(p + 3)) {
        var len = 4
        while (p + len < n && in(cand + len) == in(p + len)) len += 1
        emitLiteral(lit, p)
        emitCopy(p - cand, len)
        p += len
        lit = p
      } else p += 1
    }
    emitLiteral(lit, n)
    out.toByteArray
  }

  def decompress(in: Array[Byte]): Array[Byte] = {
    var pos = 0
    def fail(msg: String) = throw new IllegalArgumentException(s"snappy: $msg")
    def uvarint(): Int = {
      var v = 0; var shift = 0; var more = true
      while (more) {
        if (pos >= in.length) fail("truncated preamble")
        val b = in(pos) & 0xff; pos += 1
        v |= (b & 0x7f) << shift; shift += 7
        more = (b & 0x80) != 0
      }
      v
    }
    val total = uvarint()
    if (total < 0) fail(s"bad uncompressed length $total")
    val out = new Array[Byte](total)
    var op = 0
    def le(nBytes: Int): Int = {
      if (pos + nBytes > in.length) fail("truncated element header")
      var v = 0; var i = 0
      while (i < nBytes) { v |= (in(pos + i) & 0xff) << (8 * i); i += 1 }
      pos += nBytes
      v
    }
    while (pos < in.length) {
      val tag = in(pos) & 0xff; pos += 1
      (tag & 3) match {
        case 0 =>
          val l6 = tag >> 2
          val len = (if (l6 < 60) l6 else le(l6 - 59)) + 1
          // le(4) can yield a negative Int for a crafted 4-byte escape;
          // a negative len slips past BOTH overrun guards and surfaces as
          // a raw ArrayIndexOutOfBounds from arraycopy instead of the
          // uniform error envelope on the network-exposed decompress path.
          if (len <= 0) fail(s"bad literal length $len")
          if (pos + len > in.length) fail("truncated literal")
          if (op + len > total) fail("literal overruns output")
          System.arraycopy(in, pos, out, op, len)
          pos += len; op += len
        case t =>
          val (len, offset) = t match {
            case 1 => (4 + ((tag >> 2) & 7), ((tag & 0xE0) << 3) | le(1))
            case 2 => ((tag >> 2) + 1, le(2))
            case _ => ((tag >> 2) + 1, le(4))
          }
          if (offset <= 0 || offset > op) fail(s"bad copy offset $offset at $op")
          if (op + len > total) fail("copy overruns output")
          var i = 0 // byte-by-byte: offsets < len mean RLE-style overlap
          while (i < len) { out(op + i) = out(op + i - offset); i += 1 }
          op += len
      }
    }
    if (op != total) fail(s"decoded $op of declared $total bytes")
    out
  }

  def compressCol(c: Column): Column =
    ExpressionUtils.column(SnappyCompress(ExpressionUtils.expression(c)))
  def decompressCol(c: Column): Column =
    ExpressionUtils.column(SnappyDecompress(ExpressionUtils.expression(c)))
}

/** binary → snappy block-format bytes. */
case class SnappyCompress(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"expects binary, got ${other.catalogString}")
  }
  override def nullSafeEval(v: Any): Any =
    Snappy.compress(v.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(c: Expression): SnappyCompress = copy(c)
}

/** snappy block-format bytes → binary (throws on malformed input). */
case class SnappyDecompress(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"expects binary, got ${other.catalogString}")
  }
  override def nullSafeEval(v: Any): Any =
    Snappy.decompress(v.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(c: Expression): SnappyDecompress = copy(c)
}
