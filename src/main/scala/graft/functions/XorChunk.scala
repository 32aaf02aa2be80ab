package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.{ColumnBridge => ExpressionUtils}
import org.apache.spark.sql.types._

/** Gorilla / Prometheus XOR chunk CODEC — actual bytes, not just the
  * [[graft.metrics.Gorilla]] bit-cost model (tsdb/chunkenc/xor.go;
  * Pelkonen et al., "Gorilla", VLDB 2015). Two halves of one proof:
  * the cost model predicts chunk sizes in pure column math (and its
  * DuckDB oracle twin re-walks them independently), while this codec
  * PRODUCES the byte stream — and the encoded `length(bytes)` must
  * equal the model's `(16 + ts_bits + val_bits + 7) div 8` on every
  * chunk, while `decode(encode(x)) == x` closes the loop on content.
  *
  * Bit format (xor.go-faithful; one documented divergence):
  *  - 2-byte big-endian sample count (xor.go's chunk header);
  *  - t₀ and Δ₁ as ZIGZAG uvarints — upstream writes t₀ signed-varint
  *    and Δ₁ plain-uvarint; the zigzag-both spelling costs the same
  *    bytes on epoch-ms data and keeps the codec byte-count identical
  *    to the committed q201 cost model (`uvarintBits(x * 2)`);
  *  - v₀ as 64 raw IEEE-754 bits;
  *  - i ≥ 2 timestamps as delta-of-delta bucket codes `0`, `10`+14,
  *    `110`+17, `1110`+20, `1111`+64 (xor.go's exact ranges, signed
  *    two's-complement payloads, 8192-style asymmetric bounds);
  *  - values as XOR vs the previous sample: `0` when identical, `10` +
  *    meaningful bits reusing the previous leading/trailing window,
  *    else `11` + 5-bit leading count (clamped 31) + 6-bit significant
  *    count (64 encodes as 0, decode maps 0 → 64) + the bits.
  *
  * Execution shape: the codec runs at CHUNK grain (≤ 120 samples per
  * call, after a keyed collect_list) — never per-sample in a scan — so
  * eval-mode with CodegenFallback costs one virtual call per chunk,
  * not per sample; the per-sample hot path (IEEE reinterpret) stays in
  * the [[DoubleBits]] codegen expression feeding it.
  */
object XorChunk {

  private[graft] val sampleType: StructType =
    StructType(Seq(StructField("t", LongType), StructField("b", LongType)))

  private def zigzag(x: Long): Long = (x << 1) ^ (x >> 63)
  private def unzigzag(x: Long): Long = (x >>> 1) ^ -(x & 1L)

  /** MSB-first bit sink; whole-byte writes stay byte-aligned because the
    * only varints (t₀, Δ₁) precede the first bit-level value write. */
  private final class BitWriter {
    private var buf = new Array[Byte](64)
    private var bitLen = 0
    private def ensure(nBits: Int): Unit = {
      val need = (bitLen + nBits + 7) >> 3
      if (need > buf.length) {
        var cap = buf.length * 2
        while (cap < need) cap *= 2
        buf = java.util.Arrays.copyOf(buf, cap)
      }
    }
    def writeBit(b: Int): Unit = {
      ensure(1)
      if (b != 0) buf((bitLen >> 3)) = (buf(bitLen >> 3) | (0x80 >>> (bitLen & 7))).toByte
      bitLen += 1
    }
    def writeBits(v: Long, n: Int): Unit = {
      ensure(n)
      var i = n - 1
      while (i >= 0) { writeBitFast(((v >>> i) & 1L).toInt); i -= 1 }
    }
    private def writeBitFast(b: Int): Unit = {
      if (b != 0) buf(bitLen >> 3) = (buf(bitLen >> 3) | (0x80 >>> (bitLen & 7))).toByte
      bitLen += 1
    }
    def writeUvarint(v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7fL) != 0L) { writeBits((v & 0x7fL) | 0x80L, 8); v >>>= 7 }
      writeBits(v, 8)
    }
    def toBytes: Array[Byte] = java.util.Arrays.copyOf(buf, (bitLen + 7) >> 3)
  }

  private final class BitReader(bytes: Array[Byte]) {
    private var pos = 0
    def readBit(): Int = {
      val b = (bytes(pos >> 3) >>> (7 - (pos & 7))) & 1
      pos += 1
      b
    }
    def readBits(n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n) { v = (v << 1) | readBit().toLong; i += 1 }
      v
    }
    def readUvarint(): Long = {
      var v = 0L
      var shift = 0
      var more = true
      while (more) {
        val b = readBits(8)
        v |= (b & 0x7fL) << shift
        shift += 7
        more = (b & 0x80L) != 0L
      }
      v
    }
  }

  /** (t, IEEE bits) samples → XOR chunk bytes. Caller supplies the array
    * already sorted by timestamp (the keyed collect sorts it). */
  private[graft] def encode(samples: Array[(Long, Long)]): Array[Byte] = {
    val n = samples.length
    require(n <= 0xffff, s"XOR chunk holds at most 65535 samples, got $n")
    val w = new BitWriter
    w.writeBits(n.toLong, 16)
    if (n == 0) return w.toBytes
    val (t0, b0) = samples(0)
    w.writeUvarint(zigzag(t0))
    w.writeBits(b0, 64)
    var prevT = t0
    var prevDelta = 0L
    var prevB = b0
    var lead = 255
    var trail = 0
    var i = 1
    while (i < n) {
      val (t, b) = samples(i)
      if (i == 1) {
        prevDelta = t - prevT
        w.writeUvarint(zigzag(prevDelta))
      } else {
        val delta = t - prevT
        val dod = delta - prevDelta
        prevDelta = delta
        if (dod == 0L) w.writeBit(0)
        else if (dod >= -8191L && dod <= 8192L) { w.writeBits(2L, 2); w.writeBits(dod & 0x3fffL, 14) }
        else if (dod >= -65535L && dod <= 65536L) { w.writeBits(6L, 3); w.writeBits(dod & 0x1ffffL, 17) }
        else if (dod >= -524287L && dod <= 524288L) { w.writeBits(14L, 4); w.writeBits(dod & 0xfffffL, 20) }
        else { w.writeBits(15L, 4); w.writeBits(dod, 64) }
      }
      prevT = t
      val xr = prevB ^ b
      if (xr == 0L) w.writeBit(0)
      else {
        val lz = math.min(java.lang.Long.numberOfLeadingZeros(xr), 31)
        val tz = java.lang.Long.numberOfTrailingZeros(xr)
        if (lead != 255 && lz >= lead && tz >= trail) {
          val sig = 64 - lead - trail
          w.writeBits(2L, 2)
          w.writeBits(xr >>> trail, sig)
        } else {
          val sig = 64 - lz - tz
          w.writeBits(3L, 2)
          w.writeBits(lz.toLong, 5)
          w.writeBits(sig.toLong & 0x3fL, 6) // 64 wraps to 0; decode maps back
          w.writeBits(xr >>> tz, sig)
          lead = lz
          trail = tz
        }
      }
      prevB = b
      i += 1
    }
    w.toBytes
  }

  private[graft] def decode(bytes: Array[Byte]): Array[(Long, Long)] = {
    val r = new BitReader(bytes)
    val n = r.readBits(16).toInt
    val out = new Array[(Long, Long)](n)
    if (n == 0) return out
    val t0 = unzigzag(r.readUvarint())
    val b0 = r.readBits(64)
    out(0) = (t0, b0)
    var prevT = t0
    var prevDelta = 0L
    var prevB = b0
    var lead = 0
    var trail = 0
    var i = 1
    while (i < n) {
      if (i == 1) prevDelta = unzigzag(r.readUvarint())
      else {
        val dod =
          if (r.readBit() == 0) 0L
          else if (r.readBit() == 0) signExtend(r.readBits(14), 14)
          else if (r.readBit() == 0) signExtend(r.readBits(17), 17)
          else if (r.readBit() == 0) signExtend(r.readBits(20), 20)
          else r.readBits(64)
        prevDelta += dod
      }
      prevT += prevDelta
      val b =
        if (r.readBit() == 0) prevB
        else if (r.readBit() == 0) prevB ^ (r.readBits(64 - lead - trail) << trail)
        else {
          lead = r.readBits(5).toInt
          val sigRaw = r.readBits(6).toInt
          val sig = if (sigRaw == 0) 64 else sigRaw
          trail = 64 - lead - sig
          prevB ^ (r.readBits(sig) << trail)
        }
      out(i) = (prevT, b)
      prevB = b
      i += 1
    }
    out
  }

  /** xor.go's asymmetric bucket decode: payload > 2^(n-1) is negative
    * (so e.g. 8192 survives as +8192 in the 14-bit bucket). */
  private def signExtend(v: Long, n: Int): Long =
    if (v > (1L << (n - 1))) v - (1L << n) else v

  def encodeCol(samples: Column): Column =
    ExpressionUtils.column(XorChunkEncode(ExpressionUtils.expression(samples)))
  def decodeCol(bytes: Column): Column =
    ExpressionUtils.column(XorChunkDecode(ExpressionUtils.expression(bytes)))
}

/** array<struct<t: long, b: long>> (sorted by t) → XOR chunk bytes. */
case class XorChunkEncode(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(fs), _)
      if fs.length == 2 && fs.forall(_.dataType == LongType) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"expects array<struct<t: bigint, b: bigint>>, got ${other.catalogString}")
  }
  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val samples = new Array[(Long, Long)](n)
    var i = 0
    while (i < n) {
      val row = arr.getStruct(i, 2)
      samples(i) = (row.getLong(0), row.getLong(1))
      i += 1
    }
    XorChunk.encode(samples)
  }
  override protected def withNewChildInternal(c: Expression): XorChunkEncode = copy(c)
}

/** XOR chunk bytes → array<struct<t: long, b: long>>. */
case class XorChunkDecode(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(XorChunk.sampleType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"expects binary, got ${other.catalogString}")
  }
  override def nullSafeEval(v: Any): Any = {
    val decoded = XorChunk.decode(v.asInstanceOf[Array[Byte]])
    new GenericArrayData(decoded.map { case (t, b) =>
      InternalRow(t, b)
    }.asInstanceOf[Array[Any]])
  }
  override protected def withNewChildInternal(c: Expression): XorChunkDecode = copy(c)
}

/** IEEE-754 bits (BIGINT) → double — [[DoubleBits]]' inverse, needed to
  * fold DECODED chunk values back into value space. */
case class DoubleFromBits(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"expects bigint, got ${other.catalogString}")
  }
  override def nullSafeEval(v: Any): Any =
    java.lang.Double.longBitsToDouble(v.asInstanceOf[Long])
  override protected def doGenCode(ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
                                   ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    defineCodeGen(ctx, ev, c => s"java.lang.Double.longBitsToDouble($c)")
  override protected def withNewChildInternal(c: Expression): DoubleFromBits = copy(c)
}

object DoubleFromBits {
  def apply(c: Column): Column =
    ExpressionUtils.column(DoubleFromBits(ExpressionUtils.expression(c)))
}
