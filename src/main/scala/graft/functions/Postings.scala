package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.{ColumnBridge => ExpressionUtils}
import org.apache.spark.sql.types._

/** TSDB index POSTINGS codec — the index half of a block beside the XOR
  * chunk half ([[XorChunk]]): a sorted series-id list stored as
  * uvarint(count) · uvarint(first) · uvarint(delta)… (tsdb/index
  * stores postings as big-endian u32 lists; the delta-uvarint spelling
  * here is the RoaringBitmap/Lucene-family layout the Prometheus index
  * migrates toward for long lists, and what makes the byte count a
  * CLOSED FORM the oracle recomputes: uvarint bytes of x =
  * ⌈len(bin(x))/7⌉). Ids must be strictly increasing (series ids are
  * first-seen-unique) — deltas are therefore ≥ 1 and roundtrip exactly.
  *
  * Same execution posture as the chunk codec: list grain (one eval call
  * per postings list, after the keyed collect), never per-sample. */
object Postings {

  private[graft] def encode(ids: Array[Long]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(ids.length + 8)
    def uv(x0: Long): Unit = {
      var x = x0
      while ((x & ~0x7fL) != 0L) { out.write(((x & 0x7fL) | 0x80L).toInt); x >>>= 7 }
      out.write(x.toInt)
    }
    uv(ids.length.toLong)
    var prev = 0L
    var i = 0
    while (i < ids.length) {
      if (i == 0) uv(ids(0))
      else {
        require(ids(i) > prev, s"postings ids must be strictly increasing")
        uv(ids(i) - prev)
      }
      prev = ids(i)
      i += 1
    }
    out.toByteArray
  }

  private[graft] def decode(bytes: Array[Byte]): Array[Long] = {
    var pos = 0
    def uv(): Long = {
      var v = 0L; var shift = 0; var more = true
      while (more) {
        val b = bytes(pos) & 0xff; pos += 1
        v |= (b & 0x7fL) << shift; shift += 7
        more = (b & 0x80) != 0
      }
      v
    }
    val n = uv().toInt
    val out = new Array[Long](n)
    var prev = 0L
    var i = 0
    while (i < n) {
      prev = if (i == 0) uv() else prev + uv()
      out(i) = prev
      i += 1
    }
    out
  }

  def encodeCol(ids: Column): Column =
    ExpressionUtils.column(PostingsEncode(ExpressionUtils.expression(ids)))
  def decodeCol(bytes: Column): Column =
    ExpressionUtils.column(PostingsDecode(ExpressionUtils.expression(bytes)))
}

/** array<bigint> (strictly increasing) → delta-uvarint postings bytes. */
case class PostingsEncode(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"expects array<bigint>, got ${other.catalogString}")
  }
  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    Postings.encode(arr.toLongArray())
  }
  override protected def withNewChildInternal(c: Expression): PostingsEncode = copy(c)
}

/** delta-uvarint postings bytes → array<bigint>. */
case class PostingsDecode(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"expects binary, got ${other.catalogString}")
  }
  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(Postings.decode(v.asInstanceOf[Array[Byte]]))
  override protected def withNewChildInternal(c: Expression): PostingsDecode = copy(c)
}
