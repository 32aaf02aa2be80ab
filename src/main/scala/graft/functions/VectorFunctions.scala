package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.{ColumnBridge => ExpressionUtils}
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, SparkSession}

/** Native Catalyst expressions for embedding math (SURVEY §2 E54 [N]).
  *
  * A Scala UDF on `Array[Float]` deserializes the whole array per call and
  * breaks whole-stage codegen; `zip_with`+`aggregate` stays in codegen but
  * materializes an intermediate array per row. These expressions instead
  * loop directly over the columnar `ArrayData` in generated code — one pass,
  * no allocation — which is the difference between an ANN scan being
  * memory-bandwidth-bound vs allocation-bound on a 100 TB corpus.
  *
  * Accumulation is in double regardless of element type (float embeddings
  * are upcast per element), matching DuckDB's
  * `list_cosine_similarity(list_transform(v, x -> x::DOUBLE), …)` so the
  * oracle can hash-compare results.
  */
abstract class VectorBinaryExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  protected def elemType: DataType = left.dataType match {
    case ArrayType(et, _) => et
    case _ => DoubleType
  }

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(a, _), ArrayType(b, _))
      if (a == FloatType || a == DoubleType) && a == b => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"expects two arrays of float or double of the same element type, " +
        s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  @inline protected final def elem(a: ArrayData, i: Int): Double = elemType match {
    case FloatType => a.getFloat(i).toDouble
    case _ => a.getDouble(i)
  }

  protected final def getter: String = elemType match {
    case FloatType => "getFloat"
    case _ => "getDouble"
  }
}

/** dot(a, b) = Σ a_i * b_i over min(len) elements. */
case class VecDot(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0; var i = 0
    while (i < n) { s += elem(a, i) * elem(b, i); i += 1 }
    s
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n"); val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (double) $a.$getter($i) * (double) $b.$getter($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDot = copy(l, r)
}

/** cosine(a, b) = dot / (|a| * |b|), single fused pass over both arrays. */
case class VecCosine(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val x = elem(a, i); val y = elem(b, i)
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = (double) $a.$getter($i);
         |  double $y = (double) $b.$getter($i);
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecCosine = copy(l, r)
}

/** |a| = sqrt(Σ a_i²). */
case class VecNorm(child: Expression) extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  private def getter: String = child.dataType match {
    case ArrayType(FloatType, _) => "getFloat"
    case _ => "getDouble"
  }
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"expects an array of float or double, got ${child.dataType.catalogString}")
  }
  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    var s = 0.0; var i = 0
    val isF = child.dataType == ArrayType(FloatType) ||
      child.dataType.asInstanceOf[ArrayType].elementType == FloatType
    while (i < a.numElements()) {
      val x = if (isF) a.getFloat(i).toDouble else a.getDouble(i)
      s += x * x; i += 1
    }
    math.sqrt(s)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i"); val s = ctx.freshName("s"); val x = ctx.freshName("x")
      s"""
         |double $s = 0.0;
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  double $x = (double) $a.$getter($i);
         |  $s += $x * $x;
         |}
         |${ev.value} = java.lang.Math.sqrt($s);
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): VecNorm = copy(c)
}

/** Σ round((xᵢ − cᵢ)², 9 dp) in 1e-9 UNITS (BIGINT) — the k-means
  * assignment distance with the repo's exact-decimal argmin discipline
  * fused into ONE pass over the arrays: integer unit accumulation is
  * association-free, so the result equals the posexplode + per-dim
  * DECIMAL(28,9) sum bit for bit (the q240 oracle's formulation) while
  * scanning 64× fewer rows. Per-term rounding uses BigDecimal HALF_UP on
  * the exact binary double — the same rule as Spark's `round` and
  * DuckDB's `round` on non-negative values; `Math.round(v * 1e9)` would
  * NOT be (the multiply re-rounds before the half-up decision).
  * Left side may be float (embeddings) or double; right is the
  * double-valued centroid. */
case class VecD2Units(left: Expression, right: Expression,
                      floorMode: Boolean = false) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  private def leftIsFloat: Boolean = left.dataType == ArrayType(FloatType) ||
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  private def unitsFn: String = if (floorMode) "floorUnits" else "units"
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(a, _), ArrayType(DoubleType, _))
      if a == FloatType || a == DoubleType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"expects (array<float|double>, array<double>), got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val n = VecD2Units.checkDims(a.numElements(), b.numElements())
    var s = 0L; var i = 0
    val isF = leftIsFloat
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) VecD2Units.nullElement(i)
      val x = if (isF) a.getFloat(i).toDouble else a.getDouble(i)
      val d = x - b.getDouble(i)
      s += (if (floorMode) VecD2Units.floorUnits(d * d) else VecD2Units.units(d * d))
      i += 1
    }
    s
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getter = if (leftIsFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val s = ctx.freshName("s"); val d = ctx.freshName("d")
      s"""
         |int $n = graft.functions.VecD2Units.checkDims($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) graft.functions.VecD2Units.nullElement($i);
         |  double $d = (double) $a.$getter($i) - $b.getDouble($i);
         |  $s += graft.functions.VecD2Units.$unitsFn($d * $d);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecD2Units = copy(l, r)
}

/** Exact-decimal DOT PRODUCT in integer 1e-9 units: Σ round(a_i·b_i, 9).
  * The q52 LSH sign bits and the q157 SemDeDup τ-gate both hinge on
  * FP-boundary decisions (sign of a dot, cos > τ); accumulating per-term
  * 9-dp-rounded products in integer units makes those decisions exact
  * and association-free — bit-equal to the oracle's unnest + DECIMAL(28,9)
  * per-dim sum, in one fused pass (the VecD2Units discipline; HALF_UP
  * equals DuckDB's round-half-away-from-zero for negative terms too).
  * Either side may be float or double. */
case class VecDotUnits(left: Expression, right: Expression,
                       floorMode: Boolean = false) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  private def unitsFn: String = if (floorMode) "floorUnits" else "signedUnits"
  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(a, _), ArrayType(b, _))
      if (a == FloatType || a == DoubleType) &&
        (b == FloatType || b == DoubleType) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"expects (array<float|double>, array<float|double>), got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val n = VecD2Units.checkDims(a.numElements(), b.numElements())
    val lf = isFloat(left); val rf = isFloat(right)
    var s = 0L; var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) VecD2Units.nullElement(i)
      val x = if (lf) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (rf) b.getFloat(i).toDouble else b.getDouble(i)
      s += (if (floorMode) VecD2Units.floorUnits(x * y) else VecD2Units.signedUnits(x * y))
      i += 1
    }
    s
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lg = if (isFloat(left)) "getFloat" else "getDouble"
    val rg = if (isFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = graft.functions.VecD2Units.checkDims($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) graft.functions.VecD2Units.nullElement($i);
         |  $s += graft.functions.VecD2Units.$unitsFn(
         |    (double) $a.$lg($i) * (double) $b.$rg($i));
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDotUnits = copy(l, r)
}

object VecD2Units {
  /** Dimension guard shared by eval and codegen: a vector/centroid
    * length mismatch is a data bug, not a shorter distance. */
  def checkDims(a: Int, b: Int): Int = {
    if (a != b) throw new IllegalArgumentException(
      s"VecD2Units: dimension mismatch ($a vs $b)")
    a
  }

  /** Null-element guard: a null component would read as 0 via
    * getFloat/getDouble and silently shrink the distance. */
  def nullElement(i: Int): Nothing = throw new IllegalArgumentException(
    s"VecD2Units: null element at index $i (vectors must be dense)")

  /** round(v, 9 dp) of a non-negative double, in integer 1e-9 units —
    * BigDecimal HALF_UP on the exact binary value, i.e. exactly what
    * Spark's round(col, 9).cast(decimal) computes. */
  def units(v: Double): Long =
    new java.math.BigDecimal(v)
      .setScale(9, java.math.RoundingMode.HALF_UP)
      .movePointRight(9).longValueExact()

  /** Same 9-dp HALF_UP unit conversion for SIGNED terms (dot products):
    * BigDecimal HALF_UP rounds ties AWAY from zero for negatives too,
    * which is exactly DuckDB's round() rule. */
  def signedUnits(v: Double): Long = units(v)

  /** floor(v·1e9) in integer 1e-9 units — the ROUND-FREE conversion used
    * by the q52/q72 hash-green paths. `v * 1e9` is one IEEE multiply and
    * floor is exact, so ANY engine (any DuckDB version, any JVM) computes
    * the identical long from the identical double: unlike round(v, 9),
    * there is no decimal-boundary tie for two round() implementations to
    * disagree on. The oracle twin is `CAST(floor(x * 1e9) AS BIGINT)`. */
  def floorUnits(v: Double): Long = Math.floor(v * 1e9).toLong
}

/** IEEE-754 raw bit pattern of a double as BIGINT — the Gorilla /
  * Prometheus XOR chunk codec (tsdb/chunkenc/xor.go) operates on these
  * bits, and Spark has no reinterpret cast. Codegen is a single
  * intrinsic call; a Scala UDF here would box every sample in the
  * encode hot path. */
case class DoubleBits(child: Expression) extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"expects double, got ${other.catalogString}")
  }
  override def nullSafeEval(v: Any): Any =
    java.lang.Double.doubleToRawLongBits(v.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"java.lang.Double.doubleToRawLongBits($c)")
  override protected def withNewChildInternal(c: Expression): DoubleBits = copy(c)
}

object VectorFunctions {
  /** Column-API entry points. */
  def doubleBits(a: Column): Column =
    ExpressionUtils.column(DoubleBits(ExpressionUtils.expression(a)))
  def vecDot(a: Column, b: Column): Column =
    ExpressionUtils.column(VecDot(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
  def vecCosine(a: Column, b: Column): Column =
    ExpressionUtils.column(VecCosine(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
  def vecNorm(a: Column): Column =
    ExpressionUtils.column(VecNorm(ExpressionUtils.expression(a)))
  def vecD2Units(a: Column, b: Column): Column =
    ExpressionUtils.column(VecD2Units(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
  def vecDotUnits(a: Column, b: Column): Column =
    ExpressionUtils.column(VecDotUnits(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
  def vecD2Floor(a: Column, b: Column): Column =
    ExpressionUtils.column(VecD2Units(ExpressionUtils.expression(a), ExpressionUtils.expression(b), floorMode = true))
  def vecDotFloor(a: Column, b: Column): Column =
    ExpressionUtils.column(VecDotUnits(ExpressionUtils.expression(a), ExpressionUtils.expression(b), floorMode = true))

  /** SQL registration: `SELECT vec_cosine(a, b)` etc. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("vec_dot", es => VecDot(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("vec_cosine", es => VecCosine(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("vec_norm", es => VecNorm(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("double_bits", es => DoubleBits(es.head), "scala_udf")
  }
}
