package graft

import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Native vector expressions (E54): codegen result ≡ builtin higher-order
  * composition, SQL registration, null handling. */
class VectorFunctionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def emb = Tables.embeddings(spark, TestSpark.SF).limit(50)

  test("vecDot/vecCosine match zip_with+aggregate composition") {
    val dbl = emb.withColumn("a", transform(col("embedding"), _.cast("double")))
      .withColumn("b", reverse(col("a")))
    val r = dbl.select(
      VectorFunctions.vecDot(col("a"), col("b")).as("dot_native"),
      aggregate(zip_with(col("a"), col("b"), _ * _), lit(0.0), _ + _).as("dot_builtin"),
      VectorFunctions.vecCosine(col("a"), col("b")).as("cos_native"),
      (aggregate(zip_with(col("a"), col("b"), _ * _), lit(0.0), _ + _) /
        (sqrt(aggregate(zip_with(col("a"), col("a"), _ * _), lit(0.0), _ + _)) *
          sqrt(aggregate(zip_with(col("b"), col("b"), _ * _), lit(0.0), _ + _)))).as("cos_builtin"))
      .collect()
    r.foreach { row =>
      assert(math.abs(row.getDouble(0) - row.getDouble(1)) < 1e-9, "dot mismatch")
      assert(math.abs(row.getDouble(2) - row.getDouble(3)) < 1e-9, "cosine mismatch")
    }
  }

  test("float arrays accumulate in double") {
    val r = emb.select(VectorFunctions.vecNorm(col("embedding")).as("n")).collect()
    assert(r.forall(row => row.getDouble(0) > 0.0 && !row.getDouble(0).isNaN))
  }

  test("vecDotUnits: exact 9-dp units, signed HALF_UP, matches BigDecimal") {
    val rows = emb.limit(20)
      .select(col("embedding"),
        VectorFunctions.vecDotUnits(col("embedding"), col("embedding")).as("du"))
      .collect()
    rows.foreach { r =>
      val v = r.getSeq[Float](0)
      val expect = v.map { x =>
        new java.math.BigDecimal(x.toDouble * x.toDouble)
          .setScale(9, java.math.RoundingMode.HALF_UP)
          .movePointRight(9).longValueExact()
      }.sum
      assert(r.getLong(1) == expect)
    }
    // signed terms: antiparallel vectors give a negative exact dot
    import spark.implicits._
    val d = Seq((Seq(0.5f, -0.25f), Seq(0.5f, 0.5f))).toDF("a", "b")
      .select(VectorFunctions.vecDotUnits(col("a"), col("b"))).as[Long].head()
    assert(d == 250000000L - 125000000L)
  }

  test("floorMode units: floor(term*1e9), codegen == eval == Math.floor") {
    // q52/q72 hash-green discipline: the unit conversion must be EXACTLY
    // floor((x*y) * 1e9) of the IEEE product — the engine-version-proof
    // formulation (no round() half-up boundary).
    val rows = emb.limit(20)
      .select(col("embedding"),
        VectorFunctions.vecDotFloor(col("embedding"), col("embedding")).as("du"),
        VectorFunctions.vecD2Floor(col("embedding"),
          transform(reverse(col("embedding")), _.cast("double"))).as("d2u"))
      .collect()
    rows.foreach { r =>
      val v = r.getSeq[Float](0).map(_.toDouble)
      val expectDot = v.map(x => math.floor(x * x * 1e9).toLong).sum
      val rev = v.reverse
      val expectD2 = v.zip(rev)
        .map { case (x, c) => math.floor((x - c) * (x - c) * 1e9).toLong }.sum
      assert(r.getLong(1) == expectDot, "vecDotFloor mismatch")
      assert(r.getLong(2) == expectD2, "vecD2Floor mismatch")
    }
    // negative terms floor DOWN (toward -inf), not toward zero:
    // floor(-0.1249999995 * 1e9 units) — a term of -0.5*0.25 = -0.125
    import spark.implicits._
    val d = Seq((Seq(0.5f, -0.25f), Seq(0.5f, 0.5f))).toDF("a", "b")
      .select(VectorFunctions.vecDotFloor(col("a"), col("b"))).as[Long].head()
    assert(d == 250000000L + math.floor(-0.25 * 0.5 * 1e9).toLong)
  }

  test("SQL registration: vec_cosine usable from spark.sql") {
    VectorFunctions.register(spark)
    Tables.embeddings(spark, TestSpark.SF).createOrReplaceTempView("emb_t")
    val r = spark.sql(
      "SELECT vec_cosine(embedding, embedding) c, vec_dot(embedding, embedding) d, vec_norm(embedding) n FROM emb_t LIMIT 5").collect()
    r.foreach { row =>
      assert(math.abs(row.getDouble(0) - 1.0) < 1e-9) // self-cosine = 1
      assert(math.abs(row.getDouble(1) - row.getDouble(2) * row.getDouble(2)) < 1e-6)
    }
  }

  test("GraftExtensions installs the native functions into a session") {
    val exts = new org.apache.spark.sql.SparkSessionExtensions
    new graft.GraftExtensions().apply(exts)
    val reg = new org.apache.spark.sql.catalyst.analysis.SimpleFunctionRegistry
    org.apache.spark.sql.graft.ColumnBridge.registerInto(exts, reg)
    assert(Seq("vec_dot", "vec_cosine", "vec_norm").forall(n =>
      reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(n))))
  }

  test("null input propagates null") {
    val r = emb.select(VectorFunctions.vecCosine(lit(null).cast("array<float>"), col("embedding")).as("c"))
      .collect()
    assert(r.forall(_.isNullAt(0)))
  }
}
