package graft.relational

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Skew salting and bucketed co-location (SCALE.md escape hatches). */
class SkewSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  test("salted join is row-identical to the direct join") {
    val fact = graft.Tables.lineitem(spark, graft.TestSpark.SF)
      .select($"l_orderkey", $"l_linenumber", $"l_quantity")
    val dim = graft.Tables.orders(spark, graft.TestSpark.SF)
      .select($"o_orderkey".as("l_orderkey"), $"o_orderpriority")
    val direct = fact.join(dim, Seq("l_orderkey"))
      .groupBy($"o_orderpriority").agg(count(lit(1)).as("n"),
        sum($"l_quantity".cast("decimal(18,2)")).as("s"))
    val salted = Skew.saltedJoin(fact, dim, "l_orderkey",
        concat($"l_orderkey", lit("_"), $"l_linenumber"), 8)
      .groupBy($"o_orderpriority").agg(count(lit(1)).as("n"),
        sum($"l_quantity".cast("decimal(18,2)")).as("s"))
    assert(direct.exceptAll(salted).isEmpty && salted.exceptAll(direct).isEmpty)
  }

  test("bucketed tables join without an exchange on the bucket key") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    // clear any orphaned managed-table locations from crashed runs
    Seq("b_orders", "b_lineitem").foreach { t =>
      val p = java.nio.file.Paths.get(spark.conf.get("spark.sql.warehouse.dir")
        .stripPrefix("file:"), t)
      if (java.nio.file.Files.exists(p))
        org.apache.commons.io.FileUtils.deleteDirectory(p.toFile)
    }
    Skew.writeBucketed(graft.Tables.orders(spark, graft.TestSpark.SF)
      .select($"o_orderkey", $"o_orderpriority"), "b_orders", "o_orderkey", 8)
    Skew.writeBucketed(graft.Tables.lineitem(spark, graft.TestSpark.SF)
      .select($"l_orderkey", $"l_quantity"), "b_lineitem", "l_orderkey", 8)
    val joined = spark.table("b_lineitem").join(spark.table("b_orders"),
      $"l_orderkey" === $"o_orderkey")
    val planStr = joined.queryExecution.executedPlan.toString
    // the join itself must not reshuffle either bucketed side
    assert(!planStr.contains("Exchange hashpartitioning"), planStr.take(600))
    assert(joined.count() == 6000)
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
  }
}
