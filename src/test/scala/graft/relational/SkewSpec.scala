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

  test("sliced rolling window ≡ direct monster-series window; slices bound task input") {
    import org.apache.spark.sql.expressions.Window
    val ev = graft.Tables.events(spark, graft.TestSpark.SF)
    val w = 8
    val sliced = Skew.slicedRollingWindows(ev, Seq("event_type"), "ts",
        "event_id", "value", w, date_trunc("week", $"ts"), "7 DAYS")
      .select($"event_type", $"event_id", $"win_arr")
    val direct = ev.withColumn("win_arr", collect_list($"value").over(
        Window.partitionBy($"event_type").orderBy($"ts", $"event_id")
          .rowsBetween(-(w - 1), Window.currentRow)))
      .filter(size($"win_arr") === w)
      .select($"event_type", $"event_id", $"win_arr")
    assert(sliced.exceptAll(direct).isEmpty && direct.exceptAll(sliced).isEmpty)
    // the salt stage bounds per-task rows: window shuffles key on
    // (event_type, week), so the largest task input is a week's share of a
    // series, not the whole series
    val serMax = ev.groupBy($"event_type").count()
      .agg(max("count")).head.getLong(0)
    val sliceMax = ev.groupBy($"event_type", date_trunc("week", $"ts")).count()
      .agg(max("count")).head.getLong(0)
    assert(sliceMax * 3 < serMax, s"slicing didn't bound input: $sliceMax vs $serMax")
    // every window exchange in the plan carries the slice key
    val planStr = sliced.queryExecution.executedPlan.toString
    val parts = "hashpartitioning\\(([^)]*)\\)".r
      .findAllMatchIn(planStr).map(_.group(1)).toSeq
    assert(parts.nonEmpty && parts.forall(_.contains("__slice")),
      parts.mkString("; "))
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
