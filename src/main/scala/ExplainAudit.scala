import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Plan-property audit (SCALE.md): walks every declared batch query and
  * reports the physical-plan signals that matter at 100 TB — exchange
  * count, join strategies, cartesian products, codegen coverage, and
  * pushdown. Run per round: `sbt "runMain ExplainAudit [queryName…]"`.
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    val names =
      if (args.nonEmpty) args.toSeq
      else graft.SparkEntry.queries.keys.filterNot(_.startsWith("s")).toSeq.sorted
    val rows = names.map { q =>
      val plan = graft.SparkEntry.queries(q)(spark, d)
        .queryExecution.explainString(FormattedMode)
      // formatted mode lists each operator in both tree and detail — count
      // only the numbered detail headers "(n) Op"
      def ops(name: String) = s"\\(\\d+\\) $name".r.findAllIn(plan).size
      val exchanges = ops("Exchange")
      val bhj = ops("BroadcastHashJoin")
      val smj = ops("SortMergeJoin")
      val bnlj = ops("BroadcastNestedLoopJoin")
      val cartesian = ops("CartesianProduct")
      // AQE finalizes the plan only on execution of THIS df (count() runs a
      // clone) — collect, then count the *(n) whole-stage-codegen markers.
      val df = graft.SparkEntry.queries(q)(spark, d)
      df.collect()
      val codegen = "\\*\\(\\d+\\)".r
        .findAllIn(df.queryExecution.executedPlan.toString).size
      val pushed = plan.contains("PushedFilters: [") &&
        !plan.contains("PushedFilters: []")
      (q, exchanges, bhj, smj, bnlj, cartesian, codegen, pushed)
    }
    println(f"${"query"}%-28s shuf bhj smj bnlj cart wscg pushed")
    rows.foreach { case (q, e, b, s, n, c, w, p) =>
      println(f"$q%-28s $e%4d $b%3d $s%3d $n%4d $c%4d $w%4d $p%s")
    }
    val warnings = rows.collect {
      case (q, _, _, _, _, c, _, _) if c > 0 => s"$q: CARTESIAN PRODUCT"
      case (q, e, _, _, _, _, _, _) if e > 8 => s"$q: $e shuffles"
      // empty-result plans collapse to LocalTableScan under AQE (no
      // codegen needed) — only warn when a non-degenerate plan lost codegen
      case (q, e, _, _, _, _, w, _) if w == 0 && e > 0 &&
        graft.SparkEntry.queries(q)(spark, d).count() > 0 => s"$q: no codegen"
    }
    println(if (warnings.isEmpty) "\nAUDIT OK — no cartesians, shuffle counts bounded"
            else "\nWARNINGS:\n" + warnings.mkString("\n"))
    spark.stop()
  }
}
