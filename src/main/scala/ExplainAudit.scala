import org.apache.spark.sql.SparkSession
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions","8")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    for (q <- Seq("q01_pricing_summary","q03_join_broadcast","q04_join_fact","q66_range_query_service","q51_embedding_topk")) {
      println(s"===== $q")
      val plan = graft.SparkEntry.queries(q)(spark, d).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      println(plan.split("\n").filter(l =>
        l.contains("PushedFilters") || l.contains("ReadSchema") || l.contains("Join") ||
        l.contains("WholeStageCodegen") || l.contains("Exchange") || l.contains("(1) Scan")).take(14).mkString("\n"))
    }
    spark.stop()
  }
}
