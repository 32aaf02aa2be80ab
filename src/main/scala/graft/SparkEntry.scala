package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are contributed by family (SURVEY §2 checklist):
  *  - RelationalQueries: E1–E17, E29–E33 (scans, joins, aggs, set ops)
  *  - WindowQueries:     E25–E28 (ranking/analytic/frames)
  *  - FunctionQueries:   E34–E40, E50 (scalar battery, explode)
  *  - AnomalyQueries:    P2–P10, P18 (the rebuilt reference pipeline)
  *  - MetricQueries:     A1–A5 (Prometheus metric families)
  *  - TextQueries:       E52–E56 [N] (dedup, similarity, text analysis)
  *  - StreamingQueries:  E41–E47 (Structured Streaming, rows-only checks)
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    AnomalyQueries.anomalyTopK(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++
      WindowQueries.queries ++
      FunctionQueries.queries ++
      AnomalyQueries.queries ++
      MetricQueries.queries ++
      RegistryQueries.queries ++
      TextQueries.queries ++
      ExtraQueries.queries ++
      ReshapeQueries.queries ++
      CurationQueries.queries ++
      PromQlQueries.queries ++
      NativeHistogramQueries.queries ++
      IngestQueries.queries ++
      StreamingQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracle ++
      WindowQueries.oracle ++
      FunctionQueries.oracle ++
      AnomalyQueries.oracle ++
      MetricQueries.oracle ++
      RegistryQueries.oracle ++
      TextQueries.oracle ++
      ExtraQueries.oracle ++
      ReshapeQueries.oracle ++
      CurationQueries.oracle ++
      PromQlQueries.oracle ++
      NativeHistogramQueries.oracle ++
      IngestQueries.oracle ++
      StreamingQueries.oracle
}
