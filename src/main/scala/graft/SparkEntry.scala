package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.analytics.{AdvancedQueries, DedupOps, EventQueries, InsightQueries, LlmPrep, RelationalQueries, SimilarityOps, TextOps, TokenOps}
import graft.multimodal.MultimodalOps

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` / `oracleSql` aggregate every implemented operator module;
  * keys are SURVEY.md §2 operator IDs.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H-Q1-shaped multi-aggregate — the engine's A1/A2 surface. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.q1Agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ AdvancedQueries.queries ++ EventQueries.queries ++
      DedupOps.queries ++ SimilarityOps.queries ++ TextOps.queries ++
      TokenOps.queries ++
      MultimodalOps.queries ++ InsightQueries.queries ++ LlmPrep.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracleSql ++ AdvancedQueries.oracleSql ++ EventQueries.oracleSql ++
      DedupOps.oracleSql ++ SimilarityOps.oracleSql ++ TextOps.oracleSql ++
      TokenOps.oracleSql ++
      MultimodalOps.oracleSql ++ InsightQueries.oracleSql ++ LlmPrep.oracleSql
}
