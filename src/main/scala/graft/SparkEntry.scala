package graft

import graft.queries.CoreQueries
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.qSupplierAgg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> (CoreQueries.q1PricingSummary _),
    "q_mapper_clean"     -> (CoreQueries.qMapperClean _),
    "q_dedupe_rules"     -> (CoreQueries.qDedupeRules _),
    "q_supplier_agg"     -> (CoreQueries.qSupplierAgg _)
  )

  /** DuckDB-runnable equivalent for each query (same column names/order-by). */
  def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" -> CoreQueries.q1Sql,
    "q_mapper_clean"     -> CoreQueries.qMapperCleanSql,
    "q_dedupe_rules"     -> CoreQueries.qDedupeRulesSql,
    "q_supplier_agg"     -> CoreQueries.qSupplierAggSql
  )
}
