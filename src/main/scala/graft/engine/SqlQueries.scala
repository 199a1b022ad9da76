package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.Tables

/** The engine's second query surface: ANSI SQL text over the registered
  * harness tables (SURVEY §7.1 `engine/`). The two q19/q20 entries run the
  * LITERAL oracle SQL of q1/q12 through spark.sql — the strongest possible
  * proof of surface parity, since the driver then executes the same text in
  * DuckDB and hash-compares.
  */
object SqlQueries {

  def sql(spark: SparkSession, dir: String, query: String): DataFrame = {
    Tables.registerAll(spark, dir)
    spark.sql(query)
  }

  def pricingSummarySql(spark: SparkSession, dir: String): DataFrame =
    sql(spark, dir, graft.SparkEntry.oracleSql("q1_pricing_summary"))

  def brandAggSql(spark: SparkSession, dir: String): DataFrame =
    sql(spark, dir, graft.SparkEntry.oracleSql("q12_part_agg"))

  /** Correlated EXISTS subquery, run as the LITERAL oracle text (q44).
    * Catalyst decorrelates it into a left-semi hash join on l_orderkey —
    * the subquery never executes per-row, which is the difference between
    * O(n) and O(n²) at scale; `RewriteCorrelatedScalarSubquery` and
    * `RewritePredicateSubquery` do this for free because the plan is
    * declarative.
    */
  def existsSql(spark: SparkSession, dir: String): DataFrame =
    sql(spark, dir, graft.SparkEntry.oracleSql("q44_exists_sql"))
}
