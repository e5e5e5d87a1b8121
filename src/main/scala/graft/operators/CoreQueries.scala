package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Relational operator coverage over the driver's TPC-H-ish tables.
  *
  * Each entry pairs a DataFrame query with ANSI SQL (DuckDB dialect) the
  * driver runs as oracle. Column names/aliases must match exactly; every
  * query is deterministically ordered so row order can never break the
  * hash compare. Double aggregates are rounded to absorb summation-order
  * ULP differences between engines.
  */
object CoreQueries {

  type Q = (SparkSession, String) => DataFrame

  /** A1-shape hash aggregation (ref: wikidata.py:262-269 upsert-as-agg).
    * Partial+final hash agg; at 100 TB this is a single shuffle on the
    * grouping key with map-side combine — no driver state.
    */
  def q1Agg(s: SparkSession, d: String): DataFrame = {
    Tables.lineitem(s, d)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg("l_quantity"), 4).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  val q1AggSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  round(sum(l_quantity), 2) AS sum_qty,
      |  round(sum(l_extendedprice), 2) AS sum_base_price,
      |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
      |  round(avg(l_quantity), 4) AS avg_qty,
      |  count(*) AS count_order
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  def queries: Map[String, Q] = Map(
    "q1_agg" -> (q1Agg _)
  )

  def oracles: Map[String, String] = Map(
    "q1_agg" -> q1AggSql
  )
}
