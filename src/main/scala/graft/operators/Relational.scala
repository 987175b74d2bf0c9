package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Relational operator suite (SURVEY.md §2B) as pure DataFrame → DataFrame
  * functions. All plans are declarative — Catalyst handles pushdown,
  * pruning, join selection, and partial aggregation; no custom rules
  * (SURVEY.md §4 verdict).
  *
  * Determinism contract for the DuckDB oracle: every query ends with a
  * total `orderBy` on non-null keys, money/double aggregates are rounded,
  * timestamps leave the plan as DATE or epoch-micros BIGINT.
  */
object Relational {

  /** Round a double column for cross-engine hash stability. */
  def r2(c: Column): Column = round(c, 2)

  /** TPC-H Q1-shaped pricing summary: scan + filter (pushed to parquet) +
    * hash aggregate (partial+final, map-side combine) + small sort.
    * At 100 TB: the only shuffle is 4-8 group keys wide — negligible. */
  def pricingSummary(lineitem: DataFrame): DataFrame =
    lineitem
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        r2(sum(col("l_quantity"))).as("sum_qty"),
        r2(sum(col("l_extendedprice"))).as("sum_base_price"),
        r2(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("sum_disc_price"),
        r2(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")))).as("sum_charge"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_extendedprice")), 4).as("avg_price"),
        round(avg(col("l_discount")), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  val pricingSummarySql: String =
    """SELECT l_returnflag, l_linestatus,
      |  round(sum(l_quantity), 2) AS sum_qty,
      |  round(sum(l_extendedprice), 2) AS sum_base_price,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
      |  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
      |  round(avg(l_quantity), 4) AS avg_qty,
      |  round(avg(l_extendedprice), 4) AS avg_price,
      |  round(avg(l_discount), 6) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin
}
