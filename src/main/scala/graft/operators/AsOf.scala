package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic as-of join: for each left row, the most recent right row with
  * rightTime <= leftTime in the same key group (the standard `<=` as-of,
  * as in DuckDB's ASOF JOIN).
  *
  * Spark has no as-of operator; the scalable composition (preference (a)
  * of the custom-operator ladder) is:
  *
  *   union both sides tagged → ONE shuffle+sort on (keys, time, side) →
  *   last-non-null carry-forward window → keep left rows.
  *
  * O(left + right) rows through a single exchange, O(1) window state per
  * row — no pairwise join blowup, no range-condition nested loop. At
  * equal timestamps the right row sorts first (side 0 < side 1), so a
  * same-instant right row IS matched, mirroring `<=`.
  */
object AsOf {

  /** @param rightValues right columns to attach (nulls when no right row
    *                    is at-or-before the left row's time) */
  def joinAsOf(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTime: String, rightTime: String,
               rightValues: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val keyCols: Seq[Column] = keys.map(col)

    val rrowType = right.select(rightValues.map(col): _*).schema
    val lrowType = left.schema

    val l = left.select(
      keyCols :+ col(leftTime).as("_t") :+ lit(1).as("_side") :+
        struct(leftCols.map(col): _*).as("_lrow") :+
        lit(null).cast(rrowType).as("_rrow"): _*)
    // Right rows with a NULL time can never satisfy `rightTime <= t` —
    // and unfiltered they'd sort first (nulls-first asc) with a non-null
    // _rrow that ignoreNulls would happily return.
    val r = right.filter(col(rightTime).isNotNull).select(
      keyCols :+ col(rightTime).as("_t") :+ lit(0).as("_side") :+
        lit(null).cast(lrowType).as("_lrow") :+
        struct(rightValues.map(col): _*).as("_rrow"): _*)

    // _rrow as the final orderBy term: when several right rows share
    // (key, time), the carried-forward match is deterministically the
    // greatest by rightValues (struct ordering is lexicographic by field)
    // instead of whichever the sort happened to place last.
    val w = Window.partitionBy(keyCols: _*)
      .orderBy(col("_t"), col("_side"), col("_rrow"))
      .rowsBetween(Window.unboundedPreceding, 0)

    l.unionByName(r)
      .withColumn("_asof", last(col("_rrow"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(leftCols.map(c => col(s"_lrow.$c").as(c)) ++
        rightValues.map(c => col(s"_asof.$c").as(s"asof_$c")): _*)
  }
}
