package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Runtime bloom-filter semi-join reduction — the scan-side pruning
  * that makes selective dim→fact joins survive 100 TB: Catalyst's
  * `InjectRuntimeFilter` builds a bloom filter over the join keys that
  * survive the dim side's selective predicate and pushes
  * `might_contain(key)` into the fact scan, so fact rows that cannot
  * match die at the scan instead of riding the shuffle. At 1000
  * executors this is the difference between shuffling the full fact
  * table and shuffling the ~1% that can join.
  *
  * The rule only fires when the application side is big enough to be
  * worth it (default threshold 10 GB) — far above any local fixture —
  * so the query runs in a CLONED session (shared SparkContext, private
  * SQLConf) with the size thresholds dropped and broadcast disabled,
  * exercising the exact plan a 100 TB run would produce without
  * touching the suite-wide session config. Correctness is unaffected
  * by the bloom (false positives only reach the join, never the
  * output), so the oracle is the plain join. PlanShapeSpec pins the
  * injected `might_contain` in the executed plan.
  */
object RuntimeFilter {

  def bloomPruneAgg(spark: SparkSession, dir: String,
                    minPrice: Double = 450000.0): DataFrame = {
    val s = spark.newSession()
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    // local fixtures are KBs; at 100 TB the default (10 GB) gate fires
    // on its own — zeroing it here reproduces the at-scale plan shape
    s.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    // force a shuffle join: a broadcast dim side already prunes at the
    // join, so the bloom path (the one that matters when BOTH sides
    // shuffle) would never be exercised
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val o = graft.Tables.orders(s, dir)
      .filter(col("o_totalprice") > lit(minPrice))
      .select(col("o_orderkey"), col("o_orderpriority"))
    val l = graft.Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_quantity"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_quantity").cast("long")).as("sum_qty"))
      .orderBy(col("o_orderpriority"))
  }

  val bloomPruneAggSql: String =
    """SELECT o_orderpriority, count(*) AS n_items,
      |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE o_totalprice > 450000.0
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin
}
