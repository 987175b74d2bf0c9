package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Behavior specs for the r6 warehouse additions: CDC merge (q148),
  * replica fingerprint diff (q149), rolling 7-day window (q145), and
  * the approx-quantile contract (q146). */
class MergeFingerprintSpec extends SparkSpec {

  test("cdc merge (q148): deletes absent, updates bumped, inserts odd mod-3") {
    val orders = Tables.orders(spark, sf)
    val out = Relational.cdcMerge(orders).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(3)))
    val byStatus = out.groupBy(_._3).view.mapValues(_.map(_._1).toSet).toMap
    // no delete key (≡0 mod 12) survives, in any status
    out.foreach { case (k, _, _) => assert(k % 12 != 0, s"deleted key $k kept") }
    // updated = even mod-6 minus mod-12; inserted = odd mod-3; kept = the rest of snapshot
    byStatus("updated").foreach(k => assert(k % 6 == 0 && k % 12 != 0))
    byStatus("inserted").foreach(k => assert(k % 3 == 0 && k % 2 == 1))
    byStatus("kept").foreach(k => assert(k % 2 == 0 && k % 3 != 0))
    // updates carry cents + 100 vs the source row
    val cents = orders
      .select(col("o_orderkey"), round(col("o_totalprice") * 100).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.filter(_._3 == "updated").foreach { case (k, c, _) =>
      assert(c == cents(k) + 100, s"update for $k: $c vs ${cents(k)}")
    }
    // merged key set = (snapshot − deletes − nothing) ∪ inserts, exactly once
    assert(out.map(_._1).distinct.length == out.length)
  }

  test("replica fingerprint (q149): flags exactly the perturbed buckets") {
    val orders = Tables.orders(spark, sf)
    val expectedBad = orders.filter(col("o_orderkey") % 1000 === 7)
      .select(pmod(col("o_orderkey"), lit(16L))).distinct()
      .collect().map(_.getLong(0)).toSet
    val out = Relational.replicaFingerprint(orders).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(out.length == 16)
    out.foreach { case (b, na, nb, sync) =>
      assert(na == nb) // perturbation edits a row, never adds/removes one
      assert(sync == !expectedBad.contains(b), s"bucket $b")
    }
  }

  test("rolling 7-day (q145): trailing frame matches brute recompute; gaps not filled") {
    val orders = Tables.orders(spark, sf)
    val out = Relational.rolling7Day(orders).collect()
      .map(r => ((r.getString(0), r.getLong(2)),
        (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))))
    val daily = out.map { case (k, v) => k -> (v._1, v._2) }.toMap
    out.foreach { case ((prio, d), (_, _, n7, rev7, present)) =>
      val win = (d - 6 to d).flatMap(dd => daily.get((prio, dd)))
      assert(present == win.length && present <= 7)
      assert(n7 == win.map(_._1).sum, s"$prio day $d n_7d")
      assert(rev7 == win.map(_._2).sum, s"$prio day $d rev_7d")
    }
  }

  test("quantile contract (q146): sketch lands inside the exact rank-error band") {
    val out = Relational.quantileContract(Tables.orders(spark, sf)).collect()
    assert(out.length == 5)
    out.foreach { r =>
      assert(r.getBoolean(4), s"${r.getString(0)} median outside band")
      assert(r.getBoolean(5), s"${r.getString(0)} p90 outside band")
    }
  }
}
