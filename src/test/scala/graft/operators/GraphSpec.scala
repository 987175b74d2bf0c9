package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {

  test("pagerank matches a direct integer-arithmetic computation") {
    import spark.implicits._
    // customers 1,2,3; suppliers 10,20: cust 1 buys from both suppliers,
    // custs 2,3 only from supplier 10 — supplier 10 must outrank 20
    val orders = Seq((100L, 1L), (101L, 2L), (102L, 3L), (103L, 1L))
      .toDF("o_orderkey", "o_custkey")
    val lineitem = Seq(
      (100L, 10L), (100L, 20L), (101L, 10L), (102L, 10L), (103L, 20L))
      .toDF("l_orderkey", "l_suppkey")

    // direct reference computation, same micro-unit integer arithmetic
    val edges = Set((1L, 1000010L), (1L, 1000020L), (2L, 1000010L), (3L, 1000010L))
    val nodes = edges.flatMap(e => Seq(e._1, e._2))
    val base = 1000000000000L / nodes.size
    val outdeg = edges.groupBy(_._1).map { case (s, es) => s -> es.size }
    var r = nodes.map(_ -> base).toMap
    for (_ <- 1 to 3) {
      val inflow = edges.toSeq.groupBy(_._2).map { case (d, es) =>
        d -> es.map(e => r(e._1) / outdeg(e._1)).sum
      }
      r = nodes.map(n => n -> ((15L * base) / 100 + 85L * inflow.getOrElse(n, 0L) / 100)).toMap
    }
    val expected = r.toSeq.sortBy { case (n, rk) => (-rk, n) }

    val got = Graph.pageRank(orders, lineitem).collect()
      .map(row => (row.getLong(0), row.getLong(1)))
    assert(got.toSeq === expected)
    // the popular supplier strictly outranks the other; customers sit at
    // the teleport floor below both
    assert(r(1000010L) > r(1000020L))
    assert(got.head._1 === 1000010L)
  }

  test("pagerank materializes the k-row result and keeps its schema") {
    import spark.implicits._
    val orders = Seq((100L, 1L)).toDF("o_orderkey", "o_custkey")
    val lineitem = Seq((100L, 10L)).toDF("l_orderkey", "l_suppkey")
    val out = Graph.pageRank(orders, lineitem, iters = 1, k = 5)
    // localCheckpoint materializes the k rows; schema + rows survive
    assert(out.columns.toSeq === Seq("node", "rank_u"))
    assert(out.count() === 2)
  }

  test("degree distribution counts distinct neighbors per side, dup lines once") {
    import spark.implicits._
    // cust 1 -> supp {10, 20} (supp 10 via two orders: one distinct edge)
    // cust 2 -> supp {10}; so out-degrees {2:1, 1:1}; in: supp10 deg 2, supp20 deg 1
    val orders = Seq((100L, 1L), (101L, 1L), (102L, 2L))
      .toDF("o_orderkey", "o_custkey")
    val lineitem = Seq((100L, 10L), (100L, 20L), (101L, 10L), (102L, 10L))
      .toDF("l_orderkey", "l_suppkey")
    val out = Graph.degreeDistribution(orders, lineitem).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq(
      ("customer_out", 1L, 1L), ("customer_out", 2L, 1L),
      ("supplier_in", 1L, 1L), ("supplier_in", 2L, 1L)))
  }
}
