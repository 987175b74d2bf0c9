package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over relational edges — the iterative-propagation
  * family beyond connected components (Corpus.componentLabels): PageRank
  * with a fixed, unrollable iteration count.
  *
  * All rank arithmetic is exact int64 (micro-rank units, integer
  * division) so the DuckDB oracle replicates every iteration
  * bit-for-bit — the same determinism discipline as q88's milli-unit
  * k-means and q47's modular hashes.
  */
object Graph {

  /** q94: PageRank over the bipartite customer → supplier purchase graph
    * (distinct (o_custkey, l_suppkey) pairs via the order key; supplier
    * nodes offset by 1e6 to disambiguate the shared id space). Damping
    * 0.85, `iters` fixed rounds, every quantity in integer micro-rank
    * units: r₀ = 10¹² div N, rᵢ₊₁(v) = (15·base) div 100 +
    * (85·Σ_{u→v} rᵢ(u) div outdeg(u)) div 100. Customers have no
    * in-links so their rank settles at the teleport floor; rank
    * concentrates in heavily-bought-from suppliers — the graph-shaped
    * "entity importance" signal. Top-k by (rank desc, node).
    *
    * 100 TB shape: the edge list is built once (one fact-fact join,
    * distinct on two int keys), hash-partitioned by src, and persisted —
    * each round reuses that SAME partitioning for the rank join (no
    * re-shuffle of edges), the per-node inflow is a partial+final sum
    * (map-side combinable — a hot supplier costs O(1) state per task),
    * and ranks/nodes frames are O(|V|), never O(|E|). The iteration
    * count is fixed and small, so lineage stays bounded without
    * checkpoints; the final top-k is TakeOrderedAndProject (per-partition
    * heap + k-row driver merge), never a full sort. */
  def pageRank(orders: DataFrame, lineitem: DataFrame,
               iters: Int = 3, k: Int = 20): DataFrame = {
    val spark = orders.sparkSession
    val parts = math.max(4, spark.sparkContext.defaultParallelism / 8)
    val edges = orders
      .join(lineitem, col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").cast("long").as("src"),
        (lit(1000000L) + col("l_suppkey").cast("long")).as("dst"))
      .distinct()
      .repartition(parts, col("src"))
      .persist()
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node")))
      .distinct()
      .persist()
    // base = 10^12 div N as a 1-row broadcast frame — N never hits the
    // driver (no collect), it stays a plan-side scalar
    val base = broadcast(nodes.agg(count(lit(1)).as("n"))
      .select(expr("1000000000000 div n").as("base")))
    val outdeg = edges.groupBy(col("src")).agg(count(lit(1)).as("d"))

    var ranks = nodes.crossJoin(base).select(col("node"), col("base").as("r"))
    for (_ <- 1 to iters) {
      val inflow = edges
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .join(outdeg, "src")
        .select(col("dst").as("node"), expr("r div d").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("inflow"))
      ranks = nodes.join(inflow, Seq("node"), "left")
        .crossJoin(base)
        .select(col("node"),
          (expr("(15 * base) div 100") +
            expr("(85 * coalesce(inflow, 0L)) div 100")).as("r"))
    }
    // materialize the k-row result eagerly, then release the loop caches
    // (the CC-engine discipline — no cached frame outlives its query)
    val out = ranks.orderBy(col("r").desc, col("node")).limit(k)
      .select(col("node"), col("r").as("rank_u"))
      .localCheckpoint()
    edges.unpersist()
    nodes.unpersist()
    out
  }

  /** q121: degree distribution of the purchase graph — the structural
    * sanity check run before any iterative graph algorithm (q94, q68):
    * how many customers buy from d suppliers, how many suppliers sell
    * to d customers. Heavy-tailed in-degree is what motivates q94's
    * map-side-combinable inflow and the CC engine's skewed-star
    * handling — this query is the evidence pass.
    *
    * 100 TB shape: the edge list is the same one fact-fact join q94
    * builds (distinct on two int keys); each side is then two nested
    * partial+final aggregates (node→degree, degree→count) whose state
    * collapses to |V| then |distinct degrees| — nothing larger than the
    * edge list ever shuffles, and the two sides' pipelines share the
    * one edge scan. */
  def degreeDistribution(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val edges = orders
      .join(lineitem, col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").cast("long").as("src"),
        col("l_suppkey").cast("long").as("dst"))
      .distinct()
    def hist(keyed: DataFrame, side: String): DataFrame =
      keyed.groupBy(col("node")).agg(count(lit(1)).as("degree"))
        .groupBy(col("degree")).agg(count(lit(1)).as("n_nodes"))
        .select(lit(side).as("side"), col("degree"), col("n_nodes"))
    hist(edges.select(col("src").as("node")), "customer_out")
      .unionAll(hist(edges.select(col("dst").as("node")), "supplier_in"))
      .orderBy(col("side"), col("degree"))
  }

  val degreeDistributionSql: String =
    """WITH e AS (SELECT DISTINCT o_custkey AS src, l_suppkey AS dst
      |    FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
      |od AS (SELECT src, count(*) AS degree FROM e GROUP BY src),
      |id AS (SELECT dst, count(*) AS degree FROM e GROUP BY dst)
      |SELECT side, degree, n_nodes FROM (
      |  SELECT 'customer_out' AS side, degree, count(*) AS n_nodes
      |    FROM od GROUP BY degree
      |  UNION ALL
      |  SELECT 'supplier_in', degree, count(*) FROM id GROUP BY degree)
      |ORDER BY side, degree""".stripMargin

  /** Bit-exact oracle at the registered defaults (3 iterations, top 20):
    * the rounds unrolled as CTEs in the same integer arithmetic. DuckDB
    * sum(BIGINT) widens to HUGEINT, so every inflow is cast back before
    * it enters the rank formula (the q19 dtype lesson). */
  val pageRankSql: String = {
    def round(prev: String, c: String, r: String) =
      s"""$c AS (SELECT e.dst AS node,
         |    CAST(sum($prev.r // deg.d) AS BIGINT) AS inflow
         |  FROM e JOIN $prev ON $prev.node = e.src
         |  JOIN deg ON deg.src = e.src GROUP BY e.dst),
         |$r AS (SELECT n.node,
         |    (15 * (SELECT base FROM b)) // 100 +
         |    (85 * coalesce($c.inflow, 0)) // 100 AS r
         |  FROM nodes n LEFT JOIN $c ON $c.node = n.node)""".stripMargin
    s"""WITH e AS (SELECT DISTINCT o_custkey AS src, 1000000 + l_suppkey AS dst
      |       FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
      |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
      |b AS (SELECT 1000000000000 // count(*) AS base FROM nodes),
      |deg AS (SELECT src, count(*) AS d FROM e GROUP BY src),
      |r0 AS (SELECT node, (SELECT base FROM b) AS r FROM nodes),
      |${round("r0", "c1", "r1")},
      |${round("r1", "c2", "r2")},
      |${round("r2", "c3", "r3")}
      |SELECT node, r AS rank_u FROM r3
      |ORDER BY r DESC, node LIMIT 20""".stripMargin
  }
}
