package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The remaining TPC-H query shapes (Q2, Q6, Q8, Q9, Q11, Q12, Q14, Q15,
  * Q16, Q17, Q20, Q21), adapted to the fixture schema — the fixtures carry
  * no `partsupp`, ship modes, or commit/receipt dates (FIXTURES.md), so
  * each query keeps its TPC-H *shape* (the plan family the benchmark was
  * designed to exercise) over the columns that exist; every adaptation is
  * documented on the function.
  *
  * Together with q01/q58/q111/q112/q120/q128/q135-q139 this completes all
  * 22 TPC-H query families as oracle-checked queries.
  *
  * Determinism discipline (same as [[Relational]]): money aggregates sum
  * per-row `floor(x·100)` integer cents — a float SUM's value depends on
  * partition-summation order, while per-row double arithmetic is IEEE-
  * identical across engines and long sums are exact. Ratios divide two
  * exact longs (one double division — identical in both engines).
  */
object TpchSuite {

  /** Per-row exact money: floor(expr · 100) as long. Both engines evaluate
    * the inner double expression bit-identically per row; the floor image
    * is then summable without order sensitivity. */
  private def cents(c: Column): Column = floor(c * 100).cast("long")

  // --------------------------------------------------------------------
  // q150: TPC-H Q6 — forecasting revenue change. Pure scan-side query:
  // every predicate (date range, discount band, quantity cap) pushes to
  // the parquet scan as a PushedFilter; the plan is scan → partial agg →
  // 1-row final agg, no shuffle of data rows at all.
  // 100 TB shape: THE minimal-IO query — row-group statistics prune on
  // l_shipdate, the reader materializes only the four referenced columns.
  // --------------------------------------------------------------------
  def tpchQ6(lineitem: DataFrame): DataFrame =
    lineitem
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(sum(cents(col("l_extendedprice") * col("l_discount")))
        .as("revenue_cents"), count(lit(1)).as("n_lines"))

  val tpchQ6Sql: String =
    """SELECT CAST(sum(CAST(floor(l_extendedprice * l_discount * 100) AS BIGINT))
      |    AS BIGINT) AS revenue_cents,
      |  count(*) AS n_lines
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate < TIMESTAMP '1997-01-01'
      |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin

  // --------------------------------------------------------------------
  // q151: TPC-H Q2 — minimum-cost supplier. The fixture has no partsupp,
  // so the supply relation is lineitem itself: a part's unit cost from a
  // supplier is floor(100·l_extendedprice/l_quantity) (per-row IEEE
  // double division, then exact), and the query finds, for each part in
  // a type/size slice, every supplier achieving that part's global
  // minimum unit cost — Q2's correlated-min shape.
  // 100 TB shape: the slice dims broadcast into the fact scan; the
  // per-part min is one partial+final agg; the "equals the min" step is
  // a partkey-shuffled join back onto the aggregate (the decorrelated
  // plan Catalyst builds for the correlated form); supplier is a
  // broadcast dim at the end, applied after the candidate set collapsed.
  // --------------------------------------------------------------------
  def minCostSupplier(lineitem: DataFrame, part: DataFrame,
                      supplier: DataFrame): DataFrame = {
    val sliced = part
      .filter(col("p_type") === "LARGE" && col("p_size").between(10, 20))
      .select(col("p_partkey"), col("p_brand"))
    val units = lineitem
      .join(broadcast(sliced), col("l_partkey") === col("p_partkey"))
      .select(col("p_partkey"), col("p_brand"), col("l_suppkey"),
        cents(col("l_extendedprice") / col("l_quantity")).as("unit_cents"))
    val mins = units.groupBy(col("p_partkey"))
      .agg(min(col("unit_cents")).as("min_unit_cents"))
    units.join(mins, "p_partkey")
      .filter(col("unit_cents") === col("min_unit_cents"))
      .select(col("p_partkey"), col("p_brand"), col("l_suppkey"),
        col("min_unit_cents")).distinct()
      .join(broadcast(supplier.select(col("s_suppkey"), col("s_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("p_partkey"), col("p_brand"), col("s_suppkey"),
        col("s_name"), col("min_unit_cents"))
      .orderBy(col("p_partkey"), col("s_suppkey"))
  }

  val minCostSupplierSql: String =
    """WITH units AS (
      |  SELECT p.p_partkey, p.p_brand, l.l_suppkey,
      |    CAST(floor(l.l_extendedprice / l.l_quantity * 100) AS BIGINT) AS unit_cents
      |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      |  WHERE p.p_type = 'LARGE' AND p.p_size BETWEEN 10 AND 20),
      |mins AS (SELECT p_partkey, min(unit_cents) AS min_unit_cents
      |         FROM units GROUP BY p_partkey)
      |SELECT DISTINCT u.p_partkey, u.p_brand, s.s_suppkey, s.s_name,
      |  m.min_unit_cents
      |FROM units u JOIN mins m ON u.p_partkey = m.p_partkey
      |  AND u.unit_cents = m.min_unit_cents
      |JOIN supplier s ON u.l_suppkey = s.s_suppkey
      |ORDER BY u.p_partkey, s.s_suppkey""".stripMargin

  // --------------------------------------------------------------------
  // q152: TPC-H Q8 — national market share. Share of NATION_2-based
  // suppliers in the PROMO-part revenue delivered to ASIA-region
  // customers, per order year. The shape: a 6-table star whose fact
  // rows carry a CONDITIONAL numerator (supplier-nation test) over the
  // common denominator — one aggregate, two sums, no second pass.
  // 100 TB shape: all five dims broadcast; lineitem→orders is the one
  // fact-fact shuffle; the year() grouping keys ~7 rows of output.
  // --------------------------------------------------------------------
  def marketShare(lineitem: DataFrame, orders: DataFrame, customer: DataFrame,
                  supplier: DataFrame, nation: DataFrame, region: DataFrame,
                  part: DataFrame): DataFrame = {
    val asiaCust = customer
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "ASIA").select(col("c_custkey"))
    val supNation = supplier
      .join(broadcast(nation.select(col("n_nationkey").as("sn_key"),
        col("n_name").as("sn_name"))), col("s_nationkey") === col("sn_key"))
      .select(col("s_suppkey"), col("sn_name"))
    val promoParts = part.filter(col("p_type") === "PROMO").select(col("p_partkey"))
    lineitem
      .join(broadcast(promoParts), col("l_partkey") === col("p_partkey"))
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(asiaCust), col("o_custkey") === col("c_custkey"), "left_semi")
      .join(broadcast(supNation), col("l_suppkey") === col("s_suppkey"))
      .select(year(col("o_orderdate")).cast("long").as("o_year"),
        cents(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("vol"),
        col("sn_name"))
      .groupBy(col("o_year"))
      .agg(sum(when(col("sn_name") === "NATION_2", col("vol")).otherwise(0L))
        .as("nation_cents"), sum(col("vol")).as("total_cents"))
      // integer basis points, not round(double, 4): decimal rounding of a
      // double diverges between engines at .xxxx5 boundaries (Spark
      // rounds the shortest decimal repr HALF_UP, DuckDB the binary
      // value) — floor-quantized long division is boundary-free
      .withColumn("mkt_share_bp",
        expr("(10000 * nation_cents) div total_cents"))
      .orderBy(col("o_year"))
  }

  val marketShareSql: String =
    """WITH vol AS (
      |  SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
      |    CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT) AS vol,
      |    sn.n_name AS sn_name
      |  FROM lineitem l
      |  JOIN part p ON l.l_partkey = p.p_partkey AND p.p_type = 'PROMO'
      |  JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |  JOIN nation sn ON s.s_nationkey = sn.n_nationkey
      |  WHERE EXISTS (SELECT 1 FROM customer c
      |    JOIN nation cn ON c.c_nationkey = cn.n_nationkey
      |    JOIN region r ON cn.n_regionkey = r.r_regionkey
      |    WHERE c.c_custkey = o.o_custkey AND r.r_name = 'ASIA'))
      |SELECT o_year,
      |  CAST(sum(CASE WHEN sn_name = 'NATION_2' THEN vol ELSE 0 END) AS BIGINT)
      |    AS nation_cents,
      |  CAST(sum(vol) AS BIGINT) AS total_cents,
      |  CAST((10000 * sum(CASE WHEN sn_name = 'NATION_2' THEN vol ELSE 0 END))
      |    // sum(vol) AS BIGINT) AS mkt_share_bp
      |FROM vol GROUP BY o_year ORDER BY o_year""".stripMargin

  // --------------------------------------------------------------------
  // q153: TPC-H Q9 — product-type profit. The fixture has no
  // ps_supplycost; cost is modeled as p_retailprice·l_quantity, so
  // profit = revenue − modeled cost, summed per supplier nation and
  // order year for parts whose name contains a token. The shape: a
  // name-filtered dim driving a multi-star join with a two-key group.
  // 100 TB shape: the p_name filter collapses part before broadcast;
  // profit is per-row exact cents; one fact-fact shuffle (l→o).
  // --------------------------------------------------------------------
  def productProfit(lineitem: DataFrame, orders: DataFrame, supplier: DataFrame,
                    nation: DataFrame, part: DataFrame,
                    token: String = "widget"): DataFrame = {
    val parts = part.filter(col("p_name").contains(token))
      .select(col("p_partkey"), col("p_retailprice"))
    val supNation = supplier
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name"))
    lineitem
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .join(broadcast(supNation), col("l_suppkey") === col("s_suppkey"))
      .join(orders.select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("n_name"), year(col("o_orderdate")).cast("long").as("o_year"),
        cents(col("l_extendedprice") * (lit(1) - col("l_discount")) -
          col("p_retailprice") * col("l_quantity")).as("amount"))
      .groupBy(col("n_name"), col("o_year"))
      .agg(sum(col("amount")).as("profit_cents"), count(lit(1)).as("n_lines"))
      .orderBy(col("n_name"), col("o_year").desc)
  }

  val productProfitSql: String =
    """SELECT n.n_name, CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
      |  CAST(sum(CAST(floor((l.l_extendedprice * (1 - l.l_discount)
      |    - p.p_retailprice * l.l_quantity) * 100) AS BIGINT)) AS BIGINT)
      |    AS profit_cents,
      |  count(*) AS n_lines
      |FROM lineitem l
      |JOIN part p ON l.l_partkey = p.p_partkey AND p.p_name LIKE '%widget%'
      |JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |JOIN nation n ON s.s_nationkey = n.n_nationkey
      |JOIN orders o ON l.l_orderkey = o.o_orderkey
      |GROUP BY n.n_name, o_year
      |ORDER BY n.n_name, o_year DESC""".stripMargin

  // --------------------------------------------------------------------
  // q154: TPC-H Q11 — important stock identification. Without partsupp,
  // "value" is each part's total lineitem revenue; the query keeps
  // parts whose value exceeds 1/1200 of the corpus total — the
  // HAVING-against-a-global-scalar shape.
  // 100 TB shape: ONE partkey agg produces the per-part frame; the
  // global total re-aggregates that frame (tiny) and broadcasts back as a
  // 1-row scalar — the fact table is scanned once.
  // --------------------------------------------------------------------
  def valueConcentration(lineitem: DataFrame): DataFrame = {
    val perPart = lineitem
      .groupBy(col("l_partkey"))
      .agg(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
        .as("value_cents"))
    val total = broadcast(perPart.agg(sum(col("value_cents")).as("total_cents")))
    perPart.crossJoin(total)
      .filter(col("value_cents") * 1200 > col("total_cents"))
      .select(col("l_partkey"), col("value_cents"))
      .orderBy(col("value_cents").desc, col("l_partkey"))
  }

  val valueConcentrationSql: String =
    """WITH pp AS (SELECT l_partkey,
      |    CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100)
      |      AS BIGINT)) AS BIGINT) AS value_cents
      |  FROM lineitem GROUP BY l_partkey),
      |t AS (SELECT CAST(sum(value_cents) AS BIGINT) AS total_cents FROM pp)
      |SELECT pp.l_partkey, pp.value_cents FROM pp, t
      |WHERE pp.value_cents * 1200 > t.total_cents
      |ORDER BY pp.value_cents DESC, pp.l_partkey""".stripMargin

  // --------------------------------------------------------------------
  // q155: TPC-H Q12 — shipping-priority audit. The fixture has no ship
  // mode; l_returnflag plays the mode dimension. A line is LATE if it
  // shipped more than 90 days after its order date; late lines are
  // classified by order priority (critical = 1-URGENT/2-HIGH) per flag
  // — Q12's join + conditional-count shape.
  // 100 TB shape: the lateness predicate references both sides, so it
  // applies at the join; both facts shuffle once on orderkey; output is
  // |flags| rows from a partial+final conditional count.
  // --------------------------------------------------------------------
  def latePriority(lineitem: DataFrame, orders: DataFrame): DataFrame =
    lineitem
      .join(orders.select(col("o_orderkey"), col("o_orderdate"),
        col("o_orderpriority")), col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"))
      .groupBy(col("l_returnflag"))
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L)).as("high_line_count"),
        sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L)).as("low_line_count"))
      .orderBy(col("l_returnflag"))

  val latePrioritySql: String =
    """SELECT l.l_returnflag,
      |  CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
      |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
      |    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      |WHERE l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
      |GROUP BY l.l_returnflag ORDER BY l.l_returnflag""".stripMargin

  // --------------------------------------------------------------------
  // q156: TPC-H Q14 — promotion effect. Share (basis points) of PROMO-
  // part revenue within one ship month. Integer basis points via long
  // division — Q14's conditional-ratio-over-one-aggregate shape.
  // 100 TB shape: date range pushes to the scan; part broadcasts; one
  // 1-row aggregate, zero data shuffles.
  // --------------------------------------------------------------------
  def promoShare(lineitem: DataFrame, part: DataFrame): DataFrame =
    lineitem
      .filter(col("l_shipdate") >= lit("1997-09-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-10-01").cast("timestamp"))
      .join(broadcast(part.select(col("p_partkey"), col("p_type"))),
        col("l_partkey") === col("p_partkey"))
      .select(cents(col("l_extendedprice") * (lit(1) - col("l_discount")))
        .as("rev"), col("p_type"))
      .agg(sum(when(col("p_type") === "PROMO", col("rev")).otherwise(0L))
        .as("promo_cents"), sum(col("rev")).as("total_cents"))
      .withColumn("promo_share_bp",
        expr("(10000 * promo_cents) div total_cents"))

  val promoShareSql: String =
    """WITH r AS (
      |  SELECT CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100)
      |    AS BIGINT) AS rev, p.p_type
      |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      |  WHERE l.l_shipdate >= TIMESTAMP '1997-09-01'
      |    AND l.l_shipdate < TIMESTAMP '1997-10-01')
      |SELECT CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev ELSE 0 END)
      |    AS BIGINT) AS promo_cents,
      |  CAST(sum(rev) AS BIGINT) AS total_cents,
      |  CAST((10000 * sum(CASE WHEN p_type = 'PROMO' THEN rev ELSE 0 END))
      |    // sum(rev) AS BIGINT) AS promo_share_bp
      |FROM r""".stripMargin

  // --------------------------------------------------------------------
  // q157: TPC-H Q15 — top supplier. Revenue per supplier over one
  // quarter, return the supplier(s) achieving the maximum — the
  // view + scalar-max shape (ties kept, as the spec requires).
  // 100 TB shape: one suppkey agg over the date-pruned scan; the max
  // re-aggregates the |suppliers|-row frame and broadcasts back; the
  // supplier dim joins only the winners.
  // --------------------------------------------------------------------
  def topSupplier(lineitem: DataFrame, supplier: DataFrame): DataFrame = {
    val revenue = lineitem
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
        .as("total_cents"))
    val top = broadcast(revenue.agg(max(col("total_cents")).as("max_cents")))
    revenue.crossJoin(top)
      .filter(col("total_cents") === col("max_cents"))
      .join(broadcast(supplier.select(col("s_suppkey"), col("s_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_cents"))
      .orderBy(col("s_suppkey"))
  }

  val topSupplierSql: String =
    """WITH rev AS (
      |  SELECT l_suppkey,
      |    CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100)
      |      AS BIGINT)) AS BIGINT) AS total_cents
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |    AND l_shipdate < TIMESTAMP '1996-04-01'
      |  GROUP BY l_suppkey)
      |SELECT s.s_suppkey, s.s_name, r.total_cents
      |FROM rev r JOIN supplier s ON r.l_suppkey = s.s_suppkey
      |WHERE r.total_cents = (SELECT max(total_cents) FROM rev)
      |ORDER BY s.s_suppkey""".stripMargin

  // --------------------------------------------------------------------
  // q158: TPC-H Q16 — parts/supplier relationship. How many distinct
  // suppliers shipped each (brand, size) combination in a size slice,
  // excluding distrusted suppliers (negative balance stands in for the
  // complaint filter). NOT-IN → anti-join + count(DISTINCT) over a
  // join — Q16's shape without partsupp.
  // 100 TB shape: the exclusion list is a broadcast anti-join (bounded
  // dim); the distinct-count shuffles (brand,size,suppkey) once, then
  // final-aggregates — no row explosion beyond the fact itself.
  // --------------------------------------------------------------------
  def supplierCountByPart(lineitem: DataFrame, part: DataFrame,
                          supplier: DataFrame): DataFrame = {
    val excluded = supplier.filter(col("s_acctbal") < 0).select(col("s_suppkey"))
    lineitem
      .join(broadcast(part.filter(col("p_size").isin(5, 15, 25, 35))
        .select(col("p_partkey"), col("p_brand"), col("p_size"))),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(excluded), col("l_suppkey") === col("s_suppkey"),
        "left_anti")
      .groupBy(col("p_brand"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_size"))
  }

  val supplierCountByPartSql: String =
    """SELECT p.p_brand, p.p_size,
      |  count(DISTINCT l.l_suppkey) AS supplier_cnt
      |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      |WHERE p.p_size IN (5, 15, 25, 35)
      |  AND l.l_suppkey NOT IN
      |    (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      |GROUP BY p.p_brand, p.p_size
      |ORDER BY supplier_cnt DESC, p.p_brand, p.p_size""".stripMargin

  // --------------------------------------------------------------------
  // q159: TPC-H Q17 — small-quantity-order revenue. Revenue from lines
  // of one brand whose quantity is below 20% of that part's average
  // quantity. The correlated-average threshold compares in cross-
  // multiplied integers: qty < avg/5  ⟺  5·n·qty < Σqty (quantities
  // scaled ×100 to integers first), so no float average ever exists.
  // 100 TB shape: brand filter collapses part before broadcast; the
  // per-part average is one agg over the brand's lines; the threshold
  // applies via a partkey join back — Catalyst's own decorrelation
  // plan, written directly.
  // --------------------------------------------------------------------
  def smallQuantityRevenue(lineitem: DataFrame, part: DataFrame,
                           brand: String = "Brand#23"): DataFrame = {
    val brandLines = lineitem
      .join(broadcast(part.filter(col("p_brand") === brand)
        .select(col("p_partkey"))), col("l_partkey") === col("p_partkey"))
      .select(col("p_partkey"), floor(col("l_quantity") * 100).cast("long")
        .as("q100"), cents(col("l_extendedprice")).as("price_cents"))
    val stats = brandLines.groupBy(col("p_partkey"))
      .agg(sum(col("q100")).as("sum_q100"), count(lit(1)).as("n_lines"))
    brandLines.join(stats, "p_partkey")
      .filter(col("q100") * col("n_lines") * 5 < col("sum_q100"))
      .agg(sum(col("price_cents")).as("small_qty_cents"),
        count(lit(1)).as("n_small"))
  }

  val smallQuantityRevenueSql: String =
    """WITH bl AS (
      |  SELECT p.p_partkey, CAST(floor(l.l_quantity * 100) AS BIGINT) AS q100,
      |    CAST(floor(l.l_extendedprice * 100) AS BIGINT) AS price_cents
      |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      |  WHERE p.p_brand = 'Brand#23'),
      |st AS (SELECT p_partkey, CAST(sum(q100) AS BIGINT) AS sum_q100,
      |         count(*) AS n_lines
      |       FROM bl GROUP BY p_partkey)
      |SELECT CAST(sum(bl.price_cents) AS BIGINT) AS small_qty_cents,
      |  count(*) AS n_small
      |FROM bl JOIN st ON bl.p_partkey = st.p_partkey
      |WHERE bl.q100 * st.n_lines * 5 < st.sum_q100""".stripMargin

  // --------------------------------------------------------------------
  // q160: TPC-H Q20 — potential part promotion. Suppliers who DOMINATED
  // the 1996 supply of some 'small…' part: their shipped quantity of
  // that part exceeds half the part's total (the availqty>half-demand
  // predicate, inverted onto the data that exists). Nested-IN shape:
  // supplier IN (per-(part,supplier) HAVING) — run as aggregates + a
  // semi-join, never a distinct-then-join of raw rows.
  // 100 TB shape: one (part,supplier) agg over the year-pruned scan, a
  // partkey join onto the per-part totals, then a suppkey semi-join
  // into the supplier dim; nation broadcast last.
  // --------------------------------------------------------------------
  def dominantSuppliers(lineitem: DataFrame, part: DataFrame,
                        supplier: DataFrame, nation: DataFrame): DataFrame = {
    val smallParts = part.filter(col("p_name").startsWith("small"))
      .select(col("p_partkey"))
    val perPartSupp = lineitem
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .join(broadcast(smallParts), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_partkey"), col("l_suppkey"))
      .agg(sum(floor(col("l_quantity") * 100).cast("long")).as("supp_q100"))
    val perPart = perPartSupp.groupBy(col("p_partkey"))
      .agg(sum(col("supp_q100")).as("total_q100"))
    val dominant = perPartSupp.join(perPart, "p_partkey")
      .filter(col("supp_q100") * 2 > col("total_q100"))
      .select(col("l_suppkey")).distinct()
    supplier
      .join(dominant, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"))
      .orderBy(col("s_suppkey"))
  }

  val dominantSuppliersSql: String =
    """WITH pps AS (
      |  SELECT p.p_partkey, l.l_suppkey,
      |    CAST(sum(CAST(floor(l.l_quantity * 100) AS BIGINT)) AS BIGINT)
      |      AS supp_q100
      |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      |  WHERE p.p_name LIKE 'small%'
      |    AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      |    AND l.l_shipdate < TIMESTAMP '1997-01-01'
      |  GROUP BY p.p_partkey, l.l_suppkey),
      |pp AS (SELECT p_partkey, CAST(sum(supp_q100) AS BIGINT) AS total_q100
      |       FROM pps GROUP BY p_partkey)
      |SELECT s.s_suppkey, s.s_name, n.n_name
      |FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
      |WHERE s.s_suppkey IN (
      |  SELECT pps.l_suppkey FROM pps JOIN pp ON pps.p_partkey = pp.p_partkey
      |  WHERE pps.supp_q100 * 2 > pp.total_q100)
      |ORDER BY s.s_suppkey""".stripMargin

  // --------------------------------------------------------------------
  // q161: TPC-H Q21 — suppliers who kept orders waiting. For finalized
  // ('F') orders with at least two distinct suppliers, find suppliers
  // who were the ONLY late one (shipped >60 days after the order date).
  // Q21's exists + not-exists double correlation collapses into ONE
  // per-order aggregate: n_supp = countDistinct(supplier), n_late_supp
  // = countDistinct(supplier | late); the blamed supplier exists iff
  // n_supp ≥ 2 ∧ n_late_supp = 1, and min(supplier | late) names them
  // — equivalent because "exactly one distinct late supplier" is what
  // both correlated subqueries jointly test.
  // 100 TB shape: both facts shuffle once on orderkey; per-order state
  // is two bounded distinct sets (suppliers per order is small by data
  // model); the final per-supplier count reuses nothing heavier than
  // the |orders|-row aggregate frame.
  // --------------------------------------------------------------------
  def waitingOrders(lineitem: DataFrame, orders: DataFrame,
                    supplier: DataFrame): DataFrame = {
    val perOrder = lineitem
      .join(orders.filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .withColumn("late",
        col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .groupBy(col("o_orderkey"))
      .agg(countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(when(col("late"), col("l_suppkey"))).as("n_late_supp"),
        min(when(col("late"), col("l_suppkey"))).as("late_supp"))
    perOrder
      .filter(col("n_supp") >= 2 && col("n_late_supp") === 1)
      .groupBy(col("late_supp"))
      .agg(count(lit(1)).as("numwait"))
      .join(broadcast(supplier.select(col("s_suppkey"), col("s_name"))),
        col("late_supp") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("numwait"))
      .orderBy(col("numwait").desc, col("s_suppkey"))
      .limit(10)
  }

  val waitingOrdersSql: String =
    """WITH po AS (
      |  SELECT o.o_orderkey,
      |    count(DISTINCT l.l_suppkey) AS n_supp,
      |    count(DISTINCT CASE WHEN l.l_shipdate > o.o_orderdate
      |      + INTERVAL 60 DAY THEN l.l_suppkey END) AS n_late_supp,
      |    min(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      |      THEN l.l_suppkey END) AS late_supp
      |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  WHERE o.o_orderstatus = 'F'
      |  GROUP BY o.o_orderkey)
      |SELECT s.s_suppkey, s.s_name, w.numwait FROM (
      |  SELECT late_supp, count(*) AS numwait FROM po
      |  WHERE n_supp >= 2 AND n_late_supp = 1
      |  GROUP BY late_supp) w
      |JOIN supplier s ON w.late_supp = s.s_suppkey
      |ORDER BY w.numwait DESC, s.s_suppkey LIMIT 10""".stripMargin
}
