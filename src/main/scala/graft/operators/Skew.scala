package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities. AQE's skew-join handles most cases at
  * runtime; explicit salting remains the tool when one build-side key is
  * pathologically hot (e.g. a null-like sentinel joining a large dim).
  */
object Skew {

  /** Salted equi-join: scatter the (skewed) left side across `salts`
    * sub-keys and replicate the right side once per salt. Same result
    * set as `left.join(right, key)`; the hot key's rows spread over
    * `salts` reducers instead of one.
    *
    * Replication cost is |right| × salts — use for moderate right sides
    * or after AQE skew stats identify the hot keys (a targeted variant
    * would salt only those).
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 salts: Int): DataFrame = {
    val saltedLeft = left.withColumn("_salt",
      pmod(xxhash64(col(key), monotonically_increasing_id()), lit(salts)).cast("int"))
    val replicatedRight = right.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedLeft.join(replicatedRight, Seq(key, "_salt")).drop("_salt")
  }

  /** q79: the classic 100× fact-fact skew killer, made concrete. A
    * deliberately pathological key distribution — two thirds of all
    * orders rerouted to ONE customer key — joined against the customer
    * dim through [[saltedJoin]], so the hot key's rows spread over
    * `salts` reducers instead of serializing on one. The dim side is
    * pinned to a shuffle join (`hint("shuffle_hash")`): a broadcast
    * would dissolve the skew by accident and demo nothing — at real
    * scale the right side is a fact table that cannot broadcast.
    *
    * Result is identical to the plain join (the oracle): salting is a
    * physical rewrite only. Aggregates are exact integers (count +
    * cents), so the nondeterministic salt assignment cannot perturb
    * parity. */
  def skewJoinAgg(orders: DataFrame, customer: DataFrame,
                  salts: Int = 8): DataFrame = {
    val skewed = orders.select(
      when(col("o_orderkey") % 3 =!= 0, lit(1L)).otherwise(col("o_custkey")).as("k"),
      col("o_totalprice"))
    val dim = customer.select(col("c_custkey").as("k"), col("c_nationkey"))
      .hint("shuffle_hash")
    saltedJoin(skewed, dim, "k", salts)
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_orders"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("price_cents"))
      .orderBy(col("c_nationkey"))
  }

  val skewJoinAggSql: String =
    """WITH f AS (SELECT CASE WHEN o_orderkey % 3 <> 0 THEN 1
      |                       ELSE o_custkey END AS k, o_totalprice
      |           FROM orders)
      |SELECT c_nationkey, count(*) AS n_orders,
      |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS price_cents
      |FROM f JOIN customer ON c_custkey = k
      |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin
}
