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
}
