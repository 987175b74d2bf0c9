package graft.operators

import java.nio.file.Files

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Tests for the at-scale techniques: bucketed co-located joins (no
  * shuffle) and salted skew joins (same results as plain join). */
class ScaleTechniquesSpec extends SparkSpec {

  test("bucketed tables join without a shuffle exchange") {
    // warehouse dir is a static conf, set in SparkSpec's builder
    val orders = Tables.orders(spark, sf)
    val customer = Tables.customer(spark, sf)
    orders.write.mode("overwrite").bucketBy(4, "o_custkey")
      .sortBy("o_custkey").saveAsTable("orders_b")
    customer.write.mode("overwrite").bucketBy(4, "c_custkey")
      .sortBy("c_custkey").saveAsTable("customer_b")

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("orders_b")
        .join(spark.table("customer_b"), col("o_custkey") === col("c_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() === orders.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", 10L * 1024 * 1024)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }

  test("salted join returns exactly the plain join's rows") {
    val orders = Tables.orders(spark, sf)
    val customer = Tables.customer(spark, sf)
    val plain = orders.join(customer.withColumnRenamed("c_custkey", "o_custkey"),
      Seq("o_custkey"))
    val salted = Skew.saltedJoin(orders,
      customer.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey", 8)
    assert(salted.count() === plain.count())
    assert(salted.select("o_orderkey", "c_name")
      .except(plain.select("o_orderkey", "c_name")).isEmpty)
    assert(plain.select("o_orderkey", "c_name")
      .except(salted.select("o_orderkey", "c_name")).isEmpty)
  }

  test("partitioned parquet sink lays out key=value dirs") {
    val out = Files.createTempDirectory("graft-part").toString + "/t"
    val n = graft.etl.ParquetSink.write(Tables.nation(spark, sf), out,
      partitionBy = Seq("n_regionkey"))
    assert(n === 25)
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.count(_.startsWith("n_regionkey=")) === 5)
    // partition pruning must happen in the PLAN (PartitionFilters on the
    // scan), not as a post-scan filter — at 100 TB this is the difference
    // between reading one directory and reading the table
    val one = spark.read.parquet(out).filter(col("n_regionkey") === 0)
    assert(one.count() === 5)
    val p = one.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters") && p.contains("n_regionkey"),
      s"expected partition pruning on the scan:\n$p")
  }
}
