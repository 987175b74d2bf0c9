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

  test("histogram-sketch quantiles land within one bin width of exact (q89)") {
    val o = Tables.orders(spark, sf)
    val est = Relational.histogramQuantiles(o).collect()
      .map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    val vals = o.select(col("o_orderpriority"), col("o_totalprice")).collect()
      .groupBy(_.getString(0))
      .map { case (k, rows) => k -> rows.map(_.getDouble(1)).sorted }
    vals.foreach { case (k, v) =>
      val (e50, e95) = est(k)
      // the estimate is the upper edge of the bin holding the ceil(q·n)-th
      // order statistic: (v_q, v_q + width] — a deterministic bound
      def os(q: Double): Double = v((math.ceil(q * v.length) - 1).toInt.max(0))
      val (v50, v95) = (os(0.5), os(0.95))
      assert(e50 > v50 && e50 <= v50 + 1000.0, s"$k p50 est $e50 vs $v50")
      assert(e95 > v95 && e95 <= v95 + 1000.0, s"$k p95 est $e95 vs $v95")
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

  test("mergeSchema read reconciles evolving file batches; v1 rows get NULLs") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft-evo").toString + "/t"
    Seq((1L, "en")).toDF("doc_id", "lang").write.parquet(out)
    Seq((2L, "en", 40L)).toDF("doc_id", "lang", "n_chars")
      .write.mode("append").parquet(out)
    val merged = spark.read.option("mergeSchema", "true").parquet(out)
    assert(merged.columns.toSet === Set("doc_id", "lang", "n_chars"))
    val rows = merged.orderBy(col("doc_id")).collect()
    assert(rows.length === 2)
    assert(rows(0).isNullAt(rows(0).fieldIndex("n_chars")), "v1 row must read NULL")
    assert(rows(1).getLong(rows(1).fieldIndex("n_chars")) === 40L)
  }
}
