package graft.plans

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class RewriteVectorDotSpec extends SparkSpec {

  private def interpretedDot = {
    val e = col("embedding")
    aggregate(zip_with(e, e, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v).as("d")
  }

  test("rule rewrites aggregate(zip_with(*)) into vector_dot with equal results") {
    val emb = Tables.embeddings(spark, sf)
    val baseline = emb.select(col("vec_id"), interpretedDot)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

    val before = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = before :+ RewriteVectorDot
    try {
      val df = emb.select(col("vec_id"), interpretedDot)
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("vector_dot"), s"rule did not fire:\n$p")
      assert(!p.contains("aggregate("), s"interpreted fold survived:\n$p")
      val rewritten = df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      // bit-identical: same accumulation order
      assert(rewritten === baseline)
    } finally spark.experimental.extraOptimizations = before
  }

  test("rule leaves non-dot folds alone") {
    val emb = Tables.embeddings(spark, sf)
    val before = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = before :+ RewriteVectorDot
    try {
      // sum (not product) fold — must NOT be rewritten
      val df = emb.select(aggregate(col("embedding"), lit(0.0),
        (acc, v) => acc + v.cast("double")).as("s"))
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("vector_dot"), s"rule misfired:\n$p")
      assert(df.count() === emb.count())
    } finally spark.experimental.extraOptimizations = before
  }
}
