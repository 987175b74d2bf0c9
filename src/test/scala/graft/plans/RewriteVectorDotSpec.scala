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

  test("vector_dot mirrors the interpreted fold's NULL semantics") {
    import graft.functions.VectorFunctions.floatDot
    def interp(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)
    val ok = (array(lit(1.0), lit(2.0)), array(lit(3.0), lit(4.0)))
    val mismatch = (array(lit(1.0), lit(2.0)), array(lit(3.0)))
    val nullElem = (array(lit(1.0), lit(null).cast("double")), array(lit(3.0), lit(4.0)))
    val r = spark.range(1).select(
      floatDot(ok._1, ok._2).as("k0"), interp(ok._1, ok._2).as("i0"),
      floatDot(mismatch._1, mismatch._2).as("k1"), interp(mismatch._1, mismatch._2).as("i1"),
      floatDot(nullElem._1, nullElem._2).as("k2"), interp(nullElem._1, nullElem._2).as("i2"))
      .head
    assert(r.getDouble(0) === 11.0 && r.getDouble(1) === 11.0)
    // zip_with null-pads length mismatches and nulls poison the fold —
    // the kernel must agree (ADVICE r1)
    assert(r.isNullAt(2) && r.isNullAt(3))
    assert(r.isNullAt(4) && r.isNullAt(5))
  }

  test("rule does NOT fire on a raw float multiply (float-rounded products)") {
    val emb = Tables.embeddings(spark, sf)
    val before = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = before :+ RewriteVectorDot
    try {
      // no casts: x*y multiplies in FLOAT, rounding each product before
      // the double sum — the double-accumulating kernel would deviate
      val e = col("embedding")
      val df = emb.select(aggregate(zip_with(e, e, (x, y) => x * y),
        lit(0.0), (acc, v) => acc + v).as("d"))
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("vector_dot"), s"rule misfired on float multiply:\n$p")
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
