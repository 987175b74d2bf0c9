package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The codegen'd Lloyd assignment kernel must be bit-identical to the
  * interpreted fold it replaces — values, null semantics, and the
  * whole-stage-codegen plan shape. */
class LongSqDistSpec extends SparkSpec {

  private def interpreted = (a: org.apache.spark.sql.Column,
                             b: org.apache.spark.sql.Column) =>
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0L), (acc, v) => acc + v)

  test("kernel equals the interpreted zip_with fold on fixture-quantized vectors") {
    import spark.implicits._
    val q = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), transform(col("embedding"),
        x => round(x.cast("double") * 1000).cast("long")).as("qe"))
    val paired = q.as("a").crossJoin(q.as("b"))
      .filter(col("a.vec_id") < col("b.vec_id")).limit(500)
    val diff = paired.select(
        VectorFunctions.longSqDist(col("a.qe"), col("b.qe")).as("k"),
        interpreted(col("a.qe"), col("b.qe")).as("i"))
      .filter(col("k") =!= col("i") ||
        (col("k").isNull =!= col("i").isNull))
    assert(diff.isEmpty, "kernel deviated from the interpreted fold")
  }

  test("null semantics: length mismatch and null element both yield NULL") {
    import spark.implicits._
    val d = Seq(
      (Array(1L, 2L, 3L), Array(1L, 2L)),          // length mismatch
      (Array(1L, 2L), Array(4L, 6L))               // clean: 9 + 16 = 25
    ).toDF("a", "b")
    val got = d.select(VectorFunctions.longSqDist(col("a"), col("b")))
      .collect().map(r => if (r.isNullAt(0)) null else r.getLong(0))
    assert(got.toSeq === Seq(null, 25L))
    val withNullElem = spark.sql(
      "SELECT array(1L, CAST(NULL AS BIGINT)) a, array(1L, 2L) b")
      .select(VectorFunctions.longSqDist(col("a"), col("b")))
      .collect()
    assert(withNullElem.head.isNullAt(0), "null element must null the distance")
  }

  test("kernel stays inside whole-stage codegen") {
    // parquet-backed input so constant folding can't evaluate the
    // expression at plan time (a literal frame folds to LocalTableScan)
    val q = graft.Tables.embeddings(spark, sf)
      .select(transform(col("embedding"),
        x => round(x.cast("double") * 1000).cast("long")).as("qe"))
    val df = q.select(VectorFunctions.longSqDist(col("qe"), col("qe")).as("d"))
    val plan = df.queryExecution.executedPlan.toString
    // `*(n)` marks a WholeStageCodegen stage in the simple-string form;
    // the kernel's Project must carry it (the interpreted `transform`
    // Project above it legitimately doesn't)
    assert("""\*\(\d+\) Project \[vector_sqdist_long""".r
        .findFirstIn(plan).isDefined,
      s"kernel fell out of codegen:\n$plan")
  }
}
