package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GeneratorSpec extends SparkSpec {

  test("generator produces exactly ids 0 until n, no dupes") {
    val df = Generator.generate(spark, 1000, 7).cache()
    assert(df.count() === 1000)
    assert(df.select(countDistinct(col("id"))).head.getLong(0) === 1000)
    val mm = df.agg(min("id"), max("id")).head
    assert(mm.getLong(0) === 0 && mm.getLong(1) === 999)
    df.unpersist()
  }

  test("ids are contiguous within each partition (reference layout)") {
    // reference SparkUtils.scala:103-110: each slice owns one contiguous
    // id range
    val parts = Generator.generate(spark, 1003, 4)
      .withColumn("pid", spark_partition_id())
      .groupBy("pid")
      .agg(min("id").as("lo"), max("id").as("hi"), count(lit(1)).as("n"))
      .collect()
      .sortBy(_.getLong(1))
    assert(parts.length === 4)
    parts.foreach(r => assert(r.getLong(2) - r.getLong(1) + 1 === r.getLong(3),
      s"partition ${r.getInt(0)} not contiguous"))
    // ranges tile [0, 1003) without gaps
    assert(parts.head.getLong(1) === 0 && parts.last.getLong(2) === 1002)
    parts.sliding(2).foreach {
      case Array(a, b) => assert(a.getLong(2) + 1 === b.getLong(1)); case _ =>
    }
  }

  test("generator is deterministic (fixes reference's write-then-count bug)") {
    val a = Generator.generate(spark, 500, 3)
    val b = Generator.generate(spark, 500, 3)
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
    // marks == id (reference SparkUtils.scala:114)
    assert(a.filter(col("marks") =!= col("id")).isEmpty)
    // course is 16 md5 bytes
    assert(a.filter(length(col("course")) =!= 16).isEmpty)
  }
}
