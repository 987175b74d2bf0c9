package graft

/** Pins [[FsUtil.parquetRowCount]] — the footer-metadata row count the
  * r17 optimization round substituted for `spark.read.parquet(p).count()`
  * on every store-segment control-flow gate (compaction triggers,
  * fixture floors, CellStore bucket derivation). The substitution is
  * only sound if the two numbers are IDENTICAL on every store layout
  * the composites write: flat multi-file, partitioned (bucket=N dirs,
  * the CellStore shape), and empty-but-present.
  */
class FsUtilSpec extends SparkSpec {

  test("parquetRowCount equals count() on a flat multi-file store") {
    val dir = java.nio.file.Files.createTempDirectory("graft_frc_").toString
    try {
      spark.range(0, 1234).toDF("id").repartition(7)
        .write.mode("overwrite").parquet(dir)
      assert(FsUtil.parquetRowCount(spark, dir) === 1234L)
      assert(FsUtil.parquetRowCount(spark, dir) ===
        spark.read.parquet(dir).count())
    } finally FsUtil.deleteRecursively(new java.io.File(dir))
  }

  test("parquetRowCount recurses through partition dirs (CellStore layout)") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft_frc_").toString
    try {
      val rows = spark.range(0, 500).toDF("cluster")
        .withColumn("cluster", col("cluster") % 37)
      graft.llm.CellStore.write(rows, nBuckets = 5, dir)
      assert(FsUtil.parquetRowCount(spark, dir) === 500L)
      assert(FsUtil.parquetRowCount(spark, dir) ===
        spark.read.parquet(dir).count())
    } finally FsUtil.deleteRecursively(new java.io.File(dir))
  }

  test("parquetRowCount counts an empty store as 0") {
    val dir = java.nio.file.Files.createTempDirectory("graft_frc_").toString
    try {
      spark.range(0, 10).toDF("id").filter("id < 0")
        .coalesce(1).write.mode("overwrite").parquet(dir)
      assert(FsUtil.parquetRowCount(spark, dir) === 0L)
    } finally FsUtil.deleteRecursively(new java.io.File(dir))
  }
}
