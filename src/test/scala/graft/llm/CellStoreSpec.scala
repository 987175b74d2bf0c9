package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Unit pins for the bucketed cell-store layout (VERDICT r15 #1) —
  * the helper every ANN store writes and prunes through, so its
  * semantics get their own spec instead of riding the family specs:
  * bucket-count clamping, the write layout (files ≤ buckets, in-file
  * cluster sort), and the EQUIVALENCE of the three read shapes (plain
  * cluster filter ≡ static census prune ≡ in-plan DPP census prune). */
class CellStoreSpec extends SparkSpec {

  test("bucketCount clamps: floor at 8, ~cells/64 in the middle, " +
    "hard cap at 4096 (file count bounded in N)") {
    assert(CellStore.bucketCount(1) === 8L)
    assert(CellStore.bucketCount(512) === 8L)
    assert(CellStore.bucketCount(797) === 13L) // the N=1e5 fixture
    assert(CellStore.bucketCount(65536) === 1024L)
    assert(CellStore.bucketCount(7812500) === 4096L) // N=1e9 cells
    assert(CellStore.bucketCount(Long.MaxValue / 2) === 4096L)
  }

  test("write: one data file per bucket, rows cluster-sorted in-file, " +
    "cluster stays a data column") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-cellstore").toString
    try {
      val rows = spark.range(0, 1000, 1, 8)
        .select(col("id").as("vec_id"), (col("id") % 100).as("cluster"),
          (col("id") * 7).as("payload"))
      val nb = CellStore.bucketCount(100)
      CellStore.write(rows, nb, s"$dir/store")
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
        else Seq(f)
      val files = walk(new java.io.File(s"$dir/store"))
        .filter(_.getName.endsWith(".parquet"))
      assert(files.size <= nb, s"${files.size} files > $nb buckets")
      val back = spark.read.parquet(s"$dir/store")
      assert(back.columns.contains("cluster"),
        "cluster must stay a data column (pushed predicates ride it)")
      assert(back.count() === 1000)
      // in-file sort: within every file, cluster is non-decreasing
      val unsorted = back
        .withColumn("f", input_file_name())
        .withColumn("prev", lag(col("cluster"), 1).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("f"))
            .orderBy(monotonically_increasing_id())))
        .filter(col("prev").isNotNull && col("cluster") < col("prev"))
      assert(unsorted.isEmpty,
        "rows not cluster-sorted inside a bucket file")
    } finally graft.FsUtil.deleteRecursively(new java.io.File(dir))
  }

  test("the three read shapes agree: plain cluster filter == static " +
    "census prune == in-plan DPP census prune; empty census reads " +
    "nothing") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-cellstore2").toString
    try {
      val rows = spark.range(0, 2000, 1, 8)
        .select(col("id").as("vec_id"), (col("id") % 77).as("cluster"))
      val nb = CellStore.bucketCount(77)
      CellStore.write(rows, nb, s"$dir/store")
      val store = spark.read.parquet(s"$dir/store")
      val cells = Seq(3L, 19L, 42L, 76L)
      val plain = store.filter(col("cluster").isin(cells: _*))
        .select(col("vec_id"), col("cluster"))
      val static0 = CellStore.prunedTo(store, nb, cells)
        .select(col("vec_id"), col("cluster"))
      import spark.implicits._
      // a plan-backed census frame, the serve paths' shape
      val cellsF = store.select(col("cluster").as("cell")).distinct()
        .filter(col("cell").isin(cells: _*))
      val dpp = CellStore.prunedToF(store, nb, cellsF)
        .select(col("vec_id"), col("cluster"))
      assert(static0.except(plain).isEmpty && plain.except(static0).isEmpty)
      assert(dpp.except(plain).isEmpty && plain.except(dpp).isEmpty)
      assert(CellStore.prunedTo(store, nb, Seq.empty).isEmpty)
      assert(CellStore.prunedToF(store, nb,
        cellsF.filter(lit(false))).isEmpty)
    } finally graft.FsUtil.deleteRecursively(new java.io.File(dir))
  }
}
