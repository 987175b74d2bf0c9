package graft.etl

import java.nio.file.Files

import graft.SparkSpec

/** End-to-end drive of the config-driven App job compositions
  * (reference `App.scala:13-29`, `:86-235`) on the shared session. */
class AppSpec extends SparkSpec {

  private def tmp(): String = Files.createTempDirectory("graft-app").toString

  test("oneClusterWriteReadSameTable: write then read round-trips") {
    val root = tmp()
    val out = App.run(spark, "oneClusterWriteReadSameTable",
      Map("root" -> root, "rows" -> "500"))
    assert(out === "rows_written=500 rows_read=500")
  }

  test("oneClusterCopyTable: generate -> write -> copy from one config") {
    val root = tmp()
    val obs = new CollectingObserver
    val out = App.run(spark, "oneClusterCopyTable",
      Map("root" -> root, "rows" -> "300"), obs)
    assert(out === "rows_written=300 rows_copied=300")
    val src = spark.read.parquet(s"$root/test")
    val dst = spark.read.parquet(s"$root/test2")
    assert(src.except(dst).isEmpty && dst.except(src).isEmpty)
    // both legs reported through the same observer
    assert(obs.events.count(_.startsWith("jobSucceeded")) === 2)
  }

  test("twoClustersCoordinatedWrite: both destinations visible and equal") {
    val root = tmp()
    val out = App.run(spark, "twoClustersCoordinatedWrite",
      Map("root" -> root, "rows" -> "200"))
    assert(out.startsWith("committed="))
    Seq("cluster_1", "cluster_2").foreach { c =>
      val vis = CoordinatedCommit.visible(
        CoordinatedCommit.Destination(c, s"$root/$c"))
      assert(vis.length === 1, s"$c must have exactly one visible commit")
      assert(spark.read.parquet(vis.head).count() === 200)
    }
  }

  test("S3_COMPAT transport routes writeOneCluster through the two-phase commit") {
    val root = tmp()
    val out = App.run(spark, "writeOneCluster",
      Map("root" -> root, "rows" -> "100", "transport" -> "S3_COMPAT"))
    assert(out === "rows_written=100")
    // the coordinated path leaves a manifest-committed dir, not bare files
    val vis = CoordinatedCommit.visible(
      CoordinatedCommit.Destination("cluster_1", s"$root/test"))
    assert(vis.length === 1)
  }

  test("unknown job name fails loudly") {
    intercept[IllegalArgumentException] {
      App.run(spark, "nope", Map("root" -> tmp()))
    }
  }
}
