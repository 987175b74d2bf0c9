package graft.etl

import org.scalatest.funsuite.AnyFunSuite

class JobConfigSpec extends AnyFunSuite {

  test("defaults mirror the reference (rows 10000, splits = parallelism)") {
    val c = JobConfig(defaultParallelism = 6)
    assert(c.rowCount === 10000L)           // SparkUtils.scala:121
    assert(c.splits === 6)                  // SparkUtils.scala:127
    assert(c.maxRecordsPerFile === 100000)  // App.scala:68
    assert(!c.shouldWrite && !c.shouldRead) // empty maps skip both legs
  }

  test("options override defaults") {
    val c = JobConfig(
      writeOptions = Map("rows" -> "42", "splits" -> "3",
        "maxRecordsPerFile" -> "7", "path" -> "/tmp/x"),
      readOptions = Map("path" -> "/tmp/y"))
    assert(c.rowCount === 42L && c.splits === 3 && c.maxRecordsPerFile === 7)
    assert(c.shouldWrite && c.shouldRead)
    assert(c.writePath.contains("/tmp/x") && c.readPath.contains("/tmp/y"))
  }
}
