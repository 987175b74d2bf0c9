package graft.etl

import java.nio.file.Files

import graft.SparkSpec

class PipelineSpec extends SparkSpec {

  private def tmp(): String =
    Files.createTempDirectory("graft-test").toString

  test("sink honors maxRecordsPerFile and fires observer callbacks in order") {
    val out = tmp() + "/t"
    val obs = new CollectingObserver
    val n = ParquetSink.write(Generator.generate(spark, 1000, 2), out,
      maxRecordsPerFile = 100, observer = obs, jobId = "j1")
    assert(n === 1000)
    val files = ParquetSink.listParquet(out)
    assert(files.length >= 10, s"expected >=10 files, got ${files.length}")
    // callback order: transportStart, objectPersisted*, allObjectsPersisted, jobSucceeded
    assert(obs.events.head === "transportStart:j1")
    assert(obs.events.last === "jobSucceeded:j1")
    val allIdx = obs.events.indexWhere(_.startsWith("allObjectsPersisted"))
    assert(obs.events.slice(1, allIdx).forall(_.startsWith("objectPersisted")))
    assert(allIdx === obs.events.length - 2)
  }

  test("copyTable roundtrips data and skips empty legs") {
    val src = tmp() + "/src"
    val dst = tmp() + "/dst"
    ParquetSink.write(Generator.generate(spark, 500, 2), src)

    // skip semantics: no read options → None (reference SparkUtils.scala:95)
    assert(CopyPipeline.copyTable(spark, JobConfig(
      writeOptions = Map("path" -> dst))).isEmpty)
    // no write options → None (reference SparkUtils.scala:68-69)
    assert(CopyPipeline.copyTable(spark, JobConfig(
      readOptions = Map("path" -> src))).isEmpty)

    val copied = CopyPipeline.copyTable(spark, JobConfig(
      writeOptions = Map("path" -> dst), readOptions = Map("path" -> src)))
    assert(copied.contains(500L))
    val a = spark.read.parquet(src)
    val b = spark.read.parquet(dst)
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
  }

  test("append mode accumulates; each write reports only its own delta") {
    val dst = tmp() + "/acc"
    val obs = new CollectingObserver
    val n1 = ParquetSink.write(Generator.generate(spark, 100, 1), dst)
    val n2 = ParquetSink.write(Generator.generate(spark, 150, 1), dst,
      observer = obs, jobId = "j2")
    assert(n1 === 100)
    assert(n2 === 150) // THIS job's rows, not the committed total
    assert(spark.read.parquet(dst).count() === 250) // destination accumulates
    // observer saw only the second write's files
    val persisted = obs.events.count(_.startsWith("objectPersisted"))
    assert(persisted === 1, s"expected 1 new file reported, got $persisted")
  }
}
