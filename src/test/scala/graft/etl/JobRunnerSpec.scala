package graft.etl

import java.nio.file.Files

import graft.SparkSpec

class JobRunnerSpec extends SparkSpec {

  test("execute rethrows failures and notifies the observer") {
    val obs = new CollectingObserver
    intercept[RuntimeException] {
      JobRunner.execute(JobConfig(), obs, "boom")(_ => throw new RuntimeException("x"))
    }
    assert(obs.events === Seq("jobFailed:boom"))
    assert(JobRunner.execute(JobConfig())(_.rowCount) === 10000L)
  }

  test("transport ADT parses and dispatches to the right sink") {
    assert(DataTransport.parse("DIRECT") === DataTransport.Direct)
    assert(DataTransport.parse("s3_compat") === DataTransport.S3Compat)
    intercept[IllegalArgumentException] { DataTransport.parse("carrier-pigeon") }

    val df = Generator.generate(spark, 100, 2)
    val direct = Files.createTempDirectory("jr-direct").toString + "/t"
    assert(JobRunner.write(df, JobConfig(writeOptions = Map("path" -> direct)),
      DataTransport.Direct) === 100L)

    val staged = Files.createTempDirectory("jr-s3").toString
    assert(JobRunner.write(df, JobConfig(writeOptions = Map("path" -> staged)),
      DataTransport.S3Compat) === 100L)
    // S3Compat leaves a committed dir + manifest, not bare files
    assert(CoordinatedCommit.visible(
      CoordinatedCommit.Destination("cluster_1", staged)).nonEmpty)
  }

  test("buildSession honors UTC + AQE + shuffle width") {
    // shared session already exists; builder returns it with same core
    // configs — assert the contract on the active session instead
    assert(spark.conf.get("spark.sql.session.timeZone") === "UTC")
  }
}
