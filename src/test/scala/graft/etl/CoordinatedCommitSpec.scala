package graft.etl

import java.nio.file.Files

import graft.SparkSpec
import CoordinatedCommit.Destination

class CoordinatedCommitSpec extends SparkSpec {

  private def dests(): Seq[Destination] = Seq(
    Destination("cluster_1", Files.createTempDirectory("graft-c1").toString),
    Destination("cluster_2", Files.createTempDirectory("graft-c2").toString))

  test("two-phase commit: barrier ordering of callbacks") {
    val ds = dests()
    val obs = new CollectingObserver
    val committed = CoordinatedCommit.write(
      Generator.generate(spark, 200, 2), ds, "job42", obs)
    assert(committed.length === 2)
    ds.foreach(d => assert(CoordinatedCommit.visible(d).length === 1))

    val ev = obs.events.toList
    def idx(p: String) = ev.indexWhere(_.startsWith(p))
    // initialize is the pre-I/O handshake; every persist strictly before
    // stageReady; stageReady before importReady; imports after
    // importReady; jobSucceeded last
    // (reference LocalCoordinatedStorageTransportExtension.scala:13-15, :44-50)
    assert(ev.take(2) === List("initialize:job42", "transportStart:job42"))
    assert(obs.credentialListener.isDefined,
      "initialize must register the credential-rotation hook")
    assert(ev.lastIndexOf("stageSucceeded:cluster_2") < idx("stageReady"))
    assert(idx("allObjectsPersisted") < idx("stageReady"))
    assert(idx("stageReady") < idx("importReady"))
    assert(idx("importReady") < idx("importSucceeded:cluster_1"))
    assert(idx("importSucceeded:cluster_1") < idx("importSucceeded:cluster_2"))
    assert(ev.last === "jobSucceeded:job42")
  }

  test("stage failure leaves NO visible data on any destination") {
    val ds = dests()
    val obs = new CollectingObserver
    intercept[RuntimeException] {
      CoordinatedCommit.write(Generator.generate(spark, 200, 2), ds, "jobX",
        obs, failStage = Some("cluster_2"))
    }
    ds.foreach(d => assert(CoordinatedCommit.visible(d).isEmpty,
      s"${d.clusterId} must have no committed data"))
    assert(obs.events.exists(_.startsWith("stageFailed:cluster_2")))
    assert(obs.events.last === "jobFailed:jobX")
    assert(!obs.events.exists(_.startsWith("importSucceeded")))
  }

  test("storage configuration scopes persisted-object callbacks; credential rotation reaches the transport") {
    val ds = dests()
    val obs = new CollectingObserver {
      override def storageConfiguration: Option[StorageTransportConfig] = Some(
        StorageTransportConfig(
          keyPrefix = "jobs/job77",
          tags = Map("team" -> "graft"),
          writeAccess = StorageAccessConfig("us-west-1", "graft-bucket",
            StorageCredentials("wk", "ws", "wt")),
          readAccessByCluster = Map(
            "cluster_1" -> StorageAccessConfig("eu-west-1", "bucket-c1",
              StorageCredentials("rk", "rs", "rt")),
            "cluster_2" -> StorageAccessConfig("eu-west-1", "bucket-c2",
              StorageCredentials("rk", "rs", "rt")))))
      override def onObjectPersisted(b: String, k: String, n: Long): Unit = {
        events += s"objectPersisted:$b/$k"; ()
      }
    }
    CoordinatedCommit.write(Generator.generate(spark, 100, 1), ds, "job77", obs)
    val persisted = obs.events.filter(_.startsWith("objectPersisted"))
    assert(persisted.nonEmpty)
    assert(persisted.exists(_.startsWith("objectPersisted:bucket-c1/jobs/job77/")),
      s"objects must be reported under the configured bucket+prefix: $persisted")
    // rotation hook is callable mid-job without disturbing the protocol
    obs.credentialListener.get.onCredentialsChanged("cluster_1",
      StorageCredentials("rk2", "rs2", "rt2"))
    assert(obs.events.last.startsWith("jobSucceeded"))
  }

  test("committed data matches input on every destination") {
    val ds = dests()
    val df = Generator.generate(spark, 300, 3)
    val committed = CoordinatedCommit.write(df, ds, "jobY")
    committed.foreach { dir =>
      val back = spark.read.parquet(dir)
      assert(back.count() === 300)
      assert(back.except(df).isEmpty && df.except(back).isEmpty)
    }
  }
}
