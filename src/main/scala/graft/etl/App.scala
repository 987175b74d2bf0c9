package graft.etl

import org.apache.spark.sql.SparkSession

/** Config-driven ETL application — the reference's `App`
  * (reference `App.scala:13-29`): a `main` that builds the session,
  * composes generate → write → read → copy → coordinated jobs from
  * `JobConfig` option maps, and closes the session when the job ends.
  *
  * Job shapes mirror the reference one-for-one:
  *  - writeOneCluster   (reference `SparkUtils.scala:62-75`):
  *      generate `rows` in `splits` slices → transport-dispatched write
  *  - readOneCluster    (reference `SparkUtils.scala:92-99`):
  *      read leg only, count rows
  *  - oneClusterWriteReadSameTable (reference `App.scala:86-116`)
  *  - oneClusterCopyTable          (reference `App.scala:123-161`):
  *      write, then copy the written table to a second destination
  *  - twoClustersCoordinatedWrite  (reference `App.scala:168-235`):
  *      generate → two-phase coordinated commit to two destinations
  *
  * Usage: `runMain graft.etl.App <jobName> [key=value ...]` with keys
  * `root` (base dir, default /tmp/graft-app), `rows`, `splits`,
  * `master`, `transport` (DIRECT | S3_COMPAT).
  */
object App {

  def main(args: Array[String]): Unit = {
    val job = args.headOption.getOrElse("oneClusterCopyTable")
    val opts = args.drop(1).map { a =>
      val Array(k, v) = a.split("=", 2); k -> v
    }.toMap
    val spark = JobRunner.buildSession("graft-app",
      opts.getOrElse("master", "local[4]"),
      opts.getOrElse("shufflePartitions", "4").toInt)
    // reference `executeJob` (`App.scala:27-29`): run, then always close —
    // but rethrow instead of swallowing (the reference's Try.apply hides
    // failures; see JobRunner.execute's same deviation).
    try println(s"[graft-app] $job -> ${run(spark, job, opts)}")
    finally spark.stop()
  }

  /** Run one named job composition; returns a human-readable summary.
    * Separated from `main` so tests can drive it on their own session. */
  def run(spark: SparkSession, job: String, opts: Map[String, String],
          observer: JobObserver = NoopObserver): String = {
    val root = opts.getOrElse("root", "/tmp/graft-app")
    val rows = opts.getOrElse("rows", "10000")
    val transport = DataTransport.parse(opts.getOrElse("transport", "DIRECT"))
    val parallelism = spark.sparkContext.defaultParallelism

    def writeConf(table: String) = JobConfig(
      writeOptions = Map("path" -> s"$root/$table", "rows" -> rows) ++
        opts.get("splits").map("splits" -> _) ++
        opts.get("maxRecordsPerFile").map("maxRecordsPerFile" -> _),
      defaultParallelism = parallelism)
    def readConf(table: String) = JobConfig(
      readOptions = Map("path" -> s"$root/$table"),
      defaultParallelism = parallelism)
    def copyConf(from: String, to: String) = JobConfig(
      writeOptions = Map("path" -> s"$root/$to") ++
        opts.get("maxRecordsPerFile").map("maxRecordsPerFile" -> _),
      readOptions = Map("path" -> s"$root/$from"),
      defaultParallelism = parallelism)

    /** generate → write (reference `writeOneCluster`). */
    def writeOneCluster(conf: JobConfig): Long =
      JobRunner.execute(conf, observer, job) { c =>
        if (!c.shouldWrite) 0L
        else JobRunner.write(Generator.generate(spark, c.rowCount, c.splits),
          c, transport, observer, job)
      }

    /** read → count (reference `readOneCluster`). */
    def readOneCluster(conf: JobConfig): Long =
      JobRunner.execute(conf, observer, job) { c =>
        CopyPipeline.read(spark, c).map(_.count()).getOrElse(0L)
      }

    job match {
      case "writeOneCluster" =>
        s"rows_written=${writeOneCluster(writeConf("test"))}"

      case "readOneCluster" =>
        s"rows_read=${readOneCluster(readConf("test"))}"

      case "oneClusterWriteReadSameTable" =>
        val w = writeOneCluster(writeConf("test"))
        val r = readOneCluster(readConf("test"))
        s"rows_written=$w rows_read=$r"

      case "oneClusterCopyTable" =>
        val w = writeOneCluster(writeConf("test"))
        val c = JobRunner.execute(copyConf("test", "test2"), observer, job) {
          conf => CopyPipeline.copyTable(spark, conf, observer).getOrElse(0L)
        }
        s"rows_written=$w rows_copied=$c"

      case "twoClustersCoordinatedWrite" =>
        val conf = writeConf("cluster_1")
        val dests = Seq(
          CoordinatedCommit.Destination("cluster_1", s"$root/cluster_1"),
          CoordinatedCommit.Destination("cluster_2", s"$root/cluster_2"))
        val committed = JobRunner.execute(conf, observer, job) { c =>
          CoordinatedCommit.write(
            Generator.generate(spark, c.rowCount, c.splits), dests, job, observer)
        }
        s"committed=${committed.mkString(",")}"

      case other =>
        throw new IllegalArgumentException(s"unknown job: $other (expected " +
          "writeOneCluster | readOneCluster | oneClusterWriteReadSameTable | " +
          "oneClusterCopyTable | twoClustersCoordinatedWrite)")
    }
  }
}
